// Fast BPE application (SURVEY.md C1; host-side feed throughput).
//
// Exact subword-nmt semantics, mirroring vag_nmt_tpu/data/bpe.py (the Python
// implementation is the semantics oracle; tests/test_native_bpe.py asserts
// byte-identical output):
//   - word symbols are characters (UTF-8 sequences kept intact) with "</w>"
//     appended to the last;
//   - repeatedly merge ALL occurrences of the lowest-rank adjacent pair;
//   - emit units with the "@@" continuation convention.
//
// Exposed via a C ABI for ctypes (no pybind11 in this image):
//   void* bpe_new(const char* merges, long n_bytes)   merges: "a\tb\n" lines
//   void  bpe_free(void* h)
//   long  bpe_encode_line(void* h, const char* line, char* out, long cap)
//         whitespace-tokenized line -> space-separated BPE units; returns
//         bytes written (excl. NUL), or -1 if cap is too small.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cctype>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr const char* kEnd = "</w>";

struct PairHash {
    size_t operator()(const std::pair<std::string, std::string>& p) const {
        std::hash<std::string> h;
        return h(p.first) * 1000003u ^ h(p.second);
    }
};

struct Bpe {
    std::unordered_map<std::pair<std::string, std::string>, int, PairHash> ranks;
    std::unordered_map<std::string, std::string> cache;
};

// Split a UTF-8 string into code-point chunks.
std::vector<std::string> utf8_chars(const std::string& w) {
    std::vector<std::string> out;
    for (size_t i = 0; i < w.size();) {
        unsigned char c = w[i];
        size_t len = (c < 0x80) ? 1 : (c >> 5) == 0x6 ? 2
                     : (c >> 4) == 0xE ? 3 : (c >> 3) == 0x1E ? 4 : 1;
        if (i + len > w.size()) len = 1;
        out.emplace_back(w.substr(i, len));
        i += len;
    }
    return out;
}

std::string segment_word(Bpe& b, const std::string& word) {
    auto it = b.cache.find(word);
    if (it != b.cache.end()) return it->second;

    std::vector<std::string> syms = utf8_chars(word);
    if (syms.empty()) return "";
    syms.back() += kEnd;

    while (syms.size() > 1) {
        int best_rank = -1;
        size_t best_i = 0;
        for (size_t i = 0; i + 1 < syms.size(); ++i) {
            auto r = b.ranks.find({syms[i], syms[i + 1]});
            if (r != b.ranks.end() &&
                (best_rank < 0 || r->second < best_rank)) {
                best_rank = r->second;
                best_i = i;
            }
        }
        if (best_rank < 0) break;
        const std::string a = syms[best_i], c = syms[best_i + 1];
        // merge ALL occurrences of this pair (subword-nmt rule)
        std::vector<std::string> out;
        out.reserve(syms.size());
        for (size_t i = 0; i < syms.size();) {
            if (i + 1 < syms.size() && syms[i] == a && syms[i + 1] == c) {
                out.emplace_back(a + c);
                i += 2;
            } else {
                out.emplace_back(syms[i]);
                i += 1;
            }
        }
        syms.swap(out);
    }

    std::string res;
    const size_t endlen = strlen(kEnd);
    for (size_t i = 0; i < syms.size(); ++i) {
        std::string u = syms[i];
        if (u.size() >= endlen &&
            u.compare(u.size() - endlen, endlen, kEnd) == 0) {
            u = u.substr(0, u.size() - endlen);
        } else {
            u += "@@";
        }
        if (u.empty()) continue;  // bare "</w>" from whitespace-ish input
        if (!res.empty()) res += ' ';
        res += u;
    }
    b.cache.emplace(word, res);
    return res;
}

}  // namespace

extern "C" {

void* bpe_new(const char* merges, long n_bytes) {
    Bpe* b = new Bpe();
    std::string buf(merges, static_cast<size_t>(n_bytes));
    size_t pos = 0;
    int rank = 0;
    while (pos < buf.size()) {
        size_t nl = buf.find('\n', pos);
        if (nl == std::string::npos) nl = buf.size();
        size_t tab = buf.find('\t', pos);
        if (tab != std::string::npos && tab < nl) {
            b->ranks.emplace(std::make_pair(buf.substr(pos, tab - pos),
                                            buf.substr(tab + 1, nl - tab - 1)),
                             rank++);
        }
        pos = nl + 1;
    }
    return b;
}

void bpe_free(void* h) { delete static_cast<Bpe*>(h); }

long bpe_encode_line(void* h, const char* line, char* out, long cap) {
    Bpe* b = static_cast<Bpe*>(h);
    std::string res;
    // Delimiters mirror Python str.split() for ASCII whitespace (space, \t,
    // \n, \r, \v, \f). Unicode spaces (e.g. U+00A0) are NOT delimiters here;
    // callers in bpe.py feed ' '.join(tokens), so parity holds on the public
    // path, and the Python oracle remains authoritative for exotic input.
    const char* p = line;
    while (*p) {
        while (*p && isspace(static_cast<unsigned char>(*p))) ++p;
        const char* start = p;
        while (*p && !isspace(static_cast<unsigned char>(*p))) ++p;
        if (p == start) continue;
        std::string units = segment_word(*b, std::string(start, p - start));
        if (units.empty()) continue;
        if (!res.empty()) res += ' ';
        res += units;
    }
    if (static_cast<long>(res.size()) + 1 > cap) return -1;
    memcpy(out, res.c_str(), res.size() + 1);
    return static_cast<long>(res.size());
}

}  // extern "C"
