"""Corpus translation: on-device beam decode -> text (SURVEY.md §3.2
'translate' surface).

Default path (fused): the WHOLE corpus decodes as exactly one host->device
upload (all inputs packed into one uint8 buffer), ONE jitted dispatch
(lax.map over length-sorted fixed-size chunks with super-chunked encoding),
and one device->host fetch (all outputs packed device-side) — each
host<->device round trip costs ~31 ms on a tunneled chip, and this path
pays the minimum possible number of them. Corpus order is restored via the
per-row index; hypotheses are de-BPE'd host-side. A bucketed per-batch
path (fused=False) remains for streaming/debug use."""

from __future__ import annotations

import dataclasses
import time
from functools import lru_cache, partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vag_nmt_tpu.core.config import Config
from vag_nmt_tpu.data.batching import BucketBatcher, Example
from vag_nmt_tpu.data.bpe import remove_bpe
from vag_nmt_tpu.data.prefetch import device_prefetch
from vag_nmt_tpu.data.vocab import Vocab
from vag_nmt_tpu.decode.beam import _resolve_block, beam_search
from vag_nmt_tpu.decode.greedy import greedy_decode
from vag_nmt_tpu.models import prepare_decode
from vag_nmt_tpu.models.decoder import decode_tables
from vag_nmt_tpu.utils.pytree import cast_floats


def _env_fingerprint() -> tuple:
    """Impl-selection env knobs that are read at TRACE time inside the
    jitted decode programs (VAG_READOUT_TOPK, VAG_TOPK_IMPL, VAG_FRT_SLOTS,
    VAG_FRT_DEFER, VAG_FRT_NOCOND, VAG_GRU_STREAM, VAG_BEAM_UNROLL). The
    factories below are lru_cached and their jit caches persist, so without
    this in the cache key an in-process A/B flip of any of these knobs
    would silently re-run the stale program traced under the OLD value
    (found in review — the hazard was already documented and keyed for
    VAG_TOKEN_TABLES, but not for the others). Fingerprinting the values
    into every factory's key makes a flip produce a fresh closure, whose
    first trace re-reads the env."""
    import os

    return tuple(os.environ.get(k, "") for k in (
        "VAG_READOUT_TOPK", "VAG_TOPK_IMPL", "VAG_FRT_SLOTS",
        "VAG_FRT_DEFER", "VAG_FRT_NOCOND", "VAG_GRU_STREAM",
        "VAG_BEAM_UNROLL", "VAG_BEAM_PRUNE", "VAG_BLOCK_NGRAM",
        "VAG_ATTN_E_DTYPE", "VAG_FRT_GEMM_DTYPE",
        "VAG_DEC_STEP"))


def _use_tables() -> bool:
    """Per-vocab gate/readout decode tables (decoder.decode_tables): default
    ON for TPU decode (the per-step embed->matmul chain measured ~60 us/step
    standalone at flagship shapes), OFF elsewhere — the CPU/interpret paths
    keep the untabled op order that the fixed-seed goldens pin. Env
    VAG_TOKEN_TABLES=on/off overrides (A/B + parity tests)."""
    import os

    v = os.environ.get("VAG_TOKEN_TABLES", "")
    if v in ("on", "1"):
        return True
    if v in ("off", "0"):
        return False
    return jax.default_backend() == "tpu"


@lru_cache(maxsize=64)
def make_decode_fn(cfg: Config, beam_size: int, max_len: int,
                   use_tables: bool = False, env_key: tuple = ()):
    """One jitted program: encode + ground + init + full decode loop.

    Cached on (cfg, beam, max_len, use_tables): jit compile caches live on
    the function object, so rebuilding this closure per translate_corpus
    call would recompile every bucket shape (~4.5s each on the tunneled
    TPU). `use_tables` is an explicit key (not read from the env inside)
    so VAG_TOKEN_TABLES A/B flips don't hit a stale cached program."""

    @partial(jax.jit, static_argnames=())
    def decode(params, batch, img_table=None):
        if cfg.model.compute_dtype == "bfloat16":
            params = cast_floats(params, jnp.bfloat16)
        if img_table is not None:
            # Features live on device once for the whole corpus; the per-batch
            # feed carries only row ids (the per-batch (B, 2048) host->device
            # transfer dominated corpus decode before this).
            batch = dict(batch)
            batch["img"] = jnp.take(img_table, batch.pop("img_ids"), axis=0)
        state = prepare_decode(params, cfg.model, batch)
        tables = decode_tables(params["decoder"]) if use_tables else None
        row_cap = _row_caps(cfg, max_len,
                            batch["src_mask"].sum(axis=-1).astype(jnp.int32))
        if beam_size <= 1:
            toks, lens = greedy_decode(
                params, cfg.model, state, max_len, tables=tables,
                row_cap=row_cap,
                block_ngram=_resolve_block(cfg.decode.block_ngram))
            return toks, lens
        res = beam_search(params, cfg.model, state, beam_size=beam_size,
                          max_len=max_len,
                          length_norm_alpha=cfg.decode.length_norm_alpha,
                          tables=tables,
                          beam_finish=cfg.decode.beam_finish,
                          row_cap=row_cap,
                          prune=cfg.decode.beam_prune != "off",
                          block_ngram=cfg.decode.block_ngram)
        return res.best_tokens, res.best_lengths

    return decode


def _row_caps(cfg: Config, max_len: int, lens):
    """Per-row source-relative decode caps (DecodeConfig.max_len_factor):
    ceil(factor * src_len) + offset clamped to [1, max_len]; None when the
    feature is off (factor == 0, the default)."""
    d = cfg.decode
    if d.max_len_factor <= 0.0:
        return None
    cap = jnp.ceil(d.max_len_factor * lens.astype(jnp.float32)).astype(
        jnp.int32) + d.max_len_offset
    return jnp.clip(cap, 1, max_len)


def _mesh_repack_ok(mesh) -> bool:
    """Whether the straggler architectures (two-phase / streaming) compose
    with this mesh via the per-shard re-pack (see make_fused_corpus_fn):
    requires replicated params, i.e. no model-axis sharding — under TP the
    shard_map'ed local program would need the vocab collectives GSPMD
    inserts on the global path, so TP meshes keep the plain chunked loop."""
    return mesh is None or mesh.shape.get("model", 1) <= 1


def _use_streaming(cfg: Config, beam_size: int, mesh) -> bool:
    """Streaming-refill decode policy (decode/beam.py
    beam_search_streaming). Env VAG_STREAM_DECODE=on/off overrides
    cfg.decode.streaming; "auto" currently resolves OFF pending the
    measured default (see benchmarks + README). Beam-only; under a mesh it
    composes via the per-shard re-pack (each device streams its own rows)
    unless params are TP-sharded (_mesh_repack_ok)."""
    import os

    if beam_size <= 1 or not _mesh_repack_ok(mesh):
        return False
    env = os.environ.get("VAG_STREAM_DECODE", "")
    if env in ("on", "1"):
        return True
    if env in ("off", "0"):
        return False
    mode = cfg.decode.streaming
    if mode == "on":
        return True
    return False


def _use_two_phase(cfg: Config, beam_size: int, max_len: int, mesh) -> bool:
    """Two-phase straggler-compacted decode (decode/beam.py): resolve the
    cfg.decode.two_phase policy ("auto" = on iff max_len >= 96, the
    long-caption regime where per-chunk trips dwarf the mean hypothesis
    length; measured on IKEA shapes: trips ~121 vs mean hyp 23.7). Env
    VAG_TWO_PHASE=on/off overrides for A/B. Requires beam > 1; under a
    mesh it composes via the per-shard re-pack (each device compacts its
    own rows — see make_fused_corpus_fn) unless params are TP-sharded
    (_mesh_repack_ok), where the plain chunked loop remains."""
    import os

    if beam_size <= 1 or not _mesh_repack_ok(mesh):
        return False
    env = os.environ.get("VAG_TWO_PHASE", "")
    if env in ("on", "1"):
        return True
    if env in ("off", "0"):
        return False
    mode = cfg.decode.two_phase
    if mode == "on":
        return True
    if mode == "off":
        return False
    return max_len >= 96


def _make_super_one(cfg: Config, beam_size: int, max_len: int,
                    multimodal: bool, nbest: bool,
                    two_phase: bool = False, streaming: bool = False):
    """Builds the per-super-chunk decode body shared by the single-dispatch
    corpus program and the pipelined per-chunk program. `tables` (per-vocab
    decode tables, or None) is computed ONCE per jitted program by the
    caller and threaded through — recomputing it inside the lax.map body
    would redo its (V, E) matmuls every super-chunk.

    two_phase: use beam_search_two_phase over the whole super-chunk — the
    output tuple gains a trailing scalar leaf (phase-2 resume trips) and
    `steps` becomes the per-chunk PHASE-1 trips.

    streaming: use beam_search_streaming over the whole super-chunk pool
    (takes precedence over two_phase) — `steps` becomes ONE total trip
    count per super-chunk (shape (1,)) and the output gains a (1,) refill
    count."""
    def _beam_one(params, state, tables, row_cap=None):
        # `steps` is the chunk's REALIZED while_loop trip count — the
        # loop runs until the LAST of the B*K hypotheses finishes, i.e.
        # max over ALL beams of the emitted length (a beam's length at
        # finish equals the number of iterations it took, and a
        # never-finished beam reaches max_len in max_len trips). Feeds
        # the MFU/roofline accounting in bench.py.
        if beam_size <= 1:
            toks, lens = greedy_decode(
                params, cfg.model, state, max_len, tables=tables,
                row_cap=row_cap,
                block_ngram=_resolve_block(cfg.decode.block_ngram))
            steps = jnp.max(lens).astype(jnp.int32)
        else:
            res = beam_search(params, cfg.model, state,
                              beam_size=beam_size, max_len=max_len,
                              length_norm_alpha=cfg.decode.length_norm_alpha,
                              unroll=cfg.decode.beam_unroll,
                              tables=tables,
                              beam_finish=cfg.decode.beam_finish,
                              row_cap=row_cap,
                              prune=cfg.decode.beam_prune != "off",
                              block_ngram=cfg.decode.block_ngram)
            steps = jnp.max(res.lengths).astype(jnp.int32)
            if nbest:
                # full (B, K, L) hypothesis set + normalized scores,
                # best-first (beam.py sorts by final score)
                return (res.tokens.astype(jnp.uint16),
                        res.lengths.astype(jnp.int32),
                        res.scores.astype(jnp.float32), steps)
            toks, lens = res.best_tokens, res.best_lengths
        # uint16 halves the device->host result bytes (tunnel-limited,
        # ~13 MB/s measured); BPE vocabs are always < 65536.
        return toks.astype(jnp.uint16), lens.astype(jnp.int32), steps

    def super_one(params, img_table, tables, args):
        s16, lens, chunk_ids = args          # (S, B, T), (S, B), (S, B)
        S, B, T = s16.shape
        # ONE encoder pass over all S*B rows; src travels uint16 (half
        # the upload bytes) and the pad mask is built on device.
        s = s16.reshape(S * B, T).astype(jnp.int32)
        m = (jnp.arange(T)[None, :]
             < lens.reshape(S * B)[:, None]).astype(jnp.float32)
        batch = {"src": s, "src_mask": m}
        if multimodal:
            batch["img"] = jnp.take(img_table, chunk_ids.reshape(-1),
                                    axis=0)
        state = prepare_decode(params, cfg.model, batch)
        row_cap = _row_caps(cfg, max_len, lens.reshape(S * B))
        if streaming and beam_size > 1:
            from vag_nmt_tpu.decode.beam import beam_search_streaming

            res, steps, refills = beam_search_streaming(
                params, cfg.model, state, beam_size=beam_size,
                max_len=max_len, slots=B,
                refill_threshold=cfg.decode.refill_threshold,
                length_norm_alpha=cfg.decode.length_norm_alpha,
                tables=tables,
                beam_finish=cfg.decode.beam_finish,
                row_cap=row_cap,
                prune=cfg.decode.beam_prune != "off",
                block_ngram=cfg.decode.block_ngram)
            if nbest:
                return (res.tokens.reshape(S, B, beam_size, max_len)
                        .astype(jnp.uint16),
                        res.lengths.reshape(S, B, beam_size)
                        .astype(jnp.int32),
                        res.scores.reshape(S, B, beam_size)
                        .astype(jnp.float32),
                        steps[None], refills[None])
            return (res.best_tokens.reshape(S, B, max_len)
                    .astype(jnp.uint16),
                    res.best_lengths.reshape(S, B).astype(jnp.int32),
                    steps[None], refills[None])
        if two_phase and beam_size > 1:
            from vag_nmt_tpu.decode.beam import beam_search_two_phase

            L1 = cfg.decode.split_len or max(16, max_len // 4)
            res, steps1, steps2 = beam_search_two_phase(
                params, cfg.model, state, beam_size=beam_size,
                max_len=max_len, chunk=B, split_len=L1,
                length_norm_alpha=cfg.decode.length_norm_alpha,
                tables=tables,
                beam_finish=cfg.decode.beam_finish,
                row_cap=row_cap,
                prune=cfg.decode.beam_prune != "off",
                block_ngram=cfg.decode.block_ngram)
            if nbest:
                return (res.tokens.reshape(S, B, beam_size, max_len)
                        .astype(jnp.uint16),
                        res.lengths.reshape(S, B, beam_size)
                        .astype(jnp.int32),
                        res.scores.reshape(S, B, beam_size)
                        .astype(jnp.float32),
                        steps1, steps2[None])
            return (res.best_tokens.reshape(S, B, max_len)
                    .astype(jnp.uint16),
                    res.best_lengths.reshape(S, B).astype(jnp.int32),
                    steps1, steps2[None])
        state_chunks = jax.tree.map(
            lambda a: a.reshape((S, B) + a.shape[1:]), state)
        cap_chunks = (None if row_cap is None
                      else row_cap.reshape(S, B))
        return jax.lax.map(
            lambda a: _beam_one(params, a[0], tables, row_cap=a[1]),
            (state_chunks, cap_chunks))

    return super_one


@lru_cache(maxsize=64)
def make_fused_corpus_fn(cfg: Config, beam_size: int, max_len: int,
                         multimodal: bool, mesh=None, nbest: bool = False,
                         packed_spec=None, use_tables: bool = False,
                         two_phase: bool = False, streaming: bool = False,
                         env_key: tuple = ()):
    """ONE jitted program decoding the ENTIRE corpus: lax.map over fixed-size
    chunks of a single padded (n_super, S, B, T_src) token array, image
    features gathered on-device from a resident table. One dispatch + one
    host fetch per corpus — per-call dispatch latency (~30ms on a tunneled
    chip) and per-bucket recompiles disappear from the decode path.

    Super-chunking (S inferred from the input shapes; jit specializes per
    shape): each outer map iteration ENCODES S decode-chunks at once (S*B
    rows in one encoder pass — measured ~25-30% of corpus decode time was
    16-32 small per-chunk encoder invocations whose matmuls underfill the
    MXU) and then runs the S beam while_loops over slices of the shared
    encoded state. Per-row numerics are batch-size invariant, so hypotheses
    are identical for any S (tested).

    With a mesh, each chunk's batch rows are sharded over the 'data' axis
    (params + feature table replicated): sentences decode independently, so
    DP needs no collectives beyond the while_loop's all-finished reduction —
    GSPMD inserts that. The chunk axes stay unsharded (lax.map is
    sequential by construction)."""
    super_one = _make_super_one(cfg, beam_size, max_len, multimodal, nbest,
                                two_phase=two_phase, streaming=streaming)

    def run(params, src, src_lens, ids, img_table):
        # Under a mesh the encoder's Pallas GRU kernel is shard_map'ed over
        # 'data' (trace-time context; see ops/pallas_gru.shard_mesh) — the
        # rest of the decode graph stays GSPMD-partitioned.
        from vag_nmt_tpu.ops.pallas_gru import shard_mesh

        with shard_mesh(mesh):
            if cfg.model.compute_dtype == "bfloat16":
                params_c = cast_floats(params, jnp.bfloat16)
            else:
                params_c = params
            tables = (decode_tables(params_c["decoder"]) if use_tables
                      else None)
            return jax.lax.map(
                lambda a: super_one(params_c, img_table, tables, a),
                (src, src_lens, ids))

    if packed_spec is not None:
        # One-buffer transport BOTH ways (single-device path): the corpus's
        # (src, lens, ids) arrive as ONE uint8 buffer and unpack in-graph,
        # and ALL outputs (tokens/lengths/steps[/scores]) leave as ONE
        # packed uint8 buffer. Each host<->device round trip costs ~31 ms
        # on a tunneled chip and a naive fetch of a 3-output program pays
        # it 3 times — packing makes the whole corpus decode exactly one
        # upload + one dispatch + one fetch (data/packing.py).
        from vag_nmt_tpu.data.packing import pack_leaves, unpack_batch

        def run_packed(params, buf, img_table):
            b = unpack_batch(buf, packed_spec)
            out = run(params, b["src"], b["lens"], b["ids"], img_table)
            return pack_leaves(jax.tree.leaves(out))

        return jax.jit(run_packed)

    if mesh is None:
        return jax.jit(run)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vag_nmt_tpu.parallel.sharding import DATA_AXIS

    if two_phase or streaming:
        # Straggler architectures under a mesh (VERDICT r3 item 5): the
        # compaction's argsort + dynamic_slice re-pack ROWS, which under
        # GSPMD would reshard the row-sharded axis at every ladder rung /
        # refill event. Instead each device re-packs ITS OWN rows: shard_map
        # over 'data' runs the complete two-phase/streaming program per
        # shard. Exact by the same argument that makes any chunk packing
        # exact — the step body is row-local, so a row's carry evolves
        # identically whichever shard and local chunk it rides in
        # (beam.py beam_search_two_phase docstring; parity-tested on the
        # 8-virtual-device CPU mesh). Requires replicated params
        # (_mesh_repack_ok gates this path off for TP meshes). The
        # trip-count stats are pmax'ed over 'data' — the realized
        # wall-clock trips of the slowest shard, which is what the GSPMD
        # global while_loop would have run.
        row3 = P(None, None, DATA_AXIS)
        row4 = P(None, None, DATA_AXIS, None)
        row5 = P(None, None, DATA_AXIS, None, None)
        rep_s = P()
        out_specs = ((row5, row4, row4, rep_s, rep_s)
                     if nbest and beam_size > 1
                     else (row4, row3, rep_s, rep_s))

        def local(params, src, src_lens, ids, img_table):
            if cfg.model.compute_dtype == "bfloat16":
                params_c = cast_floats(params, jnp.bfloat16)
            else:
                params_c = params
            tables = (decode_tables(params_c["decoder"]) if use_tables
                      else None)
            out = jax.lax.map(
                lambda a: super_one(params_c, img_table, tables, a),
                (src, src_lens, ids))
            # Both architectures end in exactly two chunk-stat leaves
            # (phase-1 trips + phase-2 trips, or trips + refills): make
            # them replicated via pmax so they can leave as P().
            stats = tuple(jax.lax.pmax(x, DATA_AXIS) for x in out[-2:])
            return out[:-2] + stats

        # check_vma=False: the Pallas GRU kernel inside carries no
        # varying-axis metadata (same reason as ops/pallas_gru._sharded_scan,
        # whose own shard_map is NOT active here — batch rows are already
        # device-local, so the kernel runs its plain single-shard path).
        return jax.jit(jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), row4, row3, row3, P()),
            out_specs=out_specs, check_vma=False))

    rep = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(None, None, DATA_AXIS))  # (ns, S, B)
    row_t = NamedSharding(mesh, P(None, None, DATA_AXIS, None))
    row_kt = NamedSharding(mesh, P(None, None, DATA_AXIS, None, None))
    chunk = NamedSharding(mesh, P(None, None))           # (ns, S) per-chunk
    out_sh = ((row_kt, row_t, row_t, chunk) if nbest and beam_size > 1
              else (row_t, row, chunk))
    # params: None = keep the caller's committed sharding — replicated params
    # stay replicated, and TP-trained (vocab-sharded) params decode with
    # GSPMD-inserted vocab collectives, no host round trip through a gather.
    return jax.jit(run,
                   in_shardings=(None, row_t, row, row, rep),
                   out_shardings=out_sh)


@lru_cache(maxsize=64)
def make_fused_superchunk_fn(cfg: Config, beam_size: int, max_len: int,
                             multimodal: bool, nbest: bool = False,
                             use_tables: bool = False,
                             two_phase: bool = False,
                             streaming: bool = False,
                             env_key: tuple = ()):
    """Pipelined variant: one jitted program PER SUPER-CHUNK ((S, B, T) in,
    chunk results out). The caller keeps the whole corpus device-resident,
    enqueues all chunk calls back-to-back (async dispatch), and fetches
    results in order — the first chunk's device->host result transfer and
    the host-side detok overlap the later chunks' compute, hiding most of
    the corpus decode's fixed tail (~180 ms measured on the tunneled v5e:
    upload + dispatch + fetch + detok). Numerics identical to the
    single-dispatch program (same super_one body)."""
    super_one = _make_super_one(cfg, beam_size, max_len, multimodal, nbest,
                                two_phase=two_phase, streaming=streaming)

    @jax.jit
    def run1(params, s16, lens, chunk_ids, img_table):
        if cfg.model.compute_dtype == "bfloat16":
            params = cast_floats(params, jnp.bfloat16)
        tables = decode_tables(params["decoder"]) if use_tables else None
        return super_one(params, img_table, tables, (s16, lens, chunk_ids))

    return run1


def build_img_table(examples: Sequence[Example], img_dim: int,
                    dtype=np.float32) -> jax.Array:
    """Device-resident (N, F) image-feature table in EXAMPLE ORDER (row i =
    examples[i]). Build ONCE and pass to translate_corpus(img_table=...) when
    decoding the same corpus repeatedly — re-uploading ~30 MB of pool5
    features each call costs seconds on a tunneled chip (measured ~13 MB/s
    host->device) and dominated corpus decode before this."""
    tbl = np.zeros((len(examples), img_dim), dtype)
    for i, ex in enumerate(examples):
        tbl[i] = ex.img
    return jax.device_put(tbl)


def _translate_fused(params, cfg, examples, tgt_vocab, beam_size, max_len,
                     batch_size, de_bpe, img_table=None, mesh=None,
                     nbest: int = 0):
    from vag_nmt_tpu.data.batching import _bucket_for

    n = len(examples)
    B = batch_size
    if mesh is not None:
        n_data = mesh.shape["data"]
        if B % n_data:
            # round UP so every device gets equal rows (rows are padded with
            # replicas of the last real sentence anyway)
            B += n_data - B % n_data
    nb = -(-n // B)
    # Super-chunking: encode S decode-chunks (~1024 rows) per encoder pass.
    # ns/S are BALANCED (ns = ceil(nb/S_max), S = ceil(nb/ns)) so padding
    # adds at most S-1 chunks in the worst case and usually zero (e.g.
    # nb=10, S_max=8 -> ns=2, S=5, no filler), instead of padding nb up to
    # a multiple of S_max (which could decode ~60% filler).
    if nb:
        # VAG_SUPER_CHUNK: rows per super-chunk encoder pass (default 1024;
        # "0"/"1" disables super-chunking -> one encoder pass per decode
        # chunk). Bisect knob for the r01->r02 throughput regression
        # (VERDICT r2 item 2).
        import os

        rows_target = int(os.environ.get("VAG_SUPER_CHUNK", "1024") or 0)
        s_max = min(max(1, rows_target // B), nb)
        ns = -(-nb // s_max)
        S = -(-nb // ns)
    else:
        ns, S = 0, 1
    nb = ns * S
    t_src = _bucket_for(max(len(ex.src) for ex in examples),
                        cfg.data.length_buckets)
    multimodal = cfg.model.multimodal

    # Chunks are built in source-length order: the beam while_loop of a chunk
    # runs until its LONGEST hypothesis finishes, so homogeneous-length
    # chunks exit earlier (hypothesis length tracks source length). Corpus
    # order is restored after the fetch via `order`.
    order = sorted(range(n), key=lambda i: len(examples[i].src))

    if (cfg.model.src_vocab_size > 65535
            or cfg.model.tgt_vocab_size > 65535):
        raise ValueError(
            "fused decode transports token ids as uint16; vocab sizes must "
            f"be < 65536 (got src={cfg.model.src_vocab_size}, "
            f"tgt={cfg.model.tgt_vocab_size})")

    # Ragged->padded WITHOUT a per-row numpy loop: at corpus scale the row
    # loop's ~4096 small-array assignments cost ~10-20 ms INSIDE the timed
    # region (measured; the whole device decode is ~100 ms), so the fill is
    # one flat fromiter + one fancy-index scatter.
    src = np.zeros((nb * B, t_src), np.uint16)
    lens_in = np.zeros((nb * B,), np.int32)
    ids = np.zeros((nb * B,), np.int32)
    srcs = [examples[i].src for i in order]
    lens_list = np.fromiter((min(len(s), t_src) for s in srcs), np.int32, n)
    total = int(lens_list.sum())
    flat = np.fromiter(
        (tok for s, L in zip(srcs, lens_list) for tok in s[:L]),
        np.uint16, total)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens_list)
    starts = np.cumsum(lens_list, dtype=np.int64) - lens_list
    cols = np.arange(total, dtype=np.int64) - np.repeat(starts, lens_list)
    src[rows, cols] = flat
    lens_in[:n] = lens_list
    ids[:n] = np.asarray(order, np.int32)
    if n and n < nb * B:
        # Filler rows replicate a REAL row (src AND features): an all-masked
        # empty source may never emit <eos>, which would force a chunk's
        # while_loop to run all max_len steps. Rows padding out the last
        # real chunk copy its own last row; rows of entirely-filler chunks
        # copy row 0 — the SHORTEST sentence (ascending length order), so
        # wasted filler chunks exit their beam loop in a few steps.
        first_filler_chunk_row = (-(-n // B)) * B
        src[n:first_filler_chunk_row] = src[n - 1]
        lens_in[n:first_filler_chunk_row] = lens_in[n - 1]
        ids[n:first_filler_chunk_row] = ids[n - 1]
        if first_filler_chunk_row < nb * B:
            src[first_filler_chunk_row:] = src[0]
            lens_in[first_filler_chunk_row:] = lens_in[0]
            ids[first_filler_chunk_row:] = ids[0]
    if multimodal:
        if img_table is None:
            img_table = build_img_table(examples, cfg.model.img_feat_dim)
        elif img_table.shape[0] < n:
            # XLA gathers CLAMP out-of-range ids — a short table would
            # silently decode with the wrong features.
            raise ValueError(
                f"img_table has {img_table.shape[0]} rows for {n} examples "
                "(row i must be examples[i]'s features)")
    else:
        img_table = jnp.zeros((1, 1), jnp.float32)

    # Dispatch strategy (VAG_DECODE_PIPELINE): "on" enqueues one call PER
    # SUPER-CHUNK against device-resident inputs — async dispatch keeps the
    # device busy while earlier chunks' results stream back to the host,
    # overlapping fetch/detok with compute. On LOCAL TPU hosts (per-dispatch
    # cost ~tens of us) this hides most of the decode's fixed tail; on THIS
    # repo's tunneled chip each enqueue pays ~15 ms serialized round-trip,
    # so 16 enqueues measured +220 ms vs the single whole-corpus dispatch
    # (430 vs 210 ms at max_len=2, 4096 sentences) — default therefore OFF
    # here; flip it on for locally-attached hardware. The mesh path always
    # uses the one-program form (sharded inputs ride its in_shardings).
    import os

    pipe_env = os.environ.get("VAG_DECODE_PIPELINE", "off")
    use_pipe = (mesh is None and ns > 1
                and pipe_env in ("on", "auto", "pipe"))
    use_tab = _use_tables()
    streaming = _use_streaming(cfg, beam_size, mesh)
    two_phase = (not streaming) and _use_two_phase(cfg, beam_size, max_len,
                                                   mesh)
    t0 = time.perf_counter()
    if use_pipe:
        run1 = make_fused_superchunk_fn(cfg, beam_size, max_len, multimodal,
                                        nbest=bool(nbest),
                                        use_tables=use_tab,
                                        two_phase=two_phase,
                                        streaming=streaming,
                                        env_key=_env_fingerprint())
        src_d = jax.device_put(src.reshape(ns, S, B, t_src))
        lens_d = jax.device_put(lens_in.reshape(ns, S, B))
        ids_d = jax.device_put(ids.reshape(ns, S, B))
        # device-side slices: no extra host->device transfers per chunk
        outs = [run1(params, src_d[i], lens_d[i], ids_d[i], img_table)
                for i in range(ns)]
        fetched = [tuple(np.asarray(jax.device_get(x)) for x in o)
                   for o in outs]          # in order: fetch i overlaps i+1..
        out = tuple(np.concatenate([f[j] for f in fetched])
                    for j in range(len(fetched[0])))
    elif mesh is None:
        # one-buffer transport both ways (see make_fused_corpus_fn)
        from vag_nmt_tpu.data.packing import (
            leaves_spec,
            pack_batch,
            unpack_leaves_host,
        )

        buf, spec = pack_batch({
            "src": src.reshape(ns, S, B, t_src),
            "lens": lens_in.reshape(ns, S, B),
            "ids": ids.reshape(ns, S, B),
        })
        run = make_fused_corpus_fn(cfg, beam_size, max_len, multimodal, None,
                                   nbest=bool(nbest), packed_spec=spec,
                                   use_tables=use_tab, two_phase=two_phase,
                                   streaming=streaming,
                                   env_key=_env_fingerprint())
        raw = run(params, jax.device_put(buf), img_table)
        if nbest:
            leaves = [
                (np.uint16, (ns, S, B, beam_size, max_len)),
                (np.int32, (ns, S, B, beam_size)),
                (np.float32, (ns, S, B, beam_size)),
                (np.int32, (ns, S)),
            ]
        else:
            leaves = [
                (np.uint16, (ns, S, B, max_len)),
                (np.int32, (ns, S, B)),
                (np.int32, (ns, S)),
            ]
        if streaming:
            # steps totals replace per-chunk trips; plus refill counts
            leaves[-1] = (np.int32, (ns, 1))
            leaves.append((np.int32, (ns, 1)))
        elif two_phase:
            leaves.append((np.int32, (ns, 1)))   # phase-2 resume trips
        out_spec = leaves_spec(leaves)
        out = tuple(unpack_leaves_host(np.asarray(jax.device_get(raw)),
                                       out_spec))
    else:
        run = make_fused_corpus_fn(cfg, beam_size, max_len, multimodal, mesh,
                                   nbest=bool(nbest), use_tables=use_tab,
                                   two_phase=two_phase, streaming=streaming,
                                   env_key=_env_fingerprint())
        raw = run(
            params,
            jax.device_put(src.reshape(ns, S, B, t_src)),
            jax.device_put(lens_in.reshape(ns, S, B)),
            jax.device_put(ids.reshape(ns, S, B)),
            img_table,
        )
        out = tuple(np.asarray(jax.device_get(x)) for x in raw)
    phase2_steps = None
    refill_counts = None
    if streaming:
        out, refill_counts = out[:-1], np.asarray(out[-1]).reshape(-1)
    elif two_phase:
        out, phase2_steps = out[:-1], np.asarray(out[-1]).reshape(-1)
    if nbest:
        toks, lens, scores, chunk_steps = out
        K = toks.shape[-2]         # (.., B, K, L)
        toks = toks.reshape(nb * B, K, -1)
        lens = lens.reshape(nb * B, K)
        scores = scores.reshape(nb * B, K)
    else:
        toks, lens, chunk_steps = out
        toks = toks.reshape(nb * B, -1)
        lens = lens.reshape(nb * B)
    chunk_steps = chunk_steps.reshape(-1)
    elapsed = time.perf_counter() - t0

    # CORPUS-vectorized detok. The previous version vectorized per row but
    # still made ~4096 python iterations of small numpy calls — measured
    # 60-140 ms per corpus INSIDE the caller's timed window, comparable to
    # the whole device decode. Now: one boolean mask + one flat object-array
    # vocab gather over ALL rows, list-slice joins, and de-BPE as string ops
    # on ONE newline-joined buffer (vocab units never contain whitespace —
    # they come from whitespace-split corpora — so "\n" is a safe row
    # separator, and "@@ "/"@@\n" rewrites are exactly the per-line
    # remove_bpe semantics: mid-line joins and line-trailing "@@").
    itos = np.asarray(tgt_vocab.itos, dtype=object)
    special = np.zeros(len(itos), bool)
    special[[0, 1, 2, 3]] = True
    special[1] = False                   # keep <unk> like Vocab.decode does

    def detok_rows(toks2d, lens1d):      # (R, L) ids, (R,) -> R strings
        R, L = toks2d.shape
        t = toks2d.astype(np.int64, copy=False)
        keep = (np.arange(L)[None, :] < lens1d[:, None]) & ~special[t]
        counts = keep.sum(axis=1)
        words = itos[t[keep]].tolist()
        offs = np.concatenate([[0], np.cumsum(counts)]).tolist()
        lines = [" ".join(words[a:b]) for a, b in zip(offs, offs[1:])]
        if de_bpe:
            giant = "\n".join(lines)
            giant = giant.replace("@@ ", "").replace("@@\n", "\n")
            if giant.endswith("@@"):
                giant = giant[:-2]
            lines = giant.split("\n")
        return lines

    stats = {"sentences_per_sec": n / max(elapsed, 1e-9),
             "elapsed_s": elapsed, "sentences": n, "beam_size": beam_size,
             "beam_loop_steps": int(chunk_steps.sum())
             + (int(phase2_steps.sum()) if phase2_steps is not None else 0),
             # realized while_loop trips per chunk (ascending length order)
             # — the honest record of beam-loop behavior for MFU accounting
             # and bench realism checks (VERDICT r2 weak #4). Under the
             # two-phase decode these are the PHASE-1 trips (capped at
             # split_len); phase-2 straggler-resume trips are listed per
             # super-chunk in phase2_steps and included in beam_loop_steps
             # (each phase-2 trip costs one chunk-width decoder step, same
             # as a phase-1 trip).
             "chunk_steps": [int(s) for s in chunk_steps.reshape(-1)],
             "n_chunks": nb, "rows_per_chunk": B, "t_src": int(t_src)}
    if phase2_steps is not None:
        stats["two_phase"] = True
        stats["phase2_steps"] = [int(s) for s in phase2_steps]
    if refill_counts is not None:
        # streaming: chunk_steps held per-SUPER-chunk trip totals
        stats["streaming"] = True
        stats["refills"] = [int(r) for r in refill_counts]
    if nbest:
        L = toks.shape[-1]
        nb_k = min(nbest, K)
        # beams are best-first, so only the requested top-nb_k rows pay
        # detok (with beam_size=5, nbest=1 the full-K version did 5x the
        # host string work for output nobody reads)
        lines = detok_rows(toks[:n, :nb_k].reshape(n * nb_k, L),
                           lens[:n, :nb_k].reshape(n * nb_k))
        sc = scores[:n]
        lists: List[List[Tuple[str, float]]] = [[] for _ in range(n)]
        for r, i in enumerate(order):
            lists[i] = [(lines[r * nb_k + k], float(sc[r, k]))
                        for k in range(nb_k)]
        return lists, stats
    lines = detok_rows(toks[:n], lens[:n])
    hyps: List[str] = [""] * n
    for r, i in enumerate(order):
        hyps[i] = lines[r]
    return hyps, stats


def translate_corpus(
    params,
    cfg: Config,
    examples: Sequence[Example],
    tgt_vocab: Vocab,
    *,
    beam_size: Optional[int] = None,
    max_len: Optional[int] = None,
    batch_size: Optional[int] = None,
    de_bpe: bool = True,
    fused: bool = True,
    img_table: Optional[jax.Array] = None,
    mesh=None,
    nbest: int = 0,
) -> Tuple[List, Dict[str, float]]:
    """Returns (hypothesis lines in EXAMPLE-LIST ORDER — hyps[i] translates
    examples[i] — plus stats incl. sentences/sec). Both the fused (default)
    and the bucketed (fused=False) path honor this contract.

    img_table: optional device-resident feature table from build_img_table
    (row i = examples[i]); pass it when decoding the same corpus repeatedly
    to skip the per-call host->device feature upload. With a table, examples
    may carry img=None.

    mesh: optional jax.sharding.Mesh — shards each chunk's batch rows over
    the 'data' axis (fused path only; hypotheses are bit-identical to the
    single-device run, tested on an 8-virtual-device CPU mesh).

    nbest: 0 (default) returns one best-hypothesis string per example;
    nbest=N>0 returns, per example, a list of up to N (text, score) pairs,
    best first, with length-normalized beam scores (requires beam_size > 1
    and the fused path; N is capped at beam_size)."""
    # Decode-side compute dtype (core/config.py DecodeConfig.compute_dtype:
    # fp32 default — measured faster than bf16 on the latency-bound decode
    # loop). One resolution point: every downstream program builder reads
    # cfg.model.compute_dtype from this (frozen, hashable) cfg, so the
    # program caches key correctly.
    dd = cfg.decode.compute_dtype
    if dd and dd != cfg.model.compute_dtype:
        cfg = cfg.replace(model=dict(compute_dtype=dd))
    beam_size = beam_size if beam_size is not None else cfg.decode.beam_size
    max_len = max_len if max_len is not None else cfg.decode.max_len
    batch_size = (batch_size if batch_size is not None
                  else cfg.decode.decode_batch_size)
    if nbest:
        if beam_size <= 1:
            raise ValueError("nbest output requires beam_size > 1")
        if not fused:
            raise ValueError("nbest output requires the fused decode path")

    img_ok = (not cfg.model.multimodal
              or img_table is not None
              or all(ex.img is not None for ex in examples))
    if cfg.model.multimodal and not img_ok:
        raise ValueError(
            "multimodal decode needs features: either every example carries "
            ".img or a device-resident img_table is passed")
    if not examples:
        # empty corpus: nothing to decode on any path (a mesh-sharded dev
        # eval with no dev examples must not trip the fused-path guard)
        return [], {"sentences_per_sec": 0.0, "elapsed_s": 0.0,
                    "sentences": 0, "beam_size": beam_size}
    if fused:
        return _translate_fused(params, cfg, examples, tgt_vocab, beam_size,
                                max_len, batch_size, de_bpe,
                                img_table=img_table, mesh=mesh, nbest=nbest)
    if mesh is not None:
        raise ValueError("mesh-sharded decode requires the fused path")

    # Bucketed path (per-bucket-shape programs). Image features live on the
    # device once; per-batch feeds carry int32 row ids (positions into
    # `examples`, same keying as build_img_table) and the gather runs on
    # device.
    use_table = cfg.model.multimodal
    if use_table and img_table is None:
        img_table = build_img_table(examples, cfg.model.img_feat_dim)
    # Re-index by list position so output ordering and table rows agree
    # regardless of the examples' own .index values.
    positioned = [dataclasses.replace(ex, index=i)
                  for i, ex in enumerate(examples)]
    batcher = BucketBatcher(
        positioned, batch_size, cfg.data.length_buckets,
        image_ids=use_table, img_dim=cfg.model.img_feat_dim)
    decode = make_decode_fn(cfg, beam_size, max_len, _use_tables(),
                            env_key=_env_fingerprint())

    n = len(examples)
    hyps: List[Optional[str]] = [None] * n
    t0 = time.perf_counter()
    n_done = 0
    # Keep device results in flight and fetch at the end: each device_get
    # pays a fixed round-trip latency, so per-batch synchronous gets would
    # serialize transfers with compute.
    pending = []
    for batch in device_prefetch(batcher.epoch(0, shuffle=False), size=2):
        feed = {k: v for k, v in batch.items() if k not in ("index",)}
        toks, lens = decode(params, feed, img_table if use_table else None)
        pending.append((toks, lens, batch["index"], batch["sample_mask"]))
    for toks, lens, index, smask in pending:
        toks, lens, index, smask = map(
            lambda x: np.asarray(jax.device_get(x)), (toks, lens, index, smask))
        for r in range(toks.shape[0]):
            if smask[r] == 0:
                continue
            units = tgt_vocab.decode(toks[r, : lens[r]])
            line = " ".join(remove_bpe(units) if de_bpe else units)
            hyps[int(index[r])] = line
            n_done += 1
    elapsed = time.perf_counter() - t0
    assert n_done == n, f"decoded {n_done} of {n} sentences"
    stats = {"sentences_per_sec": n / max(elapsed, 1e-9), "elapsed_s": elapsed,
             "sentences": n, "beam_size": beam_size}
    return [h if h is not None else "" for h in hyps], stats
