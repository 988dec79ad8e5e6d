from vag_nmt_tpu.data.vocab import Vocab  # noqa: F401
from vag_nmt_tpu.data.bpe import BPE, learn_bpe  # noqa: F401
from vag_nmt_tpu.data.tokenizer import tokenize, detokenize  # noqa: F401
from vag_nmt_tpu.data.batching import BucketBatcher, Example  # noqa: F401
from vag_nmt_tpu.data.prefetch import device_prefetch  # noqa: F401
