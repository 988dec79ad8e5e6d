from vag_nmt_tpu.decode.greedy import greedy_decode  # noqa: F401
from vag_nmt_tpu.decode.beam import beam_search  # noqa: F401
