from vag_nmt_tpu.decode.greedy import greedy_decode  # noqa: F401
from vag_nmt_tpu.decode.beam import (  # noqa: F401
    beam_search,
    beam_search_two_phase,
)
from vag_nmt_tpu.decode.translate import (  # noqa: F401
    build_img_table,
    translate_corpus,
)
from vag_nmt_tpu.decode.serve import Translator  # noqa: F401
