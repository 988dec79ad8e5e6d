from vag_nmt_tpu.ops.gru import (  # noqa: F401
    gru_cell,
    gru_scan,
    bidirectional_gru,
    init_gru_params,
)
from vag_nmt_tpu.ops.attention import (  # noqa: F401
    bahdanau_attend,
    init_attention_params,
    masked_softmax,
    precompute_ctx_proj,
)
