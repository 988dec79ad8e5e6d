from vag_nmt_tpu.models.model import (  # noqa: F401
    DecodeState,
    decode_step,
    embeddings_for_retrieval,
    init_params,
    loss_fn,
    prepare_decode,
)
