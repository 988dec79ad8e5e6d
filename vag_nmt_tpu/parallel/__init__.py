from vag_nmt_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    batch_sharding,
    param_shardings,
    replicated,
)
