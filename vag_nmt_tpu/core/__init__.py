from vag_nmt_tpu.core.config import (  # noqa: F401
    Config,
    DataConfig,
    DecodeConfig,
    ModelConfig,
    TrainConfig,
    preset,
    PRESETS,
)
