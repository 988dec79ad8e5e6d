from vag_nmt_tpu.train.state import TrainState, create_train_state  # noqa: F401
from vag_nmt_tpu.train.step import make_train_step, make_eval_step  # noqa: F401
from vag_nmt_tpu.train.checkpoint import (  # noqa: F401
    load_checkpoint,
    save_checkpoint,
)
