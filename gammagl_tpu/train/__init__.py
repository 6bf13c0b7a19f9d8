from gammagl_tpu.train.state import (TrainState, save_checkpoint,
                                     load_checkpoint,
                                     save_checkpoint_sharded,
                                     load_checkpoint_sharded)
from gammagl_tpu.train.metrics import (accuracy, micro_f1, macro_f1,
                                       semi_supervised_loss)

__all__ = [
    "TrainState",
    "save_checkpoint",
    "load_checkpoint",
    "save_checkpoint_sharded",
    "load_checkpoint_sharded",
    "accuracy",
    "micro_f1",
    "macro_f1",
    "semi_supervised_loss",
]
