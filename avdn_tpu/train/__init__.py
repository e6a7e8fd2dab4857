from avdn_tpu.train.step import (
    TrainConfig,
    TrainState,
    TrainBatch,
    create_train_state,
    make_train_step,
    make_eval_rollout,
)

__all__ = [
    "TrainConfig",
    "TrainState",
    "TrainBatch",
    "create_train_state",
    "make_train_step",
    "make_eval_rollout",
]
