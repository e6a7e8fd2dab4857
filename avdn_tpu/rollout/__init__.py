from avdn_tpu.rollout.engine import (
    EpisodeBatch,
    RolloutConfig,
    RolloutOutputs,
    rollout,
    RGB_MEAN,
    RGB_STD,
)

__all__ = [
    "EpisodeBatch",
    "RolloutConfig",
    "RolloutOutputs",
    "rollout",
    "RGB_MEAN",
    "RGB_STD",
]
