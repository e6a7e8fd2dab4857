from avdn_tpu.rollout.engine import (
    EpisodeBatch,
    RolloutConfig,
    RolloutOutputs,
    rollout,
    RGB_MEAN,
    RGB_STD,
)
from avdn_tpu.rollout.fused import rollout_teacher_fused

__all__ = [
    "EpisodeBatch",
    "RolloutConfig",
    "RolloutOutputs",
    "rollout",
    "rollout_teacher_fused",
    "RGB_MEAN",
    "RGB_STD",
]
