from avdn_tpu.metrics.nav import (
    eval_item,
    eval_metrics,
    assemble_trajectories,
    count_dialog_rounds,
)

__all__ = [
    "eval_item",
    "eval_metrics",
    "assemble_trajectories",
    "count_dialog_rounds",
]
