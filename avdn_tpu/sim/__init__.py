from avdn_tpu.sim.dynamics import move_view_corners, move_view_corners_batch
from avdn_tpu.sim.oracle import teacher_action, teacher_action_batch

__all__ = [
    "move_view_corners",
    "move_view_corners_batch",
    "teacher_action",
    "teacher_action_batch",
]
