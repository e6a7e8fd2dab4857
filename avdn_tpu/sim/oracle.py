"""Teacher oracle — ground-truth action supervision, on device.

Replaces the Shapely-based ``teacher_action`` duplicated in both reference
agents (src/xview_et/agent.py:386-507 ≡ src/xview_lstm/agent.py:375-513) with
a fixed-shape vectorized JAX formulation:

* progress     = hull-union IoU of the current view vs the final GT view
* altitude     = edge length of the *closest* GT step, normalised to [0, 1]
                 via ``(m − 40) / 360``
* waypoint     = the point where the GT path polyline (teacher forcing) or
                 the straight line to the goal (student mode) crosses the
                 current view quad, choosing the intersection point closest
                 to the goal center; expressed as a ratio against the view's
                 half-axes and clamped to the ∞-ball.

GT paths are padded to a static ``max_gt_len`` with a ``gt_len`` count.
Coordinates are GPS offsets from the map bottom-left (see sim.dynamics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from avdn_tpu.geometry.quad import quad_iou, clip_segment_to_quad
from avdn_tpu.geometry.transforms import DEG_TO_M


def _closest_gt_step(gt_centers, gt_len, current_pos):
    """Index of the GT step whose center is closest to ``current_pos``,
    scanning from the last step backwards with the reference's 1e-5
    strict-improvement epsilon (src/xview_et/agent.py:410-416): ties keep the
    later (higher-index) step."""
    max_t = gt_centers.shape[0]

    def body(k, state):
        min_dis, best = state
        j = max_t - 1 - k  # descending
        valid = j < gt_len
        d = jnp.linalg.norm(gt_centers[j] - current_pos)
        take = valid & (d + 1e-5 < min_dis)
        return jnp.where(take, d, min_dis), jnp.where(take, j, best)

    _, best = jax.lax.fori_loop(0, max_t, body, (jnp.float32(1000.0), jnp.int32(0)))
    return best


def teacher_action(
    corners: jnp.ndarray,
    ended: jnp.ndarray,
    gt_corners: jnp.ndarray,
    gt_len: jnp.ndarray,
    teacher_forcing: bool,
):
    """Single-item oracle.

    Args:
      corners: (4, 2) current view corners (GPS offsets).
      ended: () bool — episode already finished.
      gt_corners: (max_gt_len, 4, 2) padded GT path corners.
      gt_len: () int — number of valid GT steps.
      teacher_forcing: static — follow the GT polyline (True) or aim straight
        at the goal (False; reference "student" branch, agent.py:430-434).

    Returns dict with ``waypoint_ratio`` (2,), ``altitude`` (), ``progress`` ().
    """
    corners = jnp.asarray(corners, jnp.float32)
    current_pos = jnp.mean(corners, axis=0)
    max_t = gt_corners.shape[0]
    goal_idx = jnp.maximum(gt_len - 1, 0)
    goal_quad = gt_corners[goal_idx]
    goal_center = jnp.mean(goal_quad, axis=0)

    # -------- progress (IoU vs final GT view) --------
    progress = quad_iou(corners, goal_quad)

    # -------- teacher altitude --------
    gt_centers = jnp.mean(gt_corners, axis=1)  # (max_t, 2)
    closest = _closest_gt_step(gt_centers, gt_len, current_pos)
    closest_edge_m = (
        jnp.linalg.norm(gt_corners[closest, 0] - gt_corners[closest, 1]) * DEG_TO_M
    )
    altitude = (closest_edge_m - 40.0) / (400.0 - 40.0)

    # -------- waypoint --------
    # candidates from clipping the GT polyline (teacher) or goal line (student)
    def polyline_candidates():
        p0s = gt_centers[: max_t - 1]
        p1s = gt_centers[1:max_t]
        seg_valid = jnp.arange(max_t - 1) < (gt_len - 1)
        q0, q1, v = jax.vmap(lambda a, b: clip_segment_to_quad(a, b, corners))(
            p0s, p1s
        )
        v = v & seg_valid
        pts = jnp.concatenate([q0, q1], axis=0)  # (2*(max_t-1), 2)
        valid = jnp.concatenate([v, v], axis=0)
        return pts, valid

    def goal_line_candidates():
        q0, q1, v = clip_segment_to_quad(current_pos, goal_center, corners)
        pts = jnp.stack([q0, q1], axis=0)
        valid = jnp.stack([v, v], axis=0)
        return pts, valid

    line_pts, line_valid = goal_line_candidates()
    if teacher_forcing:
        poly_pts, poly_valid = polyline_candidates()
        any_poly = jnp.any(poly_valid)
        # fallback to the goal line when the polyline misses the view
        # (reference src/xview_et/agent.py:446-451)
        n = poly_pts.shape[0]
        pts = jnp.where(any_poly, poly_pts, jnp.resize(line_pts, (n, 2)))
        valid = jnp.where(
            any_poly, poly_valid, jnp.resize(line_valid, (n,)) & (jnp.arange(n) < 2)
        )
    else:
        pts, valid = line_pts, line_valid

    # closest-to-goal selection with min_distance init 1 (agent.py:457-463)
    dist = jnp.linalg.norm(pts - goal_center[None, :], axis=-1)
    dist = jnp.where(valid, dist, jnp.inf)
    best = jnp.argmin(dist)
    waypoint = jnp.where(dist[best] < 1.0, pts[best], jnp.zeros(2, corners.dtype))

    # -------- waypoint → view-frame ratio (agent.py:484-503) --------
    net_next = 1e5 * (waypoint - current_pos)
    # the reference int-rounds the axis vectors (agent.py:485-486)
    net_y = jnp.round(1e5 * ((corners[0] + corners[1]) / 2.0 - current_pos))
    net_x = jnp.round(1e5 * ((corners[1] + corners[2]) / 2.0 - current_pos))
    # solve [[x0, y0], [x1, y1]] @ r = net_next
    det = net_x[0] * net_y[1] - net_y[0] * net_x[1]
    safe_det = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    r0 = (net_next[0] * net_y[1] - net_y[0] * net_next[1]) / safe_det
    r1 = (net_x[0] * net_next[1] - net_next[0] * net_x[1]) / safe_det
    ratio = jnp.stack([r0, r1])
    ratio = ratio / jnp.maximum(jnp.max(jnp.abs(ratio)), 1.0)

    # stop target: zero waypoint when ended or close enough (agent.py:420-422)
    stop = ended | (progress > 0.5)
    ratio = jnp.where(stop, jnp.zeros_like(ratio), ratio)

    return {
        "waypoint_ratio": ratio.astype(jnp.float32),
        "altitude": altitude.astype(jnp.float32),
        "progress": progress.astype(jnp.float32),
    }


@functools.partial(jax.jit, static_argnames=("teacher_forcing",))
def teacher_action_batch(corners, ended, gt_corners, gt_len, teacher_forcing: bool):
    """Batched oracle: corners (B,4,2), ended (B,), gt_corners (B,T,4,2),
    gt_len (B,)."""
    return jax.vmap(
        lambda c, e, g, l: teacher_action(c, e, g, l, teacher_forcing)
    )(corners, ended, gt_corners, gt_len)
