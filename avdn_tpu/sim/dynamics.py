"""View-area dynamics — the drone "simulator step", on device.

The reference duplicates this logic verbatim inside both agents as
``move_view_corners`` (src/xview_et/agent.py:285-384 ≡
src/xview_lstm/agent.py:274-373). Here it is a single, batched, branch-free
JAX function usable inside a ``lax.scan`` rollout.

Semantics (kept bit-faithful where supervision depends on them):
  1. **Zoom** — expand/shrink corners toward a target edge length
     (``altitude`` is encoded as the view edge length in meters, ∈ [40, 400]).
  2. **Rotate** — rotate corners by ``-angle`` about the centroid using the
     reference's π ≈ 3.14159 constant.
  3. **Move** — translate along the front-edge direction by ``distance``.
  Each stage aborts (keeping the previous stage's corners) if any corner
  would leave the map bounds; a zoom abort skips rotate+move entirely
  (reference src/xview_et/agent.py:332-341).

Coordinates are GPS *offsets* from the map's bottom-left corner, so bounds
checks are against ``(0, 0)``..``extent`` and float32 keeps centimetre
precision (raw GPS magnitudes would eat the mantissa).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from avdn_tpu.geometry.transforms import DEG_TO_M, get_direction

_PI_REF = 3.14159  # the reference's π (src/xview_et/agent.py:298)


def _norm(v):
    return jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True)) + 1e-20


def _change_corner(cs, change):
    """Zoom: push each corner away from both adjacent edges by ``change``
    (reference src/xview_et/agent.py:301-315)."""
    c0, c1, c2, c3 = cs[0], cs[1], cs[2], cs[3]
    n01 = (c0 - c1) / _norm(c1 - c0)
    n03 = (c0 - c3) / _norm(c3 - c0)
    n10 = (c1 - c0) / _norm(c1 - c0)
    n12 = (c1 - c2) / _norm(c2 - c1)
    n23 = (c2 - c3) / _norm(c2 - c3)
    n21 = (c2 - c1) / _norm(c2 - c1)
    n32 = (c3 - c2) / _norm(c2 - c3)
    n30 = (c3 - c0) / _norm(c3 - c0)
    return jnp.stack(
        [
            c0 + (n01 + n03) * change,
            c1 + (n10 + n12) * change,
            c2 + (n23 + n21) * change,
            c3 + (n32 + n30) * change,
        ]
    )


def _move_forward(cs, change):
    """Translate the view along its front edge normal
    (reference src/xview_et/agent.py:286-296). Note corners 2/3 move along
    the *front* corners' vectors — preserving the reference exactly."""
    c0, c1, c2, c3 = cs[0], cs[1], cs[2], cs[3]
    f03 = (c0 - c3) / _norm(c3 - c0)
    f12 = (c1 - c2) / _norm(c2 - c1)
    return jnp.stack(
        [c0 + f03 * change, c1 + f12 * change, c2 + f12 * change, c3 + f03 * change]
    )


def _rotate_about(center, pts, angle_deg):
    """rotation_anticlock with the reference's constant
    (src/xview_et/agent.py:297-300), applied as ``-angle``."""
    theta = -angle_deg / 180.0 * _PI_REF
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    rel = pts - center
    rot = jnp.stack(
        [c * rel[..., 0] + s * rel[..., 1], -s * rel[..., 0] + c * rel[..., 1]],
        axis=-1,
    )
    return center + rot


def _in_bounds(pts, extent):
    """Strict interior test against (0,0)..extent for all 4 corners."""
    ok = (pts > 0.0) & (pts < extent[None, :])
    return jnp.all(ok)


def move_view_corners(
    corners: jnp.ndarray,
    angle: jnp.ndarray,
    distance: jnp.ndarray,
    altitude: jnp.ndarray,
    extent: jnp.ndarray,
    input_current_direction: jnp.ndarray | None = None,
):
    """Single-item dynamics step.

    Args:
      corners: (4, 2) GPS-offset corners (lat, lng) from map bottom-left.
      angle: rotation in degrees (caller pre-rounds as the reference does).
      distance: forward move in GPS degrees.
      altitude: target edge length in meters (∈ [40, 400]).
      extent: (2,) map extent (top_right − botm_left) in degrees.
      input_current_direction: tracked heading in degrees, or None.

    Returns: (new_corners (4, 2), new_direction_deg).
    """
    corners = jnp.asarray(corners, jnp.float32)
    current_direction = (
        jnp.round(get_direction(jnp.mean(corners, axis=0), (corners[0] + corners[1]) / 2.0))
        % 360.0
    )
    if input_current_direction is not None:
        # heading drift correction (reference src/xview_et/agent.py:318-320)
        drift = jnp.abs(input_current_direction - current_direction) > 2.0
        angle = angle + jnp.where(drift, input_current_direction, 0.0)

    # -------- Zoom --------
    edge_len_m = jnp.linalg.norm(corners[1] - corners[0]) * DEG_TO_M
    zoom_change = 0.5 * (altitude - edge_len_m) / DEG_TO_M
    zoomed = _change_corner(corners, zoom_change)
    zoom_ok = _in_bounds(zoomed, extent)
    after_zoom = jnp.where(zoom_ok, zoomed, corners)

    # -------- Rotate --------
    center = jnp.mean(after_zoom, axis=0)
    rotated = _rotate_about(center, after_zoom, angle)
    rot_ok = _in_bounds(rotated, extent)
    after_rot = jnp.where(rot_ok, rotated, after_zoom)

    # -------- Move --------
    moved = _move_forward(after_rot, distance)
    move_ok = _in_bounds(moved, extent)
    after_move = jnp.where(move_ok, moved, after_rot)

    # A zoom abort returns immediately with the ORIGINAL corners and
    # unmodified heading (reference src/xview_et/agent.py:339-340); a rotate
    # abort keeps the zoomed corners and unmodified heading (:362-363); a
    # move abort keeps the rotated corners but commits the heading (:381-384).
    new_corners = jnp.where(zoom_ok, jnp.where(rot_ok, after_move, after_zoom), corners)
    new_dir = jnp.where(
        zoom_ok & rot_ok, (current_direction + angle) % 360.0, current_direction
    )
    return new_corners, new_dir


move_view_corners_batch = jax.jit(
    jax.vmap(move_view_corners, in_axes=(0, 0, 0, 0, 0, 0))
)
