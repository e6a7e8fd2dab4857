"""Coordinate transforms and direction math.

Ports the task-defining scalar conventions of the reference exactly —
including its idiosyncratic degree conversion constant ``/1.57*90`` — because
downstream supervision targets depend on them (reference src/env.py:48-84,
src/env.py:189-196).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

#: GPS degrees → meters scale used throughout the reference (src/env.py:339).
DEG_TO_M = 11.13e4


def get_direction(start, end):
    """Compass angle (N=0°, E=90°) of the GPS vector start→end.

    Exact port of the reference formula (src/env.py:48-66), including the
    approximate radian→degree factor ``arctan(x)/1.57*90`` and the tie
    handling for vec[1] == 0. Works on scalars or batched (..., 2) arrays.
    """
    start = jnp.asarray(start)
    end = jnp.asarray(end)
    vec = end - start
    v0, v1 = vec[..., 0], vec[..., 1]
    base = jnp.arctan(v0 / jnp.where(v1 == 0, 1.0, v1)) / 1.57 * 90.0
    angle = jnp.where(
        v1 > 0,
        base,
        jnp.where(v1 < 0, base + 180.0, jnp.where(jnp.sign(v0) == 1, 90.0, 270.0)),
    )
    return (360.0 - angle + 90.0) % 360.0


def name_the_direction(angle: float) -> str:
    """Compass name for an angle in degrees (reference src/env.py:68-84)."""
    angle = float(angle)
    if angle > 337.5 or angle < 22.5:
        return "north"
    if abs(angle - 45) <= 22.5:
        return "northeast"
    if abs(angle - 135) <= 22.5:
        return "southeast"
    if abs(angle - 90) <= 22.5:
        return "east"
    if abs(angle - 180) <= 22.5:
        return "south"
    if abs(angle - 315) <= 22.5:
        return "northwest"
    if abs(angle - 225) <= 22.5:
        return "southwest"
    if abs(angle - 270) <= 22.5:
        return "west"
    return "unknown"


def gps_to_img_coords(gps, gps_botm_left, gps_top_right, lat_ratio, round_int=True):
    """GPS (lat, lng) → image (x, y) pixel coords.

    Matches the reference mapping (src/env.py:189-196): after the map is
    resampled to square pixels of size ``lat_ratio`` degrees,
    ``x = (lng - botm_left.lng) / lat_ratio`` and
    ``y = (top_right.lat - lat) / lat_ratio``, rounded to int.

    Set ``round_int=False`` for the continuous (sub-pixel) mapping used by the
    on-device renderer.
    """
    gps = jnp.asarray(gps)
    gps_botm_left = jnp.asarray(gps_botm_left)
    gps_top_right = jnp.asarray(gps_top_right)
    x = (gps[..., 1] - gps_botm_left[..., 1]) / lat_ratio
    y = (gps_top_right[..., 0] - gps[..., 0]) / lat_ratio
    if round_int:
        x = jnp.round(x).astype(jnp.int32)
        y = jnp.round(y).astype(jnp.int32)
    return jnp.stack([x, y], axis=-1)


def gps_to_img_coords_np(gps, gps_botm_left, gps_top_right, lat_ratio):
    """Host-side (numpy, float64) version returning the reference's
    ``(x, y)`` int tuple (src/env.py:189-196)."""
    return (
        int(round((gps[1] - gps_botm_left[1]) / lat_ratio)),
        int(round((gps_top_right[0] - gps[0]) / lat_ratio)),
    )
