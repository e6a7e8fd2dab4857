"""On-device view renderer — the "drone camera".

Replaces the reference's per-sample host-side OpenCV pipeline
(``cv2.getPerspectiveTransform`` + ``cv2.warpPerspective`` per item per step,
src/env.py:254-332) with a batched XLA formulation:

* a 4-point DLT homography solve (B, 8, 8) on device,
* an inverse-mapped bilinear gather over an HBM-resident map bank,
* an *analytic* human-attention saliency render — instead of rasterising GT
  attention circles into a second full-map image and warping it
  (src/env.py:224-231, 292-293), each output pixel's source coordinate is
  tested against the circle set directly. No raster, no second warp.

Per-item semantics note: the reference caches one attention raster per map
*name*, so two batch items sharing a map silently reuse the first item's
circles (src/env.py:212-231). Here circles are per-item, which is the
intended behaviour; the difference only shows when a batch mixes items of
the same map with different dialog rounds.

This XLA formulation is the production path: a hand-written Pallas warp
prototype was benchmarked and rejected (no win over XLA's fused gather at
these shapes — see PERF.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

VIEW_HW = 224


def dst_square_corners(width: int = VIEW_HW, height: int = VIEW_HW):
    """Destination corners matching the reference order (src/env.py:275-278):
    (0,0), (W-1,0), (W-1,H-1), (0,H-1)."""
    return jnp.array(
        [[0.0, 0.0], [width - 1.0, 0.0], [width - 1.0, height - 1.0], [0.0, height - 1.0]],
        jnp.float32,
    )


def homography_4pt(src_pts: jnp.ndarray, dst_pts: jnp.ndarray) -> jnp.ndarray:
    """DLT homography H such that H @ [sx, sy, 1]^T ~ [dx, dy, 1]^T.

    src_pts, dst_pts: (4, 2). Returns (3, 3) with H[2,2] == 1.
    Equivalent to cv2.getPerspectiveTransform (src/env.py:287).
    """
    x, y = src_pts[:, 0], src_pts[:, 1]
    u, v = dst_pts[:, 0], dst_pts[:, 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    rows_u = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y], axis=-1)
    rows_v = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y], axis=-1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # (8, 8)
    b = jnp.concatenate([u, v], axis=0)  # (8,)
    h = jnp.linalg.solve(A, b)
    return jnp.concatenate([h, jnp.ones(1, h.dtype)]).reshape(3, 3)


def square_to_quad_homography(quad: jnp.ndarray) -> jnp.ndarray:
    """Closed-form homography mapping the UNIT square (corners (0,0), (1,0),
    (1,1), (0,1)) onto ``quad`` (4, 2).

    Equivalent to the 8x8 DLT solve but pure arithmetic — ``jnp.linalg.solve``
    lowers to slow scalar LU loops on TPU and dominated the compiled rollout
    (measured 130ms/episode-batch); this formulation is a handful of VPU ops.
    Classic projective-texture-mapping identity (Heckbert '89).
    """
    p0, p1, p2, p3 = quad[0], quad[1], quad[2], quad[3]
    d1 = p1 - p2
    d2 = p3 - p2
    s = p0 - p1 + p2 - p3

    def cross(a, b):
        return a[0] * b[1] - a[1] * b[0]

    denom = cross(d1, d2)
    denom = jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20)
    g = cross(s, d2) / denom
    h = cross(d1, s) / denom
    a_vec = p1 - p0 + g * p1
    b_vec = p3 - p0 + h * p3
    return jnp.array(
        [
            [a_vec[0], b_vec[0], p0[0]],
            [a_vec[1], b_vec[1], p0[1]],
            [g, h, 1.0],
        ],
        quad.dtype,
    )


def view_to_map_coords(src_quad: jnp.ndarray, out_hw: int = VIEW_HW,
                       positions: jnp.ndarray | None = None) -> jnp.ndarray:
    """Continuous map-space coordinates for every output pixel.

    src_quad: (4, 2) view-area corners in map image (x, y) coords.
    Returns (out_hw, out_hw, 2) of (x, y) sampling positions — the inverse
    perspective map (what warpPerspective applies per output pixel).

    ``positions`` optionally overrides the per-axis unit-square sample
    positions (length out_hw; default the pixel grid i/(out-1)) — used by the
    subsampled fast mode to sample where the later bilinear upscale will
    reconstruct.
    """
    # homography from the DST square to the SRC quad = inverse warp map;
    # dst pixel (x, y) / (out-1) is the unit-square coordinate
    H = square_to_quad_homography(src_quad.astype(jnp.float32))
    if positions is None:
        positions = jnp.arange(out_hw, dtype=jnp.float32) / (out_hw - 1.0)
    ys, xs = jnp.meshgrid(positions, positions, indexing="ij")
    ones = jnp.ones_like(xs)
    pts = jnp.stack([xs, ys, ones], axis=-1)  # (H, W, 3) in unit-square space
    mapped = pts @ H.T
    denom = mapped[..., 2:3]
    return mapped[..., :2] / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)


def bilinear_gather(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample ``img`` (H, W, C) at ``coords`` (..., 2) of (x, y).

    Constant-0 border, matching cv2.warpPerspective defaults
    (src/env.py:290-292).
    """
    H, W = img.shape[0], img.shape[1]
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        val = img[yi_c, xi_c].astype(jnp.float32)
        return jnp.where(inb[..., None], val, 0.0)

    v00 = tap(x0i, y0i)
    v01 = tap(x0i + 1, y0i)
    v10 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def saliency_at(coords: jnp.ndarray, circles: jnp.ndarray, n_circles) -> jnp.ndarray:
    """Analytic GT-attention saliency.

    coords: (..., 2) map-space (x, y); circles: (C, 3) of (cx, cy, radius) in
    map pixels, padded with radius<=0. Returns float32 in {0, 1}: 1 where the
    source point falls inside any valid attention circle — the analytic
    equivalent of rasterise-then-warp (src/env.py:224-231, 292-293).
    """
    c = circles[None, None, :, :]  # broadcast over pixel grid
    d2 = (coords[..., None, 0] - c[..., 0]) ** 2 + (coords[..., None, 1] - c[..., 1]) ** 2
    idx = jnp.arange(circles.shape[0])
    valid = (idx < n_circles) & (circles[:, 2] > 0)
    hit = (d2 <= c[..., 2] ** 2) & valid[None, None, :]
    return jnp.any(hit, axis=-1).astype(jnp.float32)


def render_view(
    map_img: jnp.ndarray,
    src_quad_xy: jnp.ndarray,
    circles: jnp.ndarray,
    n_circles,
    out_hw: int = VIEW_HW,
    round_corners: bool = True,
):
    """Render one item's 224x224 view + GT saliency from its map image.

    map_img: (H, W, 3) uint8/float; src_quad_xy: (4, 2) (x, y) img coords of
    the view corners; circles: (C, 3) attention circles.
    ``round_corners`` replicates the reference's int-rounding of corner
    coords before the homography (src/env.py:189-196, 283-284).
    """
    if round_corners:
        src_quad_xy = jnp.round(src_quad_xy)
    coords = view_to_map_coords(src_quad_xy, out_hw)
    view = bilinear_gather(map_img, coords)
    sal = saliency_at(coords, circles, n_circles)
    return view, sal


@functools.partial(
    jax.jit, static_argnames=("out_hw", "round_corners", "subsample")
)
def render_batch(
    map_bank: jnp.ndarray,
    map_idx: jnp.ndarray,
    src_quads_xy: jnp.ndarray,
    circles: jnp.ndarray,
    n_circles: jnp.ndarray,
    out_hw: int = VIEW_HW,
    round_corners: bool = True,
    subsample: int = 1,
):
    """Batched renderer over an HBM-resident map bank.

    map_bank: (N, H, W, 3); map_idx: (B,); src_quads_xy: (B, 4, 2);
    circles: (B, C, 3); n_circles: (B,).
    Returns (views (B, out, out, 3) float32, saliency (B, out, out)).

    Taps index the bank directly (one fused XLA gather per tap) so no
    per-item map copy is ever materialised in HBM.

    ``subsample`` > 1 is the FAST mode: the warp gather (the measured
    bottleneck, PERF.md) runs on an out_hw/subsample grid and the result is
    bilinearly upscaled — ~subsample² fewer gathered elements at the cost of
    sub-pixel blur. Not cv2-bit-exact; keep 1 for metric parity.
    """
    if round_corners:
        src_quads_xy = jnp.round(src_quads_xy)
    if subsample > 1:
        grid_hw = out_hw // subsample
        # sample where the upscale reconstructs: resize('bilinear') places
        # coarse pixel g at fine coordinate (g+0.5)*s - 0.5 (half-pixel
        # centers), normalised by the fine grid's (out-1)
        positions = (
            (jnp.arange(grid_hw, dtype=jnp.float32) + 0.5) * subsample - 0.5
        ) / (out_hw - 1.0)
    else:
        grid_hw = out_hw
        positions = None
    coords = jax.vmap(
        lambda q: view_to_map_coords(q, grid_hw, positions)
    )(src_quads_xy)
    H, W = map_bank.shape[1], map_bank.shape[2]
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    bidx = map_idx[:, None, None]

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        val = map_bank[bidx, yi_c, xi_c].astype(jnp.float32)
        return jnp.where(inb[..., None], val, 0.0)

    views = (
        tap(x0i, y0i) * (1 - wx) * (1 - wy)
        + tap(x0i + 1, y0i) * wx * (1 - wy)
        + tap(x0i, y0i + 1) * (1 - wx) * wy
        + tap(x0i + 1, y0i + 1) * wx * wy
    )
    sal = jax.vmap(saliency_at)(coords, circles, n_circles)
    if subsample > 1:
        B = views.shape[0]
        views = jax.image.resize(views, (B, out_hw, out_hw, 3), "bilinear")
        sal = jax.image.resize(sal, (B, out_hw, out_hw), "bilinear")
    return views, sal
