"""Two-pass MXU perspective warp — the full-resolution fast render mode.

The exact render path is a 4-tap bilinear gather: 224²·B random single-pixel
accesses per step, measured gather-bound at ≈1 G elements/s (PERF.md "The
warp-gather bottleneck"). This module replaces the gather with two 1-D
resampling passes whose work is *dense contractions* (MXU food) instead of
random access — the classic Catmull–Smith decomposition, here kept EXACT for
perspective:

For a homography H mapping the unit output square onto the source quad, the
iso-rows of the output (fixed v) map to *straight lines* in the source:
``sy = a(v)·sx + b(v)`` (the denominators of sx and sy share the same linear
form in u, so eliminating u leaves an affine relation — ``_iso_row_coeffs``).
Hence:

* **pass A** (vertical): for every source column x, resample it at
  ``Y(v, x) = a(v)·x + b(v)`` → intermediate I[x, v];
* **pass B** (horizontal): for every output row v, resample I[:, v] at
  ``X(u, v)`` (the x-component of the inverse map) → out[v, u].

Each pass is an einsum against tent (linear-interpolation) weights generated
on the fly from per-line positions, chunked so peak memory stays bounded.
Border semantics match cv2's ``borderValue=0`` (src/env.py:290-292): a tent
tap outside the crop contributes zero — identical to the constant-0 border.

Rotation degeneracy (the classic bottleneck problem): when the output-u axis
maps closer to source-y (headings near 90°/270°), iso-row lines become
near-vertical and a(v) blows up. Detected per item from the quad's first
edge and handled by swapping the source axes (transposed crop), which bounds
|a(v)| ≤ ~1.

Accuracy: NOT bit-identical to single-pass bilinear — the two-pass kernel
blends along the (slightly rotated) iso-row axis, a sub-pixel difference
proportional to local image curvature. Quantified vs cv2 in
tests/test_warp2pass.py; use the exact path for strict cv2 parity.

The source window is a fixed-size crop (``crop_hw``, static) dynamic-sliced
around the quad: views larger than the crop render black beyond it — size
``crop_hw`` to the dataset's max view edge in pixels (the 400 m altitude cap
/ lat_ratio, src/xview_et/agent.py:285-384).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from avdn_tpu.sim.render import (
    square_to_quad_homography,
    saliency_at,
    view_to_map_coords,
    VIEW_HW,
)


def _iso_row_coeffs(H: jnp.ndarray, out_hw: int):
    """Per-output-row source-line coefficients (a(v), b(v)): sy = a·sx + b.

    For fixed unit-square y: sx = (q·u + p)/(s·u + r), sy = (q'·u + p')/(s·u + r)
    share the denominator; eliminating u:
    sy = [(p'·s − q'·r)·sx + (q'·p − p'·q)] / (s·p − q·r).
    """
    yu = jnp.arange(out_hw, dtype=jnp.float32) / (out_hw - 1.0)
    p = H[0, 1] * yu + H[0, 2]
    q = H[0, 0]
    r = H[2, 1] * yu + 1.0
    s = H[2, 0]
    pp = H[1, 1] * yu + H[1, 2]
    qp = H[1, 0]
    den = s * p - q * r
    den = jnp.where(jnp.abs(den) > 1e-12, den,
                    jnp.where(den >= 0, 1e-12, -1e-12))
    a = (pp * s - qp * r) / den
    b = (qp * p - pp * q) / den
    return a, b


def _tent(positions: jnp.ndarray, length: int, dtype) -> jnp.ndarray:
    """Linear-interp weights W[..., l, m] = max(0, 1 − |l − pos[..., m]|).

    A position fully outside [−1, length] gives an all-zero column — cv2's
    constant-0 border falls out for free.
    """
    l_idx = jnp.arange(length, dtype=jnp.float32)
    w = 1.0 - jnp.abs(l_idx[..., :, None] - positions[..., None, :])
    return jnp.maximum(w, 0.0).astype(dtype)


def _warp_item(map_bank, idx, quad_xy, crop_hw: int, out_hw: int,
               chunk_a: int, chunk_b: int, compute_dtype):
    """Two-pass warp of one item from the bank. Returns (out, out, 3) f32."""
    Hm, Wm = map_bank.shape[1], map_bank.shape[2]

    # --- rotation-degeneracy swap: keep the u axis closer to source-x ---
    edge = quad_xy[1] - quad_xy[0]
    swap = jnp.abs(edge[0]) < jnp.abs(edge[1])
    quad_sw = jnp.where(swap, quad_xy[:, ::-1], quad_xy)

    H3 = square_to_quad_homography(quad_sw.astype(jnp.float32))

    # --- fixed-size crop around the quad (swapped source = transposed) ---
    src_h = jnp.where(swap, Wm, Hm)
    src_w = jnp.where(swap, Hm, Wm)
    mins = jnp.min(quad_sw, axis=0)
    y0 = jnp.clip(jnp.floor(mins[1]).astype(jnp.int32) - 1, 0,
                  jnp.maximum(src_h - crop_hw, 0))
    x0 = jnp.clip(jnp.floor(mins[0]).astype(jnp.int32) - 1, 0,
                  jnp.maximum(src_w - crop_hw, 0))
    # slice the window for both orientations directly from the bank (only
    # crop-sized slabs are ever materialised), then select branch-free
    crop_n = jax.lax.dynamic_slice(
        map_bank, (idx, y0, x0, 0), (1, crop_hw, crop_hw, 3)
    )[0]
    crop_t = jnp.swapaxes(
        jax.lax.dynamic_slice(
            map_bank, (idx, x0, y0, 0), (1, crop_hw, crop_hw, 3)
        )[0], 0, 1,
    )
    crop = jnp.where(swap, crop_t, crop_n).astype(compute_dtype)

    # --- per-line sample positions (crop-relative) ---
    a, b = _iso_row_coeffs(H3, out_hw)                    # (out,)
    x_abs = x0.astype(jnp.float32) + jnp.arange(crop_hw, dtype=jnp.float32)
    posA = a[None, :] * x_abs[:, None] + b[None, :] - y0.astype(jnp.float32)
    coords = view_to_map_coords(quad_sw.astype(jnp.float32), out_hw)
    posB = coords[..., 0] - x0.astype(jnp.float32)        # (v, u)

    # --- pass A: vertical resample of every crop column at Y(v, x) ---
    # I[x, v, c] = Σ_h WA[x, h, v] · crop[h, x, c]
    assert crop_hw % chunk_a == 0, (crop_hw, chunk_a)

    def passA(i):
        cols = jax.lax.dynamic_slice(crop, (0, i * chunk_a, 0),
                                     (crop_hw, chunk_a, 3))
        pa = jax.lax.dynamic_slice(posA, (i * chunk_a, 0), (chunk_a, out_hw))
        WA = _tent(pa, crop_hw, compute_dtype)            # (ch, crop, out)
        return jnp.einsum("xhv,hxc->xvc", WA, cols,
                          preferred_element_type=jnp.float32)

    I = jax.lax.map(passA, jnp.arange(crop_hw // chunk_a))
    I = I.reshape(crop_hw, out_hw, 3).astype(compute_dtype)

    # --- pass B: horizontal resample of I rows at X(u, v) ---
    # out[v, u, c] = Σ_x WB[v, x, u] · I[x, v, c]
    assert out_hw % chunk_b == 0, (out_hw, chunk_b)

    def passB(i):
        pb = jax.lax.dynamic_slice(posB, (i * chunk_b, 0), (chunk_b, out_hw))
        Iv = jax.lax.dynamic_slice(I, (0, i * chunk_b, 0),
                                   (crop_hw, chunk_b, 3))
        WB = _tent(pb, crop_hw, compute_dtype)            # (ch, crop, out)
        return jnp.einsum("vxu,xvc->vuc", WB, Iv,
                          preferred_element_type=jnp.float32)

    out = jax.lax.map(passB, jnp.arange(out_hw // chunk_b))
    return out.reshape(out_hw, out_hw, 3).astype(jnp.float32)


def _largest_divisor(n: int, cap: int) -> int:
    return max(d for d in range(1, cap + 1) if n % d == 0)


def _warp_item_banded(map_bank, idx, quad_xy, crop_hw: int, out_hw: int,
                      chunk_a: int, compute_dtype):
    """Banded two-pass warp of one item — same math as ``_warp_item``, but
    each pass runs on (output-tile × source-band) blocks instead of dense
    (output-chunk × full-crop) slabs.

    Key fact: within an output tile the sample positions span a narrow,
    contiguous source interval — pass A's iso-row slope is bounded by the
    axis swap (|a| ≤ ~1 ⇒ span ≤ chunk_a over an x-chunk) and the per-row
    sweep is bounded by the crop covering the view (≤ crop/out per output
    row). So a *statically sized* band around the tile's position minimum
    contains every nonzero tent tap; weights outside it are exactly zero.
    The band start is data-dependent but the slice is ONE contiguous slab
    per tile (an efficient dynamic-slice DMA) — unlike the rejected
    per-line banding whose vmapped slices lowered to scalar gathers
    (PERF.md "negative result"). Cuts both the tent-generation VPU work
    and the contraction depth K by crop/band (~2.5-3.5× at crop 512) —
    but measured 1.6-1.8× SLOWER than the dense slabs on v5e: the
    ``lax.map`` tile loop serialises what dense runs as a few large fused
    einsums, and at N=3 RHS channels the contraction is VPU/HBM-bound, so
    the saved FLOPs buy nothing (PERF.md "Second negative result"). Kept
    for reproduction via ``render_batch_twopass(band=True)`` and
    tools/bench_render.py; not exposed as a config flag.
    """
    Hm, Wm = map_bank.shape[1], map_bank.shape[2]
    edge = quad_xy[1] - quad_xy[0]
    swap = jnp.abs(edge[0]) < jnp.abs(edge[1])
    quad_sw = jnp.where(swap, quad_xy[:, ::-1], quad_xy)
    H3 = square_to_quad_homography(quad_sw.astype(jnp.float32))

    src_h = jnp.where(swap, Wm, Hm)
    src_w = jnp.where(swap, Hm, Wm)
    mins = jnp.min(quad_sw, axis=0)
    y0 = jnp.clip(jnp.floor(mins[1]).astype(jnp.int32) - 1, 0,
                  jnp.maximum(src_h - crop_hw, 0))
    x0 = jnp.clip(jnp.floor(mins[0]).astype(jnp.int32) - 1, 0,
                  jnp.maximum(src_w - crop_hw, 0))
    crop_n = jax.lax.dynamic_slice(
        map_bank, (idx, y0, x0, 0), (1, crop_hw, crop_hw, 3)
    )[0]
    crop_t = jnp.swapaxes(
        jax.lax.dynamic_slice(
            map_bank, (idx, x0, y0, 0), (1, crop_hw, crop_hw, 3)
        )[0], 0, 1,
    )
    crop = jnp.where(swap, crop_t, crop_n).astype(compute_dtype)

    a, b = _iso_row_coeffs(H3, out_hw)
    x_abs = x0.astype(jnp.float32) + jnp.arange(crop_hw, dtype=jnp.float32)
    posA = a[None, :] * x_abs[:, None] + b[None, :] - y0.astype(jnp.float32)
    coords = view_to_map_coords(quad_sw.astype(jnp.float32), out_hw)
    posB = coords[..., 0] - x0.astype(jnp.float32)      # (v, u)

    # --- static tile/band geometry ---
    xc = chunk_a                                   # pass-A x-tile
    vc = _largest_divisor(out_hw, 32)              # output-row tile (224→28)
    uc = vc                                        # pass-B column tile
    # position span bounds (see docstring): |a|·xc over x, crop/out per
    # output row/col, + tent support and rounding margin
    per_out = -(-crop_hw // out_hw) + 1
    band_a = min(crop_hw, _round_up(xc + per_out * vc + 8, 8))
    band_b = min(crop_hw, _round_up(per_out * (uc + vc) + 8, 8))
    nx, nv, nu = crop_hw // xc, out_hw // vc, out_hw // uc

    # --- pass A: banded vertical resample ---
    def passA(t):
        xi, vi = t // nv, t % nv
        pa = jax.lax.dynamic_slice(posA, (xi * xc, vi * vc), (xc, vc))
        h0 = jnp.clip(jnp.floor(jnp.min(pa)).astype(jnp.int32) - 1, 0,
                      crop_hw - band_a)
        cols = jax.lax.dynamic_slice(crop, (h0, xi * xc, 0),
                                     (band_a, xc, 3))
        WA = _tent(pa - h0.astype(jnp.float32), band_a, compute_dtype)
        return jnp.einsum("xhv,hxc->xvc", WA, cols,
                          preferred_element_type=jnp.float32)

    I = jax.lax.map(passA, jnp.arange(nx * nv))     # (nx·nv, xc, vc, 3)
    I = (I.reshape(nx, nv, xc, vc, 3).transpose(0, 2, 1, 3, 4)
          .reshape(crop_hw, out_hw, 3).astype(compute_dtype))

    # --- pass B: banded horizontal resample ---
    def passB(t):
        vi, ui = t // nu, t % nu
        pb = jax.lax.dynamic_slice(posB, (vi * vc, ui * uc), (vc, uc))
        x0b = jnp.clip(jnp.floor(jnp.min(pb)).astype(jnp.int32) - 1, 0,
                       crop_hw - band_b)
        Iv = jax.lax.dynamic_slice(I, (x0b, vi * vc, 0), (band_b, vc, 3))
        WB = _tent(pb - x0b.astype(jnp.float32), band_b, compute_dtype)
        return jnp.einsum("vxu,xvc->vuc", WB, Iv,
                          preferred_element_type=jnp.float32)

    out = jax.lax.map(passB, jnp.arange(nv * nu))   # (nv·nu, vc, uc, 3)
    out = (out.reshape(nv, nu, vc, uc, 3).transpose(0, 2, 1, 3, 4)
              .reshape(out_hw, out_hw, 3).astype(jnp.float32))
    return out


def _round_up(n: int, q: int) -> int:
    return -(-n // q) * q


_MAX_VIEW_EDGE_M = 400.0  # altitude cap (reference agent.py:285-384 zoom clamp)
_DEG_TO_M = 11.13e4       # reference env.py metre conversion


def auto_render_crop(min_lat_ratio: float) -> int:
    """Crop window (px) guaranteed to contain ANY view the dynamics can
    produce on a map with ``lat_ratio >= min_lat_ratio``: the largest view
    edge is 400 m (the altitude cap); its rotated bounding box spans
    edge·√2. Rounded up to a multiple of 64 (TPU lane tiling) with a small
    bilinear-tap border margin. One formula shared by the training driver
    (annotation-derived) and the benchmarks (synthetic-world lat_ratio)."""
    import math

    edge_px = _MAX_VIEW_EDGE_M / (min_lat_ratio * _DEG_TO_M)
    need = edge_px * math.sqrt(2.0) + 4
    return max(256, _round_up(int(math.ceil(need)), 64))


@functools.partial(
    jax.jit,
    static_argnames=("out_hw", "round_corners", "crop_hw", "chunk", "bf16",
                     "band"),
)
def render_batch_twopass(
    map_bank: jnp.ndarray,
    map_idx: jnp.ndarray,
    src_quads_xy: jnp.ndarray,
    circles: jnp.ndarray,
    n_circles: jnp.ndarray,
    out_hw: int = VIEW_HW,
    round_corners: bool = True,
    crop_hw: int = 512,
    chunk: int = 64,
    bf16: bool = True,
    band: bool = False,
):
    """Drop-in fast replacement for ``render_batch``: full-resolution
    two-pass MXU warp + the exact analytic saliency.

    ``band``: run both passes on banded tiles (``_warp_item_banded``) —
    same result (the excluded tent weights are exactly zero; only dot
    reduction order differs), ~crop/band less tent-generation and
    contraction work on paper, but measured SLOWER on v5e at every crop
    (PERF.md "Second negative result") — benchmark-only, default off.

    Returns (views (B, out, out, 3) float32, saliency (B, out, out)).
    """
    if round_corners:
        src_quads_xy = jnp.round(src_quads_xy)
    if bf16 and jax.default_backend() == "cpu":
        bf16 = False  # the CPU runtime lacks bf16×bf16→f32 dot
    compute_dtype = jnp.bfloat16 if bf16 else jnp.float32
    # chunk-align the crop (round up — never shrink the window a user asked
    # for), then clamp to the bank's map dims (all static here)
    crop_hw = -(-crop_hw // chunk) * chunk
    max_crop = min(map_bank.shape[1], map_bank.shape[2])
    if crop_hw > max_crop:
        crop_hw = max(chunk, (max_crop // chunk) * chunk)
    # pass-B chunk must divide out_hw: the largest such divisor ≤ chunk
    # (224 → 56 at the default chunk 64; any out_hw has divisor 1 worst-case)
    chunk_b = max(d for d in range(1, chunk + 1) if out_hw % d == 0)

    if band:
        views = jax.vmap(
            lambda i, q: _warp_item_banded(map_bank, i, q, crop_hw, out_hw,
                                           chunk, compute_dtype)
        )(map_idx, src_quads_xy)
    else:
        views = jax.vmap(
            lambda i, q: _warp_item(map_bank, i, q, crop_hw, out_hw, chunk,
                                    chunk_b, compute_dtype)
        )(map_idx, src_quads_xy)

    # exact analytic saliency on the true inverse-map grid (unswapped)
    def sal_item(quad, circ, nc):
        coords = view_to_map_coords(quad.astype(jnp.float32), out_hw)
        return saliency_at(coords, circ, nc)

    sal = jax.vmap(sal_item)(src_quads_xy, circles, n_circles)
    return views, sal
