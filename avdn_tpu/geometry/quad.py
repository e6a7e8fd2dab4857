"""Batched, jit-compatible convex quad geometry.

TPU-native replacement for the Shapely/GEOS polygon operations the reference
leans on (reference: src/env.py:14-46 ``compute_iou``; src/env.py:354-364
containment tests; src/xview_et/agent.py:428-463 line-polygon intersection).
Everything here is fixed-shape, branch-free JAX so it can live inside the
compiled rollout scan instead of ping-ponging to the host.

Conventions
-----------
* A "quad" is a ``(4, 2)`` float array of vertices in any winding order
  (Shapely's ``Polygon(...).convex_hull`` normalises winding; we do the same
  via :func:`convex_hull` / :func:`orient_ccw`).
* Padded polygons are ``(N, 2)`` arrays plus an integer ``count``; slots at
  ``index >= count`` are ignored (we duplicate the first vertex into them
  before area computations so the shoelace formula is unaffected).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

# Max vertices of (convex quad) ∩ (convex quad) is 8; buffer at 8.
_CLIP_NV = 8
_EPS = 1e-12


def _cross2(o, a, b):
    """2D cross product (a - o) x (b - o)."""
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]
    ) * (b[..., 0] - o[..., 0])


def polygon_area(verts: jnp.ndarray, count=None) -> jnp.ndarray:
    """Unsigned shoelace area of a padded polygon ``verts`` (N, 2).

    If ``count`` is given, slots >= count are replaced by the first vertex
    (zero shoelace contribution).
    """
    n = verts.shape[-2]
    if count is not None:
        idx = jnp.arange(n)
        mask = (idx < count)[..., :, None]
        verts = jnp.where(mask, verts, verts[..., 0:1, :])
    x = verts[..., 0]
    y = verts[..., 1]
    x2 = jnp.roll(x, -1, axis=-1)
    y2 = jnp.roll(y, -1, axis=-1)
    return 0.5 * jnp.abs(jnp.sum(x * y2 - x2 * y, axis=-1))


def _signed_area(verts: jnp.ndarray) -> jnp.ndarray:
    x = verts[..., 0]
    y = verts[..., 1]
    x2 = jnp.roll(x, -1, axis=-1)
    y2 = jnp.roll(y, -1, axis=-1)
    return 0.5 * jnp.sum(x * y2 - x2 * y, axis=-1)


def orient_ccw(quad: jnp.ndarray) -> jnp.ndarray:
    """Flip vertex order of a (4, 2) quad so its signed area is >= 0."""
    return jnp.where(_signed_area(quad) < 0.0, quad[::-1], quad)


def convex_hull(pts: jnp.ndarray):
    """Convex hull of ``pts`` (N, 2) via Jarvis march (N is small: 4 or 8).

    Returns ``(hull, count)`` where ``hull`` is (N, 2) padded by repeating
    the first hull vertex. Winding is clockwise-or-ccw consistent; area code
    takes the absolute value so either is fine.
    """
    n = pts.shape[0]

    # Start at the lexicographically smallest point (min y, then min x).
    miny = jnp.min(pts[:, 1])
    xs = jnp.where(pts[:, 1] <= miny, pts[:, 0], jnp.inf)
    start = jnp.argmin(xs)

    def next_point(cur):
        p = pts[cur]
        rel = pts - p
        d2 = jnp.sum(rel * rel, axis=-1)
        # init with the farthest point from p
        best0 = jnp.argmax(d2)

        def body(r, best):
            cr = rel[best, 0] * rel[r, 1] - rel[best, 1] * rel[r, 0]
            take = (cr < -_EPS) | ((jnp.abs(cr) <= _EPS) & (d2[r] > d2[best]))
            return jnp.where(take, r, best)

        best = jax.lax.fori_loop(0, n, body, best0)
        # degenerate: all points coincide with p
        best = jnp.where(d2[best0] <= _EPS, start, best)
        return best

    def scan_body(carry, _):
        cur, done, count = carry
        nxt = next_point(cur)
        emit = jnp.where(done, -1, cur)
        new_count = count + jnp.where(done, 0, 1)
        new_done = done | (nxt == start)
        return (nxt, new_done, new_count), emit

    (_, _, count), emitted = jax.lax.scan(
        scan_body, (start, jnp.bool_(False), jnp.int32(0)), None, length=n
    )
    idx = jnp.arange(n)
    first = pts[start]
    hull = jnp.where(
        (emitted >= 0)[:, None], pts[jnp.clip(emitted, 0, n - 1)], first[None, :]
    )
    return hull, count


def clip_convex(subject: jnp.ndarray, subj_count, clip_poly: jnp.ndarray, clip_count):
    """Sutherland–Hodgman: clip padded ``subject`` by convex CCW ``clip_poly``.

    subject: (_CLIP_NV, 2) padded; clip_poly: (4, 2) padded (duplicate-padded,
    CCW). Returns (out_verts (_CLIP_NV, 2), out_count).
    """
    nv = subject.shape[0]
    kc = clip_poly.shape[0]

    def clip_one_edge(state, k):
        verts, count = state
        a = clip_poly[k]
        b = clip_poly[jnp.where(k + 1 < clip_count, k + 1, 0)]
        edge = b - a
        degenerate = jnp.sum(edge * edge) <= _EPS  # padded duplicate edge: no-op

        def inside(v):
            return edge[0] * (v[1] - a[1]) - edge[1] * (v[0] - a[0]) >= 0.0

        def body(i, st):
            out, cnt = st
            valid = i < count
            cur = verts[i]
            nxt = verts[jnp.where(i + 1 < count, i + 1, 0)]
            cur_in = inside(cur)
            nxt_in = inside(nxt)
            # intersection of cur->nxt with the clip line
            dcur = edge[0] * (cur[1] - a[1]) - edge[1] * (cur[0] - a[0])
            dnxt = edge[0] * (nxt[1] - a[1]) - edge[1] * (nxt[0] - a[0])
            denom = dcur - dnxt
            t = jnp.where(jnp.abs(denom) > _EPS, dcur / jnp.where(jnp.abs(denom) > _EPS, denom, 1.0), 0.0)
            inter = cur + t[..., None] * (nxt - cur)

            emit_cur = valid & cur_in
            out = jnp.where(emit_cur, out.at[cnt % nv].set(cur), out)
            cnt = cnt + jnp.where(emit_cur, 1, 0)
            emit_int = valid & (cur_in != nxt_in)
            out = jnp.where(emit_int, out.at[cnt % nv].set(inter), out)
            cnt = cnt + jnp.where(emit_int, 1, 0)
            return out, cnt

        out0 = jnp.zeros_like(verts)
        new_verts, new_count = jax.lax.fori_loop(0, nv, body, (out0, jnp.int32(0)))
        new_verts = jnp.where(degenerate | (k >= clip_count), verts, new_verts)
        new_count = jnp.where(degenerate | (k >= clip_count), count, new_count)
        return (new_verts, new_count), None

    (out, cnt), _ = jax.lax.scan(
        clip_one_edge, (subject, subj_count), jnp.arange(kc)
    )
    return out, cnt


@jax.jit
def quad_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU of two quads with the reference's hull-union convention.

    Mirrors ``compute_iou`` (reference src/env.py:14-46): the numerator is the
    intersection area of the two convex hulls; the denominator is the area of
    the convex hull of all 8 points (NOT the standard union). Returns 0 when
    the quads do not intersect or the union hull is degenerate.
    """
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    hull_a, cnt_a = convex_hull(a)
    hull_b, cnt_b = convex_hull(b)
    hull_b_ccw = _order_ccw_padded(hull_b, cnt_b)

    subject = jnp.zeros((_CLIP_NV, 2), a.dtype).at[: hull_a.shape[0]].set(hull_a)
    inter_verts, inter_cnt = clip_convex(subject, cnt_a, hull_b_ccw, cnt_b)
    inter_area = polygon_area(inter_verts, inter_cnt)
    inter_area = jnp.where(inter_cnt >= 3, inter_area, 0.0)

    union_pts = jnp.concatenate([a, b], axis=0)
    union_hull, union_cnt = convex_hull(union_pts)
    union_area = polygon_area(union_hull, union_cnt)

    iou = jnp.where(union_area > 0.0, inter_area / jnp.maximum(union_area, _EPS), 0.0)
    return jnp.clip(iou, 0.0, 1.0)


def _dup_pad(verts, count):
    idx = jnp.arange(verts.shape[0])
    return jnp.where((idx < count)[:, None], verts, verts[0:1, :])


def _order_ccw_padded(verts, count):
    """Reverse the first ``count`` vertices if the polygon winds clockwise,
    then duplicate-pad. Keeps valid vertices in slots [0, count)."""
    padded = _dup_pad(verts, count)
    cw = _signed_area(padded) < 0.0
    idx = jnp.arange(verts.shape[0])
    rev_idx = jnp.where(idx < count, count - 1 - idx, 0)
    reversed_verts = verts[jnp.clip(rev_idx, 0, verts.shape[0] - 1)]
    out = jnp.where(cw, reversed_verts, verts)
    return _dup_pad(out, count)


quad_iou_batch = jax.jit(jax.vmap(quad_iou))


def point_in_convex_quad(point: jnp.ndarray, quad: jnp.ndarray) -> jnp.ndarray:
    """Strict interior test (Shapely ``Polygon.contains`` semantics: boundary
    points are NOT contained — reference src/env.py:354-364)."""
    q = orient_ccw(quad)
    a = q
    b = jnp.roll(q, -1, axis=0)
    cr = (b[:, 0] - a[:, 0]) * (point[1] - a[:, 1]) - (b[:, 1] - a[:, 1]) * (
        point[0] - a[:, 0]
    )
    return jnp.all(cr > 0.0)


def clip_segment_to_quad(p0: jnp.ndarray, p1: jnp.ndarray, quad: jnp.ndarray):
    """Clip segment p0→p1 against a convex quad (Liang–Barsky over half-planes).

    Vectorised replacement for Shapely ``polygon.intersection(LineString)``
    (reference src/xview_et/agent.py:428-451). Returns ``(q0, q1, valid)``:
    the clipped sub-segment endpoints and whether an intersection exists.
    """
    q = orient_ccw(quad)
    a = q
    b = jnp.roll(q, -1, axis=0)
    edge = b - a  # (4,2)
    # inward normal for CCW polygon is left of the edge: (-ey, ex)
    n = jnp.stack([-edge[:, 1], edge[:, 0]], axis=-1)
    d = p1 - p0
    num = jnp.sum(n * (p0[None, :] - a), axis=-1)  # f(0) per edge
    den = jnp.sum(n * d[None, :], axis=-1)

    lo_cand = jnp.where(den > _EPS, -num / jnp.where(den > _EPS, den, 1.0), -jnp.inf)
    hi_cand = jnp.where(den < -_EPS, -num / jnp.where(den < -_EPS, den, 1.0), jnp.inf)
    infeasible = (jnp.abs(den) <= _EPS) & (num < 0.0)
    t0 = jnp.maximum(jnp.max(lo_cand), 0.0)
    t1 = jnp.minimum(jnp.min(hi_cand), 1.0)
    valid = (t0 <= t1) & ~jnp.any(infeasible)
    q0 = p0 + t0 * d
    q1 = p0 + t1 * d
    return q0, q1, valid
