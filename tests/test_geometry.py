"""Geometry parity tests.

Oracle: OpenCV (``cv2.intersectConvexConvex``, ``cv2.convexHull``,
``cv2.contourArea``) — an independent C++ geometry implementation — plus
hand-computed cases. The reference used Shapely for the same quantities
(reference src/env.py:14-46).
"""

import numpy as np
import cv2
import jax.numpy as jnp
import pytest

from avdn_tpu.geometry import (
    quad_iou,
    quad_iou_batch,
    polygon_area,
    convex_hull,
    point_in_convex_quad,
    clip_segment_to_quad,
    get_direction,
    name_the_direction,
)


def ref_iou_cv2(a, b):
    """compute_iou semantics (src/env.py:14-46) via OpenCV."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    ha = cv2.convexHull(a).reshape(-1, 2)
    hb = cv2.convexHull(b).reshape(-1, 2)
    inter_area, _ = cv2.intersectConvexConvex(ha, hb)
    union_pts = np.concatenate([a, b], axis=0)
    hull = cv2.convexHull(union_pts).reshape(-1, 2)
    union_area = cv2.contourArea(hull)
    if union_area == 0 or inter_area == 0:
        return 0.0
    return float(inter_area) / float(union_area)


def rand_quad(rng, scale=1.0, center=0.0):
    """Random convex-ish quad: rotated rectangle with jitter."""
    w, h = rng.uniform(0.3, 1.5, 2) * scale
    th = rng.uniform(0, 2 * np.pi)
    c, s = np.cos(th), np.sin(th)
    base = np.array([[-w, -h], [w, -h], [w, h], [-w, h]])
    rot = base @ np.array([[c, s], [-s, c]])
    return rot + center + rng.uniform(-0.2, 0.2, 2) * scale


class TestQuadIoU:
    def test_identical(self):
        q = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        assert abs(float(quad_iou(q, q)) - 1.0) < 1e-5

    def test_disjoint(self):
        a = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        b = a + 5.0
        assert float(quad_iou(a, b)) == 0.0

    def test_half_overlap_hand(self):
        a = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], np.float32)
        b = a + np.array([1.0, 0.0])
        # inter = 1x2 = 2; union hull = 3x2 = 6
        assert abs(float(quad_iou(a, b)) - 2.0 / 6.0) < 1e-5

    def test_random_vs_cv2(self):
        rng = np.random.default_rng(0)
        for _ in range(200):
            a = rand_quad(rng, center=rng.uniform(-1, 1, 2))
            b = rand_quad(rng, center=rng.uniform(-1, 1, 2))
            got = float(quad_iou(a, b))
            want = ref_iou_cv2(a, b)
            assert got == pytest.approx(want, abs=2e-4), (a, b)

    def test_winding_invariance(self):
        rng = np.random.default_rng(1)
        for _ in range(50):
            a = rand_quad(rng)
            b = rand_quad(rng)
            assert float(quad_iou(a, b)) == pytest.approx(
                float(quad_iou(a[::-1].copy(), b[::-1].copy())), abs=1e-5
            )

    def test_batch(self):
        rng = np.random.default_rng(2)
        A = np.stack([rand_quad(rng) for _ in range(16)])
        B = np.stack([rand_quad(rng) for _ in range(16)])
        batch = np.asarray(quad_iou_batch(A, B))
        single = np.array([float(quad_iou(a, b)) for a, b in zip(A, B)])
        np.testing.assert_allclose(batch, single, atol=1e-5)

    def test_tiny_gps_scale_quads(self):
        # task-realistic scale: view areas are ~1e-3 degrees wide
        rng = np.random.default_rng(3)
        for _ in range(50):
            a = rand_quad(rng, scale=1e-3, center=np.array([32.7, -114.6]))
            b = rand_quad(rng, scale=1e-3, center=np.array([32.7, -114.6]))
            # offset-centered before the device ever sees them (framework
            # convention): subtract the common origin
            origin = np.array([32.69, -114.61])
            got = float(quad_iou(a - origin, b - origin))
            want = ref_iou_cv2((a - origin) * 1e4, (b - origin) * 1e4)
            assert got == pytest.approx(want, abs=5e-3)


class TestHullArea:
    def test_hull_area_vs_cv2(self):
        rng = np.random.default_rng(4)
        for n in (4, 8):
            for _ in range(100):
                pts = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
                hull, cnt = convex_hull(jnp.asarray(pts))
                got = float(polygon_area(hull, cnt))
                want = cv2.contourArea(cv2.convexHull(pts).reshape(-1, 2))
                assert got == pytest.approx(want, abs=1e-4)

    def test_degenerate_collinear(self):
        pts = np.array([[0, 0], [1, 1], [2, 2], [3, 3]], np.float32)
        hull, cnt = convex_hull(jnp.asarray(pts))
        assert float(polygon_area(hull, cnt)) == pytest.approx(0.0, abs=1e-6)

    def test_all_same_point(self):
        pts = np.ones((4, 2), np.float32)
        hull, cnt = convex_hull(jnp.asarray(pts))
        assert float(polygon_area(hull, cnt)) == 0.0


class TestContainment:
    def test_inside_outside(self):
        q = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], np.float32)
        assert bool(point_in_convex_quad(jnp.array([1.0, 1.0]), q))
        assert not bool(point_in_convex_quad(jnp.array([3.0, 1.0]), q))
        # boundary is NOT contained (shapely .contains semantics)
        assert not bool(point_in_convex_quad(jnp.array([0.0, 1.0]), q))

    def test_winding(self):
        q = np.array([[0, 0], [0, 2], [2, 2], [2, 0]], np.float32)  # CW
        assert bool(point_in_convex_quad(jnp.array([1.0, 1.0]), q))


class TestSegmentClip:
    def test_crossing(self):
        q = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], np.float32)
        q0, q1, valid = clip_segment_to_quad(
            jnp.array([-1.0, 1.0]), jnp.array([3.0, 1.0]), q
        )
        assert bool(valid)
        np.testing.assert_allclose(np.asarray(q0), [0, 1], atol=1e-6)
        np.testing.assert_allclose(np.asarray(q1), [2, 1], atol=1e-6)

    def test_inside(self):
        q = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], np.float32)
        q0, q1, valid = clip_segment_to_quad(
            jnp.array([0.5, 0.5]), jnp.array([1.5, 1.5]), q
        )
        assert bool(valid)
        np.testing.assert_allclose(np.asarray(q0), [0.5, 0.5], atol=1e-6)
        np.testing.assert_allclose(np.asarray(q1), [1.5, 1.5], atol=1e-6)

    def test_miss(self):
        q = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], np.float32)
        _, _, valid = clip_segment_to_quad(
            jnp.array([5.0, 5.0]), jnp.array([6.0, 5.0]), q
        )
        assert not bool(valid)


def ref_get_direction(start, end):
    """Literal numpy port of src/env.py:48-66 used as the test oracle."""
    vec = np.array(end, dtype=np.float64) - np.array(start, dtype=np.float64)
    if vec[1] > 0:
        _angle = np.arctan(vec[0] / vec[1]) / 1.57 * 90
    elif vec[1] < 0:
        _angle = np.arctan(vec[0] / vec[1]) / 1.57 * 90 + 180
    else:
        _angle = 90 if np.sign(vec[0]) == 1 else 270
    return (360 - _angle + 90) % 360


class TestDirection:
    def test_cardinals(self):
        # north = +lat
        assert float(get_direction([0, 0], [1, 0])) == pytest.approx(
            ref_get_direction([0, 0], [1, 0]), abs=1e-4
        )
        for end in ([1, 0], [0, 1], [-1, 0], [0, -1], [1, 1], [-1, 1]):
            assert float(get_direction([0.0, 0.0], end)) == pytest.approx(
                ref_get_direction([0, 0], end), abs=1e-4
            )

    def test_random(self):
        rng = np.random.default_rng(5)
        for _ in range(100):
            s = rng.uniform(-1, 1, 2)
            e = rng.uniform(-1, 1, 2)
            assert float(get_direction(s, e)) == pytest.approx(
                ref_get_direction(s, e), abs=1e-3
            )

    def test_names(self):
        assert name_the_direction(0.0) == "north"
        assert name_the_direction(90.0) == "east"
        assert name_the_direction(181.0) == "south"
        assert name_the_direction(270.0) == "west"
        assert name_the_direction(45.0) == "northeast"
