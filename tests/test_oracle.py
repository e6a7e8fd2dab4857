"""Teacher-oracle tests.

Hand-constructed cases with known answers plus a float64 numpy executable
spec (reference semantics: src/xview_et/agent.py:386-507) for fuzzing.
IoU in the spec comes from OpenCV (independent C++ implementation).
"""

import numpy as np
import cv2
import jax.numpy as jnp
import pytest

from avdn_tpu.sim import teacher_action, teacher_action_batch

DEG_TO_M = 11.13e4


def cv2_iou(a, b):
    # IoU is scale/translation invariant; recentre+upscale so OpenCV's
    # float32 intersection code is well-conditioned at GPS magnitudes
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    c = a.mean(0)
    a = ((a - c) * 1e4).astype(np.float32)
    b = ((b - c) * 1e4).astype(np.float32)
    inter, _ = cv2.intersectConvexConvex(
        cv2.convexHull(a).reshape(-1, 2), cv2.convexHull(b).reshape(-1, 2)
    )
    hull = cv2.convexHull(np.concatenate([a, b])).reshape(-1, 2)
    union = cv2.contourArea(hull)
    return 0.0 if union == 0 else float(inter) / union


def clip_seg(p0, p1, quad):
    """Scalar Liang-Barsky segment/convex-quad clip (float64)."""
    quad = np.asarray(quad, np.float64)
    # orient ccw
    x, y = quad[:, 0], quad[:, 1]
    if 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y) < 0:
        quad = quad[::-1]
    d = np.asarray(p1, np.float64) - np.asarray(p0, np.float64)
    t0, t1 = 0.0, 1.0
    for k in range(4):
        a, b = quad[k], quad[(k + 1) % 4]
        e = b - a
        n = np.array([-e[1], e[0]])
        num = n @ (np.asarray(p0) - a)
        den = n @ d
        if abs(den) < 1e-15:
            if num < 0:
                return None
        elif den > 0:
            t0 = max(t0, -num / den)
        else:
            t1 = min(t1, -num / den)
    if t0 > t1:
        return None
    return np.asarray(p0) + t0 * d, np.asarray(p0) + t1 * d


def spec_teacher(corners, ended, gt, teacher_forcing):
    """Executable spec of the reference oracle (agent.py:386-507)."""
    corners = np.asarray(corners, np.float64)
    gt = [np.asarray(g, np.float64) for g in gt]
    cur = corners.mean(0)
    progress = cv2_iou(corners, gt[-1])

    min_dis, closest = 1000.0, 0
    for j in range(len(gt) - 1, -1, -1):
        d = np.linalg.norm(gt[j].mean(0) - cur)
        if d + 1e-5 < min_dis:
            min_dis, closest = d, j
    altitude = (np.linalg.norm(gt[closest][0] - gt[closest][1]) * DEG_TO_M - 40) / 360

    if ended or progress > 0.5:
        return np.zeros(2), altitude, progress

    goal = gt[-1].mean(0)
    cands = []
    if teacher_forcing:
        centers = [g.mean(0) for g in gt]
        for j in range(len(centers) - 1):
            r = clip_seg(centers[j], centers[j + 1], corners)
            if r is not None:
                cands += [r[0], r[1]]
        if not cands:
            r = clip_seg(cur, goal, corners)
            if r is not None:
                cands += [r[0], r[1]]
    else:
        r = clip_seg(cur, goal, corners)
        if r is not None:
            cands += [r[0], r[1]]

    best, bd = np.zeros(2), 1.0
    for p in cands:
        d = np.linalg.norm(p - goal)
        if d < bd:
            bd, best = d, p

    b = 1e5 * (best - cur)
    ny = np.round(1e5 * ((corners[0] + corners[1]) / 2 - cur))
    nx = np.round(1e5 * ((corners[1] + corners[2]) / 2 - cur))
    det = nx[0] * ny[1] - ny[0] * nx[1]
    r0 = (b[0] * ny[1] - ny[0] * b[1]) / det
    r1 = (nx[0] * b[1] - b[0] * nx[1]) / det
    m = max(abs(r0), abs(r1), 1.0)
    return np.array([r0 / m, r1 / m]), altitude, progress


def make_view(center, edge_deg, heading_deg=0.0):
    h = edge_deg / 2
    base = np.array([[h, -h], [h, h], [-h, h], [-h, -h]], np.float64)
    th = -heading_deg / 180 * np.pi
    M = np.array([[np.cos(th), np.sin(th)], [-np.sin(th), np.cos(th)]])
    return base @ M.T + np.asarray(center, np.float64)


def pad_gt(gt_list, max_t=8):
    arr = np.zeros((max_t, 4, 2), np.float32)
    for i, g in enumerate(gt_list):
        arr[i] = g
    return arr, len(gt_list)


def run_jax(corners, ended, gt_list, teacher_forcing, max_t=8):
    gt, n = pad_gt(gt_list, max_t)
    out = teacher_action(
        jnp.asarray(corners, jnp.float32),
        jnp.asarray(ended),
        jnp.asarray(gt),
        jnp.int32(n),
        teacher_forcing,
    )
    return (
        np.asarray(out["waypoint_ratio"]),
        float(out["altitude"]),
        float(out["progress"]),
    )


EDGE = 100 / DEG_TO_M


class TestOracleHandCases:
    def test_goal_inside_view_student(self):
        v = make_view([0.01, 0.01], EDGE)
        goal = make_view([0.0101, 0.0101], EDGE)  # overlapping, goal center inside
        wp, alt, prog = run_jax(v, False, [v, goal], False)
        # goal center is inside the view: waypoint == goal center
        # ratio solves against half-axes: offset (1e-4,1e-4) over half-edge
        half = EDGE / 2
        expect = np.array([1e-4 / half, 1e-4 / half])
        expect /= max(abs(expect[0]), abs(expect[1]), 1.0)
        sw, sa, sp = spec_teacher(v, False, [v, goal], False)
        np.testing.assert_allclose(wp, sw, atol=1e-3)
        assert prog == pytest.approx(sp, abs=1e-3)

    def test_stop_when_progress_high(self):
        v = make_view([0.01, 0.01], EDGE)
        wp, alt, prog = run_jax(v, False, [v, v], True)
        assert prog > 0.9
        np.testing.assert_allclose(wp, 0.0)

    def test_stop_when_ended(self):
        v = make_view([0.01, 0.01], EDGE)
        g = make_view([0.02, 0.02], EDGE)
        wp, _, _ = run_jax(v, True, [v, g], True)
        np.testing.assert_allclose(wp, 0.0)

    def test_goal_north_clamps_front(self):
        v = make_view([0.01, 0.01], EDGE, heading_deg=0.0)
        g = make_view([0.03, 0.01], EDGE)  # due north, far away
        wp, _, _ = run_jax(v, False, [v, g], False)
        # waypoint is the front-edge crossing: ratio (0, 1) → y component 1
        np.testing.assert_allclose(wp, [0.0, 1.0], atol=2e-2)

    def test_altitude_from_closest_step(self):
        v = make_view([0.01, 0.01], EDGE)
        g1 = make_view([0.0101, 0.01], 200 / DEG_TO_M)  # closest (≈111m away)
        g2 = make_view([0.03, 0.03], 400 / DEG_TO_M)
        _, alt, _ = run_jax(v, False, [g1, g2], True)
        assert alt == pytest.approx((200 - 40) / 360, abs=1e-2)

    def test_altitude_tie_prefers_later_step(self):
        v = make_view([0.01, 0.01], EDGE)
        g_same_a = make_view([0.02, 0.02], 100 / DEG_TO_M)
        g_same_b = make_view([0.02, 0.02], 300 / DEG_TO_M)  # same center, later
        _, alt, _ = run_jax(v, False, [g_same_a, g_same_b], True)
        assert alt == pytest.approx((300 - 40) / 360, abs=1e-2)


class TestOracleFuzz:
    @pytest.mark.parametrize("teacher_forcing", [True, False])
    def test_vs_spec(self, teacher_forcing):
        rng = np.random.default_rng(11)
        for _ in range(60):
            v = make_view(rng.uniform(0.005, 0.045, 2), rng.uniform(60, 300) / DEG_TO_M,
                          rng.uniform(0, 360))
            n = int(rng.integers(2, 7))
            gt = []
            p = rng.uniform(0.005, 0.045, 2)
            for _k in range(n):
                gt.append(make_view(p, rng.uniform(60, 300) / DEG_TO_M, rng.uniform(0, 360)))
                p = p + rng.uniform(-0.004, 0.004, 2)
            sw, sa, sp = spec_teacher(v, False, gt, teacher_forcing)
            wp, alt, prog = run_jax(v, False, gt, teacher_forcing)
            assert prog == pytest.approx(sp, abs=2e-3)
            assert alt == pytest.approx(sa, abs=2e-3)
            # waypoint parity unless the candidate choice is near-degenerate
            np.testing.assert_allclose(wp, sw, atol=5e-3)

    def test_batch_matches_single(self):
        rng = np.random.default_rng(12)
        B, T = 6, 8
        corners, gts, lens = [], [], []
        for _ in range(B):
            corners.append(make_view(rng.uniform(0.01, 0.04, 2), EDGE, rng.uniform(0, 360)))
            n = int(rng.integers(2, 7))
            gt = [make_view(rng.uniform(0.01, 0.04, 2), rng.uniform(60, 300) / DEG_TO_M)
                  for _ in range(n)]
            g, l = pad_gt(gt, T)
            gts.append(g)
            lens.append(l)
        corners = np.stack(corners).astype(np.float32)
        gts = np.stack(gts)
        lens = np.array(lens, np.int32)
        ended = np.zeros(B, bool)
        out = teacher_action_batch(
            jnp.asarray(corners), jnp.asarray(ended), jnp.asarray(gts),
            jnp.asarray(lens), True
        )
        for i in range(B):
            single = teacher_action(
                jnp.asarray(corners[i]), jnp.asarray(ended[i]),
                jnp.asarray(gts[i]), jnp.int32(lens[i]), True
            )
            for k in out:
                np.testing.assert_allclose(
                    np.asarray(out[k][i]), np.asarray(single[k]), atol=1e-6
                )
