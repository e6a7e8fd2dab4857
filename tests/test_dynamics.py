"""Dynamics parity tests.

The oracle is an independent float64 numpy implementation of the documented
step semantics (zoom → rotate → move with per-stage bounds aborts,
reference src/xview_et/agent.py:285-384), written loop-style to serve as an
executable spec.
"""

import numpy as np
import pytest

from avdn_tpu.sim import move_view_corners, move_view_corners_batch

DEG_TO_M = 11.13e4
PI_REF = 3.14159


def spec_get_direction(start, end):
    vec = np.asarray(end, np.float64) - np.asarray(start, np.float64)
    if vec[1] > 0:
        a = np.arctan(vec[0] / vec[1]) / 1.57 * 90
    elif vec[1] < 0:
        a = np.arctan(vec[0] / vec[1]) / 1.57 * 90 + 180
    else:
        a = 90 if np.sign(vec[0]) == 1 else 270
    return (360 - a + 90) % 360


def spec_step(corners, angle, distance, altitude, extent, input_dir=None):
    """Executable spec of the reference dynamics (agent.py:285-384)."""
    corners = np.asarray(corners, np.float64)
    lo = np.zeros(2)
    hi = np.asarray(extent, np.float64)

    def inb(p):
        return lo[0] < p[0] < hi[0] and lo[1] < p[1] < hi[1]

    cur_dir = round(spec_get_direction(corners.mean(0), (corners[0] + corners[1]) / 2)) % 360
    if input_dir is not None and abs(input_dir - cur_dir) > 2:
        angle = angle + input_dir

    # zoom
    edge = np.linalg.norm(corners[1] - corners[0]) * DEG_TO_M
    ch = 0.5 * (altitude - edge) / DEG_TO_M
    c = corners
    zoomed = np.zeros((4, 2))
    pairs = [((0, 1), (0, 3)), ((1, 0), (1, 2)), ((2, 3), (2, 1)), ((3, 2), (3, 0))]
    for k, ((i1, j1), (i2, j2)) in enumerate(pairs):
        v1 = (c[i1] - c[j1]) / np.linalg.norm(c[j1] - c[i1])
        v2 = (c[i2] - c[j2]) / np.linalg.norm(c[j2] - c[i2])
        zoomed[k] = c[k] + (v1 + v2) * ch
    if not all(inb(p) for p in zoomed):
        return corners, cur_dir
    c = zoomed

    # rotate by -angle about centroid
    th = -angle / 180 * PI_REF
    M = np.array([[np.cos(th), np.sin(th)], [-np.sin(th), np.cos(th)]])
    ctr = c.mean(0)
    rot = (c - ctr) @ M.T + ctr
    if not all(inb(p) for p in rot):
        return c, cur_dir

    # move forward
    f03 = (rot[0] - rot[3]) / np.linalg.norm(rot[3] - rot[0])
    f12 = (rot[1] - rot[2]) / np.linalg.norm(rot[2] - rot[1])
    moved = np.stack(
        [rot[0] + f03 * distance, rot[1] + f12 * distance,
         rot[2] + f12 * distance, rot[3] + f03 * distance]
    )
    new_dir = (cur_dir + angle) % 360
    if not all(inb(p) for p in moved):
        return rot, new_dir
    return moved, new_dir


def make_view(center, edge_deg, heading_deg=0.0):
    """Axis-aligned view then rotated: corners ordered front-left, front-right,
    back-right, back-left w.r.t. heading (matching GT data conventions)."""
    h = edge_deg / 2
    base = np.array([[h, -h], [h, h], [-h, h], [-h, -h]], np.float64)
    th = -heading_deg / 180 * np.pi
    M = np.array([[np.cos(th), np.sin(th)], [-np.sin(th), np.cos(th)]])
    return base @ M.T + np.asarray(center, np.float64)


class TestDynamics:
    def run_both(self, corners, angle, dist, alt, extent, indir):
        want_c, want_d = spec_step(corners, angle, dist, alt, extent, indir)
        got_c, got_d = move_view_corners(
            corners.astype(np.float32),
            np.float32(angle),
            np.float32(dist),
            np.float32(alt),
            np.asarray(extent, np.float32),
            np.float32(indir) if indir is not None else None,
        )
        np.testing.assert_allclose(np.asarray(got_c), want_c, atol=3e-7)
        assert float(got_d) % 360 == pytest.approx(want_d % 360, abs=1.001)

    def test_straight_move(self):
        v = make_view([0.01, 0.01], 100 / DEG_TO_M)
        self.run_both(v, 0.0, 2e-4, 100.0, [0.05, 0.05], None)

    def test_zoom_only(self):
        v = make_view([0.01, 0.01], 100 / DEG_TO_M)
        self.run_both(v, 0.0, 0.0, 300.0, [0.05, 0.05], None)

    def test_rotate(self):
        v = make_view([0.01, 0.01], 100 / DEG_TO_M)
        self.run_both(v, 45.0, 1e-4, 100.0, [0.05, 0.05], None)

    def test_zoom_abort_near_edge(self):
        # view near map corner: zooming to 400 m pushes corners out of bounds
        v = make_view([0.0006, 0.0006], 100 / DEG_TO_M)
        self.run_both(v, 0.0, 0.0, 400.0, [0.05, 0.05], None)

    def test_move_abort_near_edge(self):
        v = make_view([0.001, 0.001], 100 / DEG_TO_M, heading_deg=180.0)
        # moving south far exits the map; move aborts but heading commits
        self.run_both(v, 0.0, 5e-3, 100.0, [0.05, 0.05], None)

    def test_heading_drift_correction(self):
        v = make_view([0.01, 0.01], 100 / DEG_TO_M, heading_deg=90.0)
        # tracked direction differs from geometric: correction adds input_dir
        self.run_both(v, 10.0, 1e-4, 100.0, [0.05, 0.05], 30.0)

    def test_random_fuzz(self):
        rng = np.random.default_rng(7)
        for _ in range(100):
            edge = rng.uniform(40, 400) / DEG_TO_M
            center = rng.uniform(0.002, 0.048, 2)
            v = make_view(center, edge, rng.uniform(0, 360))
            angle = float(rng.integers(0, 360))
            dist = rng.uniform(0, 3) * edge
            alt = rng.uniform(40, 400)
            indir = float(rng.integers(0, 360))
            want_c, want_d = spec_step(v, angle, dist, alt, [0.05, 0.05], indir)
            got_c, got_d = move_view_corners(
                v.astype(np.float32), np.float32(angle), np.float32(dist),
                np.float32(alt), np.array([0.05, 0.05], np.float32),
                np.float32(indir),
            )
            # float32 vs float64: allow small absolute tolerance (~1 cm in GPS)
            np.testing.assert_allclose(np.asarray(got_c), want_c, atol=1e-6)

    def test_batch_matches_single(self):
        rng = np.random.default_rng(8)
        B = 8
        vs = np.stack(
            [make_view(rng.uniform(0.01, 0.04, 2), rng.uniform(40, 400) / DEG_TO_M,
                       rng.uniform(0, 360)) for _ in range(B)]
        ).astype(np.float32)
        ang = rng.integers(0, 360, B).astype(np.float32)
        dist = rng.uniform(0, 1e-3, B).astype(np.float32)
        alt = rng.uniform(40, 400, B).astype(np.float32)
        ext = np.tile(np.array([0.05, 0.05], np.float32), (B, 1))
        indir = rng.integers(0, 360, B).astype(np.float32)
        bc, bd = move_view_corners_batch(vs, ang, dist, alt, ext, indir)
        for i in range(B):
            sc, sd = move_view_corners(vs[i], ang[i], dist[i], alt[i], ext[i], indir[i])
            np.testing.assert_allclose(np.asarray(bc[i]), np.asarray(sc), atol=1e-7)
            assert float(bd[i]) == pytest.approx(float(sd), abs=1e-4)
