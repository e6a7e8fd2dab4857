"""Renderer parity tests vs OpenCV (the reference's warp engine,
src/env.py:287-293)."""

import numpy as np
import cv2
import jax.numpy as jnp
import pytest

from avdn_tpu.sim.render import (
    homography_4pt,
    dst_square_corners,
    render_view,
    render_batch,
)


def rand_quad_in(rng, W, H, margin=20):
    """Random view quad (int coords, reference rounds too) inside the map."""
    cx = rng.uniform(margin + 40, W - margin - 40)
    cy = rng.uniform(margin + 40, H - margin - 40)
    r = rng.uniform(15, min(38, cx - margin, cy - margin, W - margin - cx, H - margin - cy))
    th = rng.uniform(0, 2 * np.pi)
    ang = th + np.array([0, 0.5, 1.0, 1.5]) * np.pi + rng.uniform(-0.1, 0.1, 4)
    pts = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=-1)
    return np.round(pts).astype(np.float32)


class TestWarpVsCV2:
    def test_homography_matches_cv2(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            quad = rand_quad_in(rng, 300, 260)
            dst = np.asarray(dst_square_corners(224, 224))
            M_cv = cv2.getPerspectiveTransform(quad.astype(np.float32), dst.astype(np.float32))
            M_us = np.asarray(homography_4pt(jnp.asarray(quad), jnp.asarray(dst)))
            np.testing.assert_allclose(M_us, M_cv, rtol=1e-3, atol=1e-4)

    def test_warp_matches_cv2(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (260, 300, 3), np.uint8)
        for _ in range(10):
            quad = rand_quad_in(rng, 300, 260)
            dst = np.asarray(dst_square_corners(224, 224), np.float32)
            M = cv2.getPerspectiveTransform(quad, dst)
            want = cv2.warpPerspective(img, M, (224, 224)).astype(np.float32)
            circ = np.zeros((1, 3), np.float32)
            got, _ = render_view(jnp.asarray(img), jnp.asarray(quad), jnp.asarray(circ), 0)
            got = np.asarray(got)
            # bilinear conventions match; small float differences only
            diff = np.abs(got - want)
            assert np.percentile(diff, 99) <= 2.0, diff.max()
            assert diff.mean() < 0.5

    def test_saliency_matches_raster_warp(self):
        rng = np.random.default_rng(2)
        H, W = 260, 300
        for _ in range(5):
            quad = rand_quad_in(rng, W, H)
            n_circ = int(rng.integers(1, 5))
            circles = []
            att = np.zeros((H, W, 3), np.uint8)
            for _k in range(n_circ):
                cx, cy = int(rng.integers(30, W - 30)), int(rng.integers(30, H - 30))
                r = int(rng.integers(5, 40))
                cv2.circle(att, (cx, cy), r, (255, 255, 255), -1)
                circles.append([cx, cy, r])
            circles = np.array(circles, np.float32)
            dst = np.asarray(dst_square_corners(224, 224), np.float32)
            M = cv2.getPerspectiveTransform(quad, dst)
            warped = cv2.warpPerspective(att, M, (224, 224))
            want = cv2.cvtColor(warped, cv2.COLOR_BGR2GRAY).astype(np.float32) / 255.0
            _, got = render_view(
                jnp.asarray(np.zeros((H, W, 3), np.uint8)),
                jnp.asarray(quad),
                jnp.asarray(circles),
                n_circ,
            )
            got = np.asarray(got)
            # analytic vs raster+bilinear differ only at circle boundaries
            frac_diff = np.mean(np.abs(got - want) > 0.5)
            assert frac_diff < 0.02, frac_diff

    def test_batch_matches_single(self):
        rng = np.random.default_rng(3)
        N, H, W, B = 3, 200, 220, 5
        bank = rng.integers(0, 256, (N, H, W, 3), np.uint8)
        quads = np.stack([rand_quad_in(rng, W, H) for _ in range(B)])
        map_idx = rng.integers(0, N, B).astype(np.int32)
        circles = rng.uniform(20, 150, (B, 4, 3)).astype(np.float32)
        n_circ = rng.integers(0, 4, B).astype(np.int32)
        views, sals = render_batch(
            jnp.asarray(bank), jnp.asarray(map_idx), jnp.asarray(quads),
            jnp.asarray(circles), jnp.asarray(n_circ)
        )
        for i in range(B):
            v, s = render_view(
                jnp.asarray(bank[map_idx[i]]), jnp.asarray(quads[i]),
                jnp.asarray(circles[i]), int(n_circ[i])
            )
            np.testing.assert_allclose(np.asarray(views[i]), np.asarray(v), atol=2e-2)
            np.testing.assert_allclose(np.asarray(sals[i]), np.asarray(s), atol=1e-6)

    def test_border_zero(self):
        img = np.full((100, 100, 3), 200, np.uint8)
        quad = np.array([[-50, -50], [50, -50], [50, 50], [-50, 50]], np.float32)
        v, _ = render_view(jnp.asarray(img), jnp.asarray(quad), jnp.zeros((1, 3)), 0)
        v = np.asarray(v)
        assert v[0, 0].sum() == 0.0  # out-of-map → black border
        assert v[-1, -1].sum() > 0
