"""Two-pass MXU warp accuracy tests — error quantified vs cv2 and the exact
single-pass bilinear path (the way test_fast_render.py does for subsample
mode). The two-pass decomposition is sub-pixel-accurate but NOT bit-identical
to single-pass bilinear (see sim/warp2pass.py docstring)."""

import numpy as np
import cv2
import jax.numpy as jnp
import pytest

from avdn_tpu.sim.render import dst_square_corners, render_batch
from avdn_tpu.sim.warp2pass import render_batch_twopass


def rand_quad_in(rng, W, H, margin=20, rmax=100):
    cx = rng.uniform(margin + 40, W - margin - 40)
    cy = rng.uniform(margin + 40, H - margin - 40)
    r = rng.uniform(15, min(rmax, cx - margin, cy - margin,
                            W - margin - cx, H - margin - cy))
    th = rng.uniform(0, 2 * np.pi)
    ang = th + np.array([0, 0.5, 1.0, 1.5]) * np.pi + rng.uniform(-0.1, 0.1, 4)
    pts = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=-1)
    return np.round(pts).astype(np.float32)


def smooth_image(rng, H, W):
    """Natural-ish smooth imagery (the regime the error bound targets)."""
    img = rng.integers(0, 256, (H // 8, W // 8, 3), np.uint8)
    return cv2.resize(img, (W, H), interpolation=cv2.INTER_CUBIC)


class TestTwoPassVsCV2:
    def test_all_headings_smooth_imagery(self):
        """Error vs cv2.warpPerspective stays sub-1/255 mean across the full
        heading circle — including the 90°/270° degeneracy (axis swap)."""
        rng = np.random.default_rng(0)
        H, W = 512, 512
        img = smooth_image(rng, H, W)
        bank = img[None]
        dst = np.asarray(dst_square_corners(224, 224), np.float32)
        worst_mean, worst_p99 = 0.0, 0.0
        for k in range(12):
            th = k * np.pi / 6  # every 30°, hits 90/270 exactly
            cx, cy, r = 256.0, 256.0, 80.0
            ang = th + np.array([0, 0.5, 1.0, 1.5]) * np.pi
            quad = np.round(np.stack(
                [cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=-1
            )).astype(np.float32)
            M = cv2.getPerspectiveTransform(quad, dst)
            want = cv2.warpPerspective(img, M, (224, 224)).astype(np.float32)
            got, _ = render_batch_twopass(
                jnp.asarray(bank), jnp.zeros((1,), jnp.int32),
                jnp.asarray(quad[None]), jnp.zeros((1, 1, 3), jnp.float32),
                jnp.zeros((1,), jnp.int32), crop_hw=256,
            )
            diff = np.abs(np.asarray(got[0]) - want)
            worst_mean = max(worst_mean, float(diff.mean()))
            worst_p99 = max(worst_p99, float(np.percentile(diff, 99)))
        assert worst_mean < 1.0, worst_mean
        assert worst_p99 < 6.0, worst_p99

    def test_random_quads_vs_exact_path(self):
        """Against our exact path (cv2-parity-tested): random quads, random
        textures — the harder high-frequency regime."""
        rng = np.random.default_rng(1)
        N, H, W, B = 2, 512, 512, 8
        bank = rng.integers(0, 256, (N, H, W, 3), np.uint8)
        quads = np.stack([rand_quad_in(rng, W, H) for _ in range(B)])
        map_idx = rng.integers(0, N, B).astype(np.int32)
        circles = rng.uniform(20, 400, (B, 4, 3)).astype(np.float32)
        n_circ = rng.integers(0, 4, B).astype(np.int32)

        exact_v, exact_s = render_batch(
            jnp.asarray(bank), jnp.asarray(map_idx), jnp.asarray(quads),
            jnp.asarray(circles), jnp.asarray(n_circ),
        )
        fast_v, fast_s = render_batch_twopass(
            jnp.asarray(bank), jnp.asarray(map_idx), jnp.asarray(quads),
            jnp.asarray(circles), jnp.asarray(n_circ), crop_hw=256,
        )
        diff = np.abs(np.asarray(fast_v) - np.asarray(exact_v))
        # high-frequency random noise is the worst case for any resampling
        # difference; bound the mean and document it
        assert diff.mean() < 8.0, diff.mean()
        # saliency path is shared and exact
        np.testing.assert_array_equal(np.asarray(fast_s), np.asarray(exact_s))

    def test_smooth_random_quads_tight(self):
        rng = np.random.default_rng(2)
        H, W, B = 512, 512, 8
        img = smooth_image(rng, H, W)
        bank = img[None]
        quads = np.stack([rand_quad_in(rng, W, H) for _ in range(B)])
        map_idx = np.zeros(B, np.int32)
        z3 = jnp.zeros((B, 1, 3), jnp.float32)
        zi = jnp.zeros((B,), jnp.int32)
        exact_v, _ = render_batch(
            jnp.asarray(bank), jnp.asarray(map_idx), jnp.asarray(quads), z3, zi
        )
        fast_v, _ = render_batch_twopass(
            jnp.asarray(bank), jnp.asarray(map_idx), jnp.asarray(quads), z3,
            zi, crop_hw=256,
        )
        diff = np.abs(np.asarray(fast_v) - np.asarray(exact_v))
        assert diff.mean() < 1.0, diff.mean()
        assert np.percentile(diff, 99) < 6.0, np.percentile(diff, 99)

    def test_fp32_tighter_than_bf16(self):
        rng = np.random.default_rng(3)
        H, W = 512, 512
        img = smooth_image(rng, H, W)
        bank = img[None]
        quad = rand_quad_in(rng, W, H)[None]
        zi = np.zeros((1,), np.int32)
        z3 = jnp.zeros((1, 1, 3), jnp.float32)
        exact_v, _ = render_batch(
            jnp.asarray(bank), jnp.asarray(zi), jnp.asarray(quad), z3,
            jnp.asarray(zi),
        )
        f32_v, _ = render_batch_twopass(
            jnp.asarray(bank), jnp.asarray(zi), jnp.asarray(quad), z3,
            jnp.asarray(zi), crop_hw=256, bf16=False,
        )
        bf16_v, _ = render_batch_twopass(
            jnp.asarray(bank), jnp.asarray(zi), jnp.asarray(quad), z3,
            jnp.asarray(zi), crop_hw=256, bf16=True,
        )
        e32 = np.abs(np.asarray(f32_v) - np.asarray(exact_v)).mean()
        e16 = np.abs(np.asarray(bf16_v) - np.asarray(exact_v)).mean()
        assert e32 <= e16 + 1e-3, (e32, e16)
        assert e32 < 0.75, e32

    def test_rollout_with_twopass_render(self):
        """The engine's render_twopass mode runs a full episode and its
        trajectory matches the exact mode step-for-step (geometry is driven
        by the oracle, not pixels, under a stub model)."""
        import jax
        from avdn_tpu.data.synthetic import synthetic_world
        from avdn_tpu.rollout import RolloutConfig, rollout

        world = synthetic_world(batch_size=2, map_px=256, lang_dim=16, seed=7)

        def stub(state, x, dir_feat, t, ended, rng):
            B = x.shape[0]
            return state, jnp.tile(jnp.asarray([[0.5, 0.5, 0.5, 0.1]]),
                                   (B, 1)), jnp.zeros((B, 224, 224))

        outs = {}
        for twopass in (False, True):
            cfg = RolloutConfig(max_action_len=2, teacher_forcing=False,
                                render_twopass=twopass, render_crop=256)
            out, _ = rollout(
                map_bank=jnp.asarray(world.map_bank), batch=world.batch,
                cfg=cfg, model_step=stub, init_model_state={},
                rng=jax.random.PRNGKey(0),
            )
            assert np.isfinite(float(out.loss))
            outs[twopass] = out
        np.testing.assert_allclose(np.asarray(outs[True].corners),
                                   np.asarray(outs[False].corners),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(outs[True].gt_progress),
                                      np.asarray(outs[False].gt_progress))

    def test_banded_equals_dense(self):
        """``band=True`` runs both passes on (tile × source-band) blocks;
        the excluded tent weights are exactly zero, so fp32 results must
        match the dense formulation bit-for-bit (modulo dot-reduction
        order) across random perspective quads, the full heading circle
        (axis-swap degeneracy), and off-map borders."""
        rng = np.random.default_rng(11)
        H, W, B = 512, 512, 8
        bank = rng.integers(0, 256, (2, H, W, 3), np.uint8)
        quads = np.stack([rand_quad_in(rng, W, H, rmax=140)
                          for _ in range(B)])
        mi = rng.integers(0, 2, B).astype(np.int32)
        z3 = jnp.zeros((B, 1, 3), jnp.float32)
        zi = np.zeros((B,), np.int32)
        for crop in (256, 512):
            dense, sd = render_batch_twopass(
                jnp.asarray(bank), jnp.asarray(mi), jnp.asarray(quads), z3,
                jnp.asarray(zi), crop_hw=crop, bf16=False)
            bandv, sb = render_batch_twopass(
                jnp.asarray(bank), jnp.asarray(mi), jnp.asarray(quads), z3,
                jnp.asarray(zi), crop_hw=crop, bf16=False, band=True)
            np.testing.assert_allclose(np.asarray(bandv), np.asarray(dense),
                                       atol=1e-3)
            np.testing.assert_array_equal(np.asarray(sb), np.asarray(sd))
        # heading circle incl. the 90°/270° swap
        z1 = jnp.zeros((1, 1, 3), jnp.float32)
        zi1 = np.zeros((1,), np.int32)
        for k in range(12):
            th = k * np.pi / 6
            ang = th + np.array([0, 0.5, 1.0, 1.5]) * np.pi
            quad = np.round(np.stack(
                [256.0 + 80 * np.cos(ang), 256.0 + 80 * np.sin(ang)], -1
            )).astype(np.float32)[None]
            dense, _ = render_batch_twopass(
                jnp.asarray(bank[:1]), jnp.asarray(zi1), jnp.asarray(quad),
                z1, jnp.asarray(zi1), crop_hw=256, bf16=False)
            bandv, _ = render_batch_twopass(
                jnp.asarray(bank[:1]), jnp.asarray(zi1), jnp.asarray(quad),
                z1, jnp.asarray(zi1), crop_hw=256, bf16=False, band=True)
            np.testing.assert_allclose(np.asarray(bandv), np.asarray(dense),
                                       atol=1e-3, err_msg=f"heading {k*30}")

    def test_border_zero_semantics(self):
        """Quad partially off the map: outside pixels must be exactly 0 in
        both paths (cv2 borderValue=0)."""
        rng = np.random.default_rng(4)
        H, W = 256, 256
        img = np.full((H, W, 3), 200, np.uint8)
        bank = img[None]
        # square hanging off the left edge
        quad = np.array([[-60, 60], [90, 60], [90, 210], [-60, 210]],
                        np.float32)
        zi = np.zeros((1,), np.int32)
        z3 = jnp.zeros((1, 1, 3), jnp.float32)
        exact_v, _ = render_batch(
            jnp.asarray(bank), jnp.asarray(zi), jnp.asarray(quad[None]), z3,
            jnp.asarray(zi),
        )
        fast_v, _ = render_batch_twopass(
            jnp.asarray(bank), jnp.asarray(zi), jnp.asarray(quad[None]), z3,
            jnp.asarray(zi), crop_hw=256,
        )
        ev, fv = np.asarray(exact_v[0]), np.asarray(fast_v[0])
        # the left ~40% of the view is off-map in both
        assert (ev[:, :80] == 0).all()
        assert (fv[:, :80] == 0).all()
        assert np.abs(fv - ev).mean() < 1.0
