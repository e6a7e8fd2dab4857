"""Fast-mode renderer (render_subsample > 1): close to the exact warp on
smooth imagery, identical plumbing through the rollout."""

import numpy as np
import cv2
import jax
import jax.numpy as jnp

from avdn_tpu.sim.render import render_batch
from avdn_tpu.data.synthetic import synthetic_world
from avdn_tpu.rollout import RolloutConfig, rollout


def test_subsample_close_on_smooth_map():
    rng = np.random.default_rng(0)
    # smooth map: heavy blur of random noise
    raw = rng.integers(0, 256, (512, 512, 3), np.uint8)
    smooth = cv2.GaussianBlur(raw, (31, 31), 8)
    bank = jnp.asarray(smooth[None])
    quad = jnp.asarray(
        np.array([[[150, 150], [300, 170], [280, 320], [130, 300]]], np.float32)
    )
    circ = jnp.zeros((1, 1, 3), jnp.float32)
    nc = jnp.zeros((1,), jnp.int32)
    midx = jnp.zeros((1,), jnp.int32)
    exact, _ = render_batch(bank, midx, quad, circ, nc)
    fast, _ = render_batch(bank, midx, quad, circ, nc, subsample=2)
    assert fast.shape == exact.shape
    diff = np.abs(np.asarray(fast) - np.asarray(exact))
    # with half-pixel-aligned sampling the fast mode is sub-unit accurate
    assert diff.mean() < 0.5, diff.mean()  # intensity units of 255
    assert np.percentile(diff, 99) < 2.0


def test_rollout_with_fast_render():
    world = synthetic_world(batch_size=2, map_px=256, lang_dim=16, seed=13)

    def stub(state, x, dir_feat, t, ended, rng):
        B = x.shape[0]
        return state, jnp.tile(jnp.asarray([[0.5, 0.5, 0.5, 0.1]]), (B, 1)), \
            jnp.zeros((B, 224, 224))

    for sub in (1, 2, 4):
        cfg = RolloutConfig(max_action_len=2, teacher_forcing=False,
                            render_subsample=sub)
        out, _ = rollout(
            map_bank=jnp.asarray(world.map_bank), batch=world.batch, cfg=cfg,
            model_step=stub, init_model_state={}, rng=jax.random.PRNGKey(0),
        )
        assert np.isfinite(float(out.loss))
