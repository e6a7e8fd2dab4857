"""Scan-engine validation against an independent step-by-step python driver.

The driver re-implements the episode control flow the way the reference runs
it — an eager python loop with per-step host decisions (agent.py:583-771) —
on top of the same sim components. The compiled lax.scan engine must produce
identical trajectories, stop decisions, and oracle targets.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.e2e  # compile-heavy driver flow (tiered suite, README)

from avdn_tpu.data.synthetic import synthetic_world
from avdn_tpu.rollout import RolloutConfig, rollout, RGB_MEAN, RGB_STD
from avdn_tpu.rollout.engine import _corners_to_img
from avdn_tpu.sim.render import render_batch
from avdn_tpu.sim.oracle import teacher_action_batch
from avdn_tpu.sim.dynamics import move_view_corners_batch

_PI = 3.14159
T = 4


def stub_model(x, t):
    """Deterministic action from the rendered views: couples the render →
    decide → move chain so any engine divergence shows up."""
    m = jnp.mean(x, axis=(1, 2, 3))  # (B,)
    wp = jnp.stack([jnp.sin(m * 3 + t), jnp.cos(m * 2 - t)], axis=-1) * 0.9
    alt = 0.4 + 0.2 * jnp.sin(m + t)
    prog = 0.15 * (t + 1) + 0.05 * jnp.cos(m)
    return jnp.concatenate([wp, alt[:, None], prog[:, None]], axis=-1)


def engine_model_step(state, x, dir_feat, t, ended, rng):
    action = stub_model(x, t)
    return state, action, jnp.zeros((x.shape[0], 224, 224))


def python_driver(world, teacher_forcing=False, thresh=0.5):
    b = world.batch
    bank = jnp.asarray(world.map_bank)
    B = b.start_corners.shape[0]
    corners = np.asarray(b.start_corners, np.float64)
    dirs = np.asarray(b.start_dir, np.float64)
    ended = np.zeros(B, bool)
    rec = {k: [] for k in ("alive_pre", "alive_post", "corners", "dirs",
                           "wp", "alt", "gt_wp", "gt_prog")}
    for t in range(T):
        quad = _corners_to_img(jnp.asarray(corners, jnp.float32), b.extent,
                               b.lat_ratio)
        views, _ = render_batch(bank, b.map_idx, quad, b.circles, b.n_circles)
        x = (views - RGB_MEAN) / RGB_STD
        action = np.asarray(stub_model(x, t), np.float64)
        wp = action[:, :2]
        denom = np.maximum(np.max(np.abs(wp), axis=1), 1.0)
        wp_n = wp / denom[:, None]
        alt = np.clip(action[:, 2], 0, 1)
        prog = np.clip(action[:, 3], 0, 1)

        oracle = teacher_action_batch(
            jnp.asarray(corners, jnp.float32), jnp.asarray(ended),
            b.gt_corners, b.gt_len, teacher_forcing,
        )
        gt_wp = np.asarray(oracle["waypoint_ratio"], np.float64)
        gt_alt = np.asarray(oracle["altitude"], np.float64)
        gt_prog = np.asarray(oracle["progress"], np.float64)

        rec["alive_pre"].append(~ended.copy())
        rec["wp"].append(wp_n.copy())
        rec["alt"].append(alt.copy())
        rec["gt_wp"].append(gt_wp.copy())
        rec["gt_prog"].append(gt_prog.copy())

        if teacher_forcing:
            act_wp, act_alt, prog_stop = gt_wp, gt_alt, gt_prog
        else:
            act_wp, act_alt, prog_stop = wp_n, alt, prog

        new_corners = corners.copy()
        new_dirs = dirs.copy()
        for i in range(B):
            if prog_stop[i] > thresh or t == T - 1:
                ended[i] = True
                continue
            a_dir = (np.arctan2(act_wp[i, 0], act_wp[i, 1]) / _PI + 2) / 2 % 1
            half = np.linalg.norm(corners[i, 0] - corners[i, 1]) / 2
            a_dist = np.linalg.norm(act_wp[i]) * half
            mc, md = move_view_corners_batch(
                jnp.asarray(corners[i: i + 1], jnp.float32),
                jnp.asarray([round(a_dir * 360)], jnp.float32),
                jnp.asarray([a_dist], jnp.float32),
                jnp.asarray([round(act_alt[i] * 360) + 40], jnp.float32),
                b.extent[i: i + 1],
                jnp.asarray(dirs[i: i + 1], jnp.float32),
            )
            new_corners[i] = np.asarray(mc[0])
            new_dirs[i] = float(md[0])
        corners, dirs = new_corners, new_dirs
        rec["alive_post"].append(~ended.copy())
        rec["corners"].append(corners.copy())
        rec["dirs"].append(dirs.copy())
        if ended.all():
            # reference breaks; pad remaining steps for comparison
            for _ in range(t + 1, T):
                for k in rec:
                    rec[k].append(rec[k][-1])
            break
    return {k: np.stack(v) for k, v in rec.items()}


@pytest.mark.parametrize("teacher_forcing", [False, True])
def test_engine_matches_python_driver(teacher_forcing):
    world = synthetic_world(batch_size=3, map_px=256, lang_dim=16, seed=21)
    cfg = RolloutConfig(max_action_len=T, teacher_forcing=teacher_forcing)
    out, _ = rollout(
        map_bank=jnp.asarray(world.map_bank), batch=world.batch, cfg=cfg,
        model_step=engine_model_step, init_model_state={},
        rng=jax.random.PRNGKey(0),
    )
    ref = python_driver(world, teacher_forcing)

    np.testing.assert_array_equal(np.asarray(out.alive_pre), ref["alive_pre"])
    # compare records only on steps where the python driver really ran
    # (after everyone ends the engine keeps scanning; trajectories masked)
    ran = ref["alive_pre"].any(axis=1)
    np.testing.assert_array_equal(
        np.asarray(out.alive_post)[ran], ref["alive_post"][ran]
    )
    np.testing.assert_allclose(
        np.asarray(out.actions_wp)[ran], ref["wp"][ran], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.gt_wp)[ran], ref["gt_wp"][ran], atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.gt_progress)[ran], ref["gt_prog"][ran], atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.corners)[ran], ref["corners"][ran], atol=2e-7
    )
    np.testing.assert_allclose(
        (np.asarray(out.directions)[ran]) % 360, ref["dirs"][ran] % 360,
        atol=1e-3
    )
