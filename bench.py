"""Benchmark: closed-loop episode throughput of the flagship HAA-Transformer.

Measures student-forced eval rollouts (the reference's headline eval flow:
BERT ×2 → per-step render → Darknet-53 → ET → dynamics, max_action_len=5 as
in the shipped eval config, validation_args.json) end-to-end on the TPU,
everything under one jit.

Baseline: the CUDA reference runs this loop at batch_size=1 with per-step
host OpenCV rendering + Shapely geometry (SURVEY.md §3.3). Its shipped logs
publish no throughput; we use a 4 episodes/sec estimate for a modern GPU
(≈0.25 s/episode over 5 steps of host-render→H2D→forward→D2H→host-geometry),
which is generous to the reference. ``vs_baseline`` is measured/4.0.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REFERENCE_EPISODES_PER_SEC = 4.0  # documented estimate, see module docstring


def main():
    import jax
    import jax.numpy as jnp
    from avdn_tpu.data.synthetic import synthetic_world
    from avdn_tpu.train import make_eval_rollout, TrainBatch
    import __graft_entry__ as g

    BATCH = 16
    T = 5
    world, cfg, (bert, dk, et), state, batch = g._flagship(
        batch_size=BATCH, map_px=1024, max_action_len=T, seed=0
    )
    eval_fn = make_eval_rollout(cfg, bert, dk, et, teacher=False)
    bank = jnp.asarray(world.map_bank)

    # measure with the repetition loop INSIDE jit: this backend's host
    # dispatch pipelines/caches identical calls, so only in-graph repetition
    # reports true device time (PERF.md)
    n_iters = 10

    def many(state, bank, batch, rng):
        def body(i, acc):
            k = jax.random.fold_in(rng, i)
            # hoist-proof: perturb the start pose so XLA cannot lift the
            # rng-independent rollout out of the loop (PERF.md)
            noise = 1e-9 * jax.random.normal(
                k, batch.episode.start_corners.shape
            )
            ep = batch.episode.replace(
                start_corners=batch.episode.start_corners + noise
            )
            out = eval_fn(state, bank, batch.replace(episode=ep), k)
            return acc + jnp.sum(out.actions_wp)

        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    fn = jax.jit(many)
    o = fn(state, bank, batch, jax.random.PRNGKey(0))  # compile + warmup
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = fn(state, bank, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(o)
    dt = time.perf_counter() - t0

    episodes_per_sec = BATCH * n_iters / dt
    print(
        json.dumps(
            {
                "metric": "episodes_per_sec_et_eval_rollout",
                "value": round(episodes_per_sec, 2),
                "unit": "episodes/s",
                "vs_baseline": round(episodes_per_sec / REFERENCE_EPISODES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
