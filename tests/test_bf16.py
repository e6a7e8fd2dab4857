"""bfloat16 compute mode: towers in bf16, fp32 params/losses, finite grads."""

import numpy as np
import jax
import jax.numpy as jnp

from avdn_tpu.data.synthetic import synthetic_world
from avdn_tpu.models import Darknet, DarknetConfig, HAATransformer
from avdn_tpu.models.et import ETConfig
from avdn_tpu.rollout import RolloutConfig, rollout
from avdn_tpu.rollout.engine import make_et_step


def test_bf16_rollout_and_grad():
    world = synthetic_world(batch_size=2, map_px=256, lang_dim=64, seed=3)
    dk = Darknet(DarknetConfig.tiny(), dtype=jnp.bfloat16)
    et = HAATransformer(
        ETConfig(demb=64, encoder_heads=4, encoder_layers=1),
        dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)
    dk_vars = dk.init(key, jnp.zeros((1, 224, 224, 3)), train=False)
    B, T = 2, 3
    et_params = et.init(
        jax.random.PRNGKey(1),
        world.batch.lang_feat, world.batch.lang_cls,
        jnp.zeros((B, T, 64, 49)), jnp.zeros((B, T, 2)),
        jnp.ones((B,), jnp.int32), world.batch.lang_mask,
    )
    # params stay fp32
    assert all(
        l.dtype == jnp.float32 for l in jax.tree_util.tree_leaves(et_params)
    )
    cfg = RolloutConfig(max_action_len=T, teacher_forcing=True, train=True)

    def loss_fn(params):
        step, init_state = make_et_step(dk, et, dk_vars, params, world.batch, cfg)
        out, _ = rollout(
            map_bank=jnp.asarray(world.map_bank), batch=world.batch, cfg=cfg,
            model_step=step, init_model_state=init_state(64, 49),
            rng=jax.random.PRNGKey(2),
        )
        return out.loss

    loss, g = jax.value_and_grad(loss_fn)(et_params)
    assert loss.dtype == jnp.float32
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l, np.float32))) for l in leaves)
