"""The compiled training step — double rollout, 3-way optimizer, DP sharding.

Reference semantics (src/xview_et/agent.py:208-252, src/xview_et/main.py):
* feedback='student' runs a teacher-forced rollout (nss weight 0) AND a
  student-forced rollout (nss weight from config) per batch, one backward
  over the summed loss (agent.py:226-235);
* three optimizers — language tower, vision tower, VLN model — all Adam or
  AdamW at the same lr (agent.py:152-157); torch-default hyperparameters
  (AdamW weight_decay=0.01) preserved;
* grad-norm clip 40 on the VLN model's parameters only (agent.py:247). For
  the LSTM family the reference nests the Darknet inside the VLN model, so
  its grads are clipped and stepped with the VLN group
  (src/xview_lstm/agent.py:129-143) — ``TrainConfig.darknet_in_vln``.

TPU-native differences (by design, not accident):
* the two BERT passes and both rollouts are one jitted program — one
  host→device launch per train step instead of the reference's per-step
  ping-pong;
* data parallelism is real: batch sharded over the mesh's ``data`` axis,
  params replicated, XLA emits the mean-gradient all-reduce over ICI
  (the reference's multi-GPU mode trains unsynced replicas, SURVEY.md §2.2).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.struct
import optax

from avdn_tpu.rollout.engine import (
    EpisodeBatch,
    RolloutConfig,
    rollout,
    make_et_step,
    make_lstm_step,
)


@flax.struct.dataclass
class TrainBatch:
    episode: EpisodeBatch          # lang_* fields are placeholders
    ids_instr: jnp.ndarray         # (B, L1) pass-1 tokens (instructions only)
    mask_instr: jnp.ndarray        # (B, L1)
    ids_dialog: jnp.ndarray        # (B, L2) pass-2 tokens (dialog + instr)
    mask_dialog: jnp.ndarray       # (B, L2)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    family: str = "et"             # "et" | "lstm"
    feedback: str = "student"      # "student" (double rollout) | "teacher"
    lr: float = 1e-5
    optim: str = "adamW"           # "adam" | "adamW"
    weight_decay: Optional[float] = None  # None → torch default per optim
    ml_weight: float = 0.2
    teacher_weight: float = 1.0
    nss_w: float = 0.1
    nss_r: int = 0
    max_action_len: int = 10
    student_stop: float = 0.5      # 0.25 for the LSTM family
    grad_clip_vln: float = 40.0
    darknet_in_vln: bool = False   # True for LSTM (clip+step with vln group)
    single_bert_pass: bool = False  # --train_val_on_full mode skips pass 2
    grad_accum: int = 1            # micro-batch count for large global batches
    language_only: bool = False
    vision_only: bool = False
    no_direction: bool = False
    render_subsample: int = 1  # >1: fast non-parity warp (PERF.md)
    render_twopass: bool = False  # full-res 2-pass MXU warp (PERF.md)
    render_crop: int = 512
    render_bf16: bool = True      # bf16 two-pass einsums (False: tighter fp32)
    fold_bn_eval: bool = True     # fold BN + input norm into eval conv weights
    remat: bool = False           # rematerialise scan steps under AD
    remat_policy: str = "full"    # "full" | "dots" (save matmul outputs)
    fused_teacher: bool = True    # time-fused teacher rollouts (rollout/fused.py)
    fast_eval_trunk: bool = True  # one-pass teacher eval trunk (et_fast.py)
    et_decode_trunk: bool = False  # incremental eval scan decode (opt-in; PERF.md)
    quant: str = "none"           # "none" | "int8" eval/serving tower (opt-in)

    def rollout_cfg(self, teacher: bool, nss_w: float, train: bool = True,
                    **kw) -> RolloutConfig:
        return RolloutConfig(
            max_action_len=self.max_action_len,
            teacher_forcing=teacher,
            stop_threshold=self.student_stop,
            train=train,
            nss_w=nss_w,
            nss_r=self.nss_r,
            language_only=self.language_only,
            no_direction=self.no_direction,
            render_subsample=self.render_subsample,
            render_twopass=self.render_twopass,
            render_crop=self.render_crop,
            render_bf16=self.render_bf16,
            remat=self.remat and train,
            remat_policy=self.remat_policy,
            fused_teacher=self.fused_teacher,
            fast_eval_trunk=self.fast_eval_trunk,
            et_decode_trunk=self.et_decode_trunk,
            **kw,
        )


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    bert_params: Any
    darknet_params: Any
    batch_stats: Any
    vln_params: Any
    opt_bert: Any
    opt_darknet: Any
    opt_vln: Any


def _make_optimizer(cfg: TrainConfig, with_clip: bool) -> optax.GradientTransformation:
    wd = cfg.weight_decay
    chain = []
    if with_clip:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_vln))
    if cfg.optim == "adamW":
        chain.append(
            optax.adamw(cfg.lr, b1=0.9, b2=0.999, eps=1e-8,
                        weight_decay=0.01 if wd is None else wd)
        )
    elif cfg.optim == "adam":
        chain.append(optax.adam(cfg.lr, b1=0.9, b2=0.999, eps=1e-8))
    else:
        raise ValueError(cfg.optim)
    return optax.chain(*chain)


def create_train_state(
    cfg: TrainConfig, bert_variables, darknet_variables, vln_variables
) -> TrainState:
    bert_p = bert_variables["params"]
    dk_p = darknet_variables["params"]
    dk_stats = darknet_variables.get("batch_stats", {})
    vln_p = vln_variables["params"]
    opt_bert = _make_optimizer(cfg, with_clip=False)
    opt_dark = _make_optimizer(cfg, with_clip=cfg.darknet_in_vln)
    opt_vln = _make_optimizer(cfg, with_clip=True)
    return TrainState(
        step=jnp.int32(0),
        bert_params=bert_p,
        darknet_params=dk_p,
        batch_stats=dk_stats,
        vln_params=vln_p,
        opt_bert=opt_bert.init(bert_p),
        opt_darknet=opt_dark.init(dk_p),
        opt_vln=opt_vln.init(vln_p),
    )


def _encode_language(bert_model, bert_params, batch: TrainBatch, cfg: TrainConfig,
                     train: bool, rng):
    """The reference's two-pass BERT quirk (agent.py:521-538): token features
    from the instructions-only pass; the 49-d head query (and pooler) from
    the full-dialog pass."""
    r1, r2 = jax.random.split(rng)
    rngs1 = {"dropout": r1} if train else None
    lang_feat, cls_1, _ = bert_model.apply(
        {"params": bert_params}, batch.ids_instr, batch.mask_instr,
        deterministic=not train, rngs=rngs1,
    )
    if cfg.single_bert_pass:
        lang_cls = cls_1
    else:
        rngs2 = {"dropout": r2} if train else None
        _, lang_cls, _ = bert_model.apply(
            {"params": bert_params}, batch.ids_dialog, batch.mask_dialog,
            deterministic=not train, rngs=rngs2,
        )
    return lang_feat, lang_cls


def _run_family_rollout(
    cfg, roll_cfg, models, bert_out, params, batch_stats, batch, map_bank, rng
):
    darknet_model, vln_model = models
    lang_feat, lang_cls = bert_out
    ep = batch.episode.replace(
        lang_feat=lang_feat, lang_cls=lang_cls,
        lang_mask=batch.mask_instr.astype(bool),
    )
    dk_vars = {"params": params["darknet"], "batch_stats": batch_stats}
    vln_vars = {"params": params["vln"]}
    if (
        roll_cfg.teacher_forcing
        and roll_cfg.fused_teacher
        and cfg.family in ("et", "lstm")
    ):
        from avdn_tpu.rollout.fused import rollout_teacher_fused

        out, model_state = rollout_teacher_fused(
            map_bank=map_bank, batch=ep, cfg=roll_cfg, family=cfg.family,
            darknet_model=darknet_model, vln_model=vln_model,
            dk_vars=dk_vars, vln_vars=vln_vars, rng=rng,
        )
        return out, model_state["batch_stats"]
    if cfg.family == "et":
        step, init_state = make_et_step(
            darknet_model, vln_model, dk_vars, vln_vars, ep, roll_cfg
        )
        init = init_state(_darknet_channels(darknet_model), 49)
    else:
        step, init_state = make_lstm_step(
            darknet_model, vln_model, dk_vars, vln_vars, ep, roll_cfg
        )
        init = init_state()
    out, model_state = rollout(
        map_bank=map_bank, batch=ep, cfg=roll_cfg, model_step=step,
        init_model_state=init, rng=rng,
    )
    return out, model_state["batch_stats"]


def _darknet_channels(darknet_model) -> int:
    """Output channel count of the tower's final conv (static, from cfg)."""
    ch = 3
    chans = [3]
    for b in darknet_model.cfg.block_dicts()[1:]:
        if b["type"] == "convolutional":
            ch = int(b["filters"])
        elif b["type"] == "route":
            ch = sum(chans[int(v)] for v in b["layers"].split(","))
        elif b["type"] == "shortcut":
            ch = chans[int(b["from"])]
        chans.append(ch)
    return ch


def make_train_step(
    cfg: TrainConfig, bert_model, darknet_model, vln_model
) -> Callable:
    """Build the jitted train step:
    ``train_step(state, map_bank, batch, rng) -> (state, metrics)``."""
    opt_bert = _make_optimizer(cfg, with_clip=False)
    opt_dark = _make_optimizer(cfg, with_clip=cfg.darknet_in_vln)
    opt_vln = _make_optimizer(cfg, with_clip=True)
    models = (darknet_model, vln_model)

    def loss_fn(trainable, batch_stats, map_bank, batch, rng, loss_norm=None):
        r_bert, r_t, r_s = jax.random.split(rng, 3)
        bert_out = _encode_language(
            bert_model, trainable["bert"], batch, cfg, train=True, rng=r_bert
        )
        B = loss_norm if loss_norm is not None else batch.ids_instr.shape[0]
        if cfg.feedback == "teacher":
            roll = cfg.rollout_cfg(teacher=True, nss_w=cfg.nss_w)
            out, batch_stats = _run_family_rollout(
                cfg, roll, models, bert_out, trainable, batch_stats, batch,
                map_bank, r_t,
            )
            loss = cfg.teacher_weight * out.loss / B
        else:
            # teacher-forced pass with nss off, then student-forced with nss
            # (agent.py:231-235)
            roll_t = cfg.rollout_cfg(teacher=True, nss_w=0.0)
            out_t, batch_stats = _run_family_rollout(
                cfg, roll_t, models, bert_out, trainable, batch_stats, batch,
                map_bank, r_t,
            )
            roll_s = cfg.rollout_cfg(teacher=False, nss_w=cfg.nss_w)
            out_s, batch_stats = _run_family_rollout(
                cfg, roll_s, models, bert_out, trainable, batch_stats, batch,
                map_bank, r_s,
            )
            loss = cfg.ml_weight * (out_t.loss + out_s.loss) / B
        return loss, batch_stats

    def _grads_full(trainable, batch_stats, map_bank, batch, rng):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, batch_stats, map_bank, batch, rng
        )
        return loss, new_stats, grads

    def _grads_accum(trainable, batch_stats, map_bank, batch, rng):
        """Micro-batch the episode dimension and accumulate summed grads —
        identical loss/grad normalisation to the full-batch step (each micro
        loss is divided by the FULL batch size). BN running stats update
        sequentially over micro-batches (running-average semantics only)."""
        K = cfg.grad_accum
        full_B = batch.ids_instr.shape[0]
        if full_B % K != 0:
            raise ValueError(
                f"--grad_accum {K} must evenly divide batch_size {full_B}"
            )
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape(K, full_B // K, *x.shape[1:]), batch
        )

        def body(carry, mb_rng):
            stats, gsum, lsum = carry
            mb, r = mb_rng
            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, stats, map_bank, mb, r, loss_norm=full_B
            )
            gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
            return (stats, gsum, lsum + loss), None

        zeros = jax.tree_util.tree_map(jnp.zeros_like, trainable)
        rngs = jax.random.split(rng, K)
        (new_stats, grads, loss), _ = jax.lax.scan(
            body, (batch_stats, zeros, jnp.float32(0.0)), (micro, rngs)
        )
        return loss, new_stats, grads

    def train_step(state: TrainState, map_bank, batch: TrainBatch, rng):
        trainable = {
            "bert": state.bert_params,
            "darknet": state.darknet_params,
            "vln": state.vln_params,
        }
        grads_fn = _grads_accum if cfg.grad_accum > 1 else _grads_full
        loss, new_stats, grads = grads_fn(
            trainable, state.batch_stats, map_bank, batch, rng
        )
        up_b, os_b = opt_bert.update(
            grads["bert"], state.opt_bert, state.bert_params
        )
        up_d, os_d = opt_dark.update(
            grads["darknet"], state.opt_darknet, state.darknet_params
        )
        up_v, os_v = opt_vln.update(grads["vln"], state.opt_vln, state.vln_params)
        new_state = state.replace(
            step=state.step + 1,
            bert_params=optax.apply_updates(state.bert_params, up_b),
            darknet_params=optax.apply_updates(state.darknet_params, up_d),
            vln_params=optax.apply_updates(state.vln_params, up_v),
            batch_stats=new_stats,
            opt_bert=os_b,
            opt_darknet=os_d,
            opt_vln=os_v,
        )
        metrics = {
            "loss": loss,
            "grad_norm_vln": optax.global_norm(grads["vln"]),
            "grad_norm_bert": optax.global_norm(grads["bert"]),
        }
        return new_state, metrics

    return train_step


def make_eval_rollout(cfg: TrainConfig, bert_model, darknet_model, vln_model,
                      teacher: bool, collect_ha: bool = False,
                      compute_losses: bool = True,
                      collect_debug: bool = False) -> Callable:
    """Build the jitted eval rollout:
    ``eval_fn(state, map_bank, batch, rng) -> RolloutOutputs``.

    ``teacher=False`` is the nav eval (student-forced closed loop);
    ``teacher=True`` with ``collect_ha`` is the human-attention eval
    (src/xview_et/main.py:188-239). ``collect_debug`` additionally returns
    per-step views and pred/GT saliency maps for the inference-mode
    attention debug images (agent.py:694-706).

    ``cfg.fold_bn_eval`` (default): the vision tower runs as its folded
    inference variant — eval-mode BatchNorm and the ``(x−mean)/std`` input
    normalisation are algebraically absorbed into the conv weights each
    call (O(|params|), done in-jit), removing the per-step normalisation
    passes from inside the scan. Same math up to float reassociation.
    """
    fold = cfg.fold_bn_eval
    quant = cfg.quant == "int8"
    if quant and not fold:
        raise ValueError(
            "--quant int8 requires --fold_bn_eval (the quantizer consumes "
            "the bias-carrying folded conv form)"
        )
    if cfg.quant not in ("none", "int8"):
        raise ValueError(f"unknown quant mode {cfg.quant!r} "
                         "(choose 'none' or 'int8')")
    if fold:
        from avdn_tpu.models.darknet import Darknet, fold_darknet_params

        if quant:
            from avdn_tpu.models.darknet_quant import QuantDarknet

            folded_dk = QuantDarknet(darknet_model.cfg,
                                     dtype=darknet_model.dtype)
        else:
            folded_dk = Darknet(darknet_model.cfg, dtype=darknet_model.dtype,
                                folded=True)
        models = (folded_dk, vln_model)
    else:
        models = (darknet_model, vln_model)

    def eval_fn(state: TrainState, map_bank, batch: TrainBatch, rng):
        bert_out = _encode_language(
            bert_model, state.bert_params, batch, cfg, train=False,
            rng=jax.random.PRNGKey(0),
        )
        roll = cfg.rollout_cfg(
            teacher=teacher,
            nss_w=0.0,
            train=False,
            collect_ha_metrics=collect_ha,
            compute_losses=compute_losses,
            collect_views=collect_debug,
            collect_saliency=collect_debug,
            fused_input_norm=fold,
        )
        trainable = {
            "bert": state.bert_params,
            "darknet": state.darknet_params,
            "vln": state.vln_params,
        }
        batch_stats = state.batch_stats
        if fold:
            from avdn_tpu.rollout.engine import RGB_STD

            trainable = dict(trainable)
            trainable["darknet"] = fold_darknet_params(
                darknet_model.cfg, state.darknet_params, state.batch_stats,
                input_std=RGB_STD,
            )
            if quant:
                from avdn_tpu.models.darknet_quant import (
                    quantize_darknet_params,
                )

                trainable["darknet"] = quantize_darknet_params(
                    darknet_model.cfg, trainable["darknet"])
            batch_stats = {}
        out, _ = _run_family_rollout(
            cfg, roll, models, bert_out, trainable, batch_stats, batch,
            map_bank, rng,
        )
        return out

    return eval_fn
