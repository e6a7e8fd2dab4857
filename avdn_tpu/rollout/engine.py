"""The episode engine — render → encode → act → step under ONE lax.scan.

This replaces the reference's hot loop (src/xview_et/agent.py:512-894 and
src/xview_lstm/agent.py:518-857), which ping-pongs host↔device every step
(cv2 render on host → H2D images → GPU forward → D2H decode → host
geometry → host render again, SURVEY.md §3.3). Here the whole episode is a
single compiled program: the map bank lives in HBM, the renderer/dynamics/
oracle are the batched JAX modules in ``avdn_tpu.sim``, and the model is
called with fixed-shape padded history.

Semantics preserved from the reference (each deliberate, see inline refs):
* losses accumulate over ALL batch items every step, ended or not
  (agent.py:663-669 has no ended guard);
* movement is gated on the CURRENT stop decision only — previously-ended
  items still zoom/move invisibly (agent.py:733-757); their trajectory is
  simply no longer logged;
* the stop threshold is 0.5 teacher-forced and per-family for student
  (ET 0.5 / LSTM 0.25, agent.py:734-741 vs lstm agent.py:697-704);
* a step where every item is already ended contributes no loss (the
  reference breaks out of the loop, agent.py:771).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.struct

from avdn_tpu.sim.render import render_batch
from avdn_tpu.sim.warp2pass import render_batch_twopass
from avdn_tpu.sim.dynamics import move_view_corners_batch
from avdn_tpu.sim.oracle import teacher_action_batch
from avdn_tpu.ops.losses import step_losses
from avdn_tpu.ops.saliency_pallas import saliency_reductions


def _pallas_ok() -> bool:
    """Use the fused Pallas saliency kernel on TPU, XLA elsewhere."""
    import jax

    return jax.default_backend() == "tpu"

_PI_REF = 3.14159

#: RGB normalisation stats (the reference's xView constants,
#: src/xview_et/agent.py:115-116, applied after BGR→RGB flip — our map bank
#: is RGB from the start so they apply directly). Kept as numpy: a
#: module-level jnp array would initialise the XLA backend at import time,
#: breaking jax.distributed bootstrap (parallel.runtime).
import numpy as _np

RGB_MEAN = _np.array([60.134, 49.697, 40.746], _np.float32)
RGB_STD = _np.array([29.99, 24.498, 22.046], _np.float32)


@flax.struct.dataclass
class EpisodeBatch:
    """Device-resident episode batch. All coordinates are GPS *offsets* from
    each map's bottom-left corner (float32-safe, see sim.dynamics)."""

    map_idx: jnp.ndarray       # (B,) int32 — index into the map bank
    start_corners: jnp.ndarray  # (B, 4, 2)
    start_dir: jnp.ndarray     # (B,) degrees
    extent: jnp.ndarray        # (B, 2) map extent in degrees
    lat_ratio: jnp.ndarray     # (B,) degrees per pixel
    gt_corners: jnp.ndarray    # (B, Tg, 4, 2) padded GT path
    gt_len: jnp.ndarray        # (B,) int32
    circles: jnp.ndarray       # (B, C, 3) attention circles in img coords
    n_circles: jnp.ndarray     # (B,) int32
    lang_feat: jnp.ndarray     # (B, L, D) BERT token features (pass 1)
    lang_cls: jnp.ndarray      # (B, 49) BERT head output (pass 2)
    lang_mask: jnp.ndarray     # (B, L) bool — valid language tokens


@dataclasses.dataclass(frozen=True)
class RolloutConfig:
    max_action_len: int = 10
    teacher_forcing: bool = True       # feedback mode
    stop_threshold: float = 0.5        # student stop (LSTM uses 0.25)
    compute_losses: bool = True        # False for test_unseen (no GT)
    train: bool = False                # dropout + BN batch stats
    nss_w: float = 0.0
    nss_r: int = 0
    language_only: bool = False        # zero out visual features (ablation)
    no_direction: bool = False         # zero out heading features (ablation)
    collect_ha_metrics: bool = False   # per-step HA precision/recall + NSS
    collect_views: bool = False        # debug: return rendered views
    collect_saliency: bool = False     # debug: return pred/GT saliency maps
    render_subsample: int = 1          # >1: fast (non-parity) warp, PERF.md
    render_twopass: bool = False       # full-res 2-pass MXU warp (PERF.md)
    render_crop: int = 512             # 2-pass source window (>= max view px)
    render_bf16: bool = True           # bf16 warp einsums; False = fp32
    fused_input_norm: bool = False     # (x−mean)/std folded into conv 1
    # (set by the eval builder together with fold_darknet_params)
    remat: bool = False                # rematerialise the scan body under AD:
    # trades recompute for activation memory so larger train batches fit HBM
    remat_policy: str = "full"         # "full": recompute everything;
    # "dots": save matmul/conv outputs, recompute only elementwise (lower
    # recompute tax, higher residency — jax.checkpoint_policies)
    fused_teacher: bool = True         # time-fused teacher-forced rollouts:
    # the teacher trajectory is model-independent (actions/stops come from
    # the oracle geometry alone), so render + towers run time-batched in one
    # wide call instead of T sequential scan steps (rollout/fused.py). Same
    # math, same rng streams. Under --remat only the student rollout is
    # rematerialised; the fused teacher half stores its activations (O(T·B)
    # tower footprint) — set fused_teacher=False if that bound doesn't fit.
    # Student mode always scans (genuinely closed loop).
    fast_eval_trunk: bool = True       # ET family, eval (deterministic) only:
    # the fused teacher eval runs ONE causal trunk pass instead of T
    # step-masked re-encodes — an exact reformulation (models/et_fast.py,
    # pinned by tests/test_et_fast.py). Train mode always re-encodes
    # (per-step dropout makes the passes distinct). Measured +5-7% on the
    # two-pass HA eval (PERF.md "Eval-trunk reformulations").
    et_decode_trunk: bool = False      # ET family, eval scans only: decode
    # the trunk incrementally (per step only the two new tokens attend
    # cached language+history K/V) — also exact up to reassociation. The
    # two-softmax language/history merge (models/et_fast.py:_attend_two)
    # keeps the episode-constant language cache out of the scan body;
    # post-merge it measures +2-6% at every point, but its 1e-5
    # reassociation flips one borderline fixture episode across render
    # modes (the golden gate caught it), so it stays opt-in — the shipped
    # default keeps the flips=0 render-mode identity. PERF.md "Eval-trunk
    # reformulations".


@flax.struct.dataclass
class RolloutOutputs:
    """Per-step (leading axis T) trajectory records for host-side metrics."""

    alive_pre: jnp.ndarray      # (T, B) item alive at model-call time
    alive_post: jnp.ndarray     # (T, B) alive after the stop update
    actions_wp: jnp.ndarray     # (T, B, 2) normalised predicted waypoint
    actions_alt: jnp.ndarray    # (T, B) clipped predicted altitude
    pred_progress: jnp.ndarray  # (T, B) raw predicted progress
    gt_wp: jnp.ndarray          # (T, B, 2)
    gt_alt: jnp.ndarray         # (T, B)
    gt_progress: jnp.ndarray    # (T, B)
    corners: jnp.ndarray        # (T, B, 4, 2) post-step corners
    directions: jnp.ndarray     # (T, B)
    ha_precision: jnp.ndarray   # (T, B)
    ha_recall: jnp.ndarray      # (T, B)
    ha_nss: jnp.ndarray         # (T, B)
    ha_valid: jnp.ndarray       # (T, B)
    loss: jnp.ndarray           # () summed ml loss (pre ml_weight scaling)
    views: Optional[jnp.ndarray] = None
    pred_sal: Optional[jnp.ndarray] = None  # (T, B, 224, 224) debug dumps
    gt_sal: Optional[jnp.ndarray] = None    # (T, B, 224, 224)


def _corners_to_img(corners, extent, lat_ratio):
    """GPS offsets (lat, lng) → map image (x, y) (src/env.py:189-196)."""
    x = corners[..., 1] / lat_ratio[:, None]
    y = (extent[:, 0:1] - corners[..., 0]) / lat_ratio[:, None]
    return jnp.stack([x, y], axis=-1)


def render_views(map_bank, batch: EpisodeBatch, corners, cfg: RolloutConfig):
    """Render the batch's current views + GT saliency (one copy of the
    render dispatch, shared by the scan body and the fused teacher path).

    The outputs are tagged ``checkpoint_name("rendered_views")`` — OUTSIDE
    the render's own jit boundary so the name eqn sits directly in the
    (possibly rematted) scan-body jaxpr. Rationale: the simulator feedback
    is detached (no gradient flows back through the render), so under
    ``--remat`` recomputing the render in the backward pass is pure waste
    — yet ``--remat_policy dots`` was recomputing it anyway, because the
    two-pass tent einsums carry a batch dimension (``xhv,hxc->xvc``) that
    ``dots_with_no_batch_dims_saveable`` refuses to save. The "dots"
    policy therefore also saves these named outputs (profiled: the
    rematted render region was ~10% of the production train step)."""
    from jax.ad_checkpoint import checkpoint_name

    quad_img = _corners_to_img(corners, batch.extent, batch.lat_ratio)
    if cfg.render_twopass:
        out = render_batch_twopass(
            map_bank, batch.map_idx, quad_img, batch.circles,
            batch.n_circles, crop_hw=cfg.render_crop, bf16=cfg.render_bf16,
        )
    else:
        out = render_batch(
            map_bank, batch.map_idx, quad_img, batch.circles,
            batch.n_circles, subsample=cfg.render_subsample,
        )
    return jax.tree_util.tree_map(
        lambda x: checkpoint_name(x, "rendered_views"), out)


def decode_action(action):
    """Raw model action (B, 4) → (wp_norm, alt_clip, prog_clip) exactly as
    the reference decodes (agent.py:640-653): ∞-ball clamp + [0,1] clips."""
    action = action.astype(jnp.float32)
    pred_wp = action[:, 0:2]
    denom = jnp.maximum(jnp.max(jnp.abs(pred_wp), axis=-1, keepdims=True), 1.0)
    wp_norm = pred_wp / denom
    alt_clip = jnp.clip(action[:, 2], 0.0, 1.0)
    prog_clip = jnp.clip(action[:, 3], 0.0, 1.0)
    return wp_norm, alt_clip, prog_clip


def dynamics_update(corners, directions, act_wp, act_alt, prog_stop, thresh,
                    t, T, extent):
    """One simulator transition (agent.py:733-757), shared by the scan body
    and the fused teacher path: the stop decision gates the move; items that
    stop keep their corners. Returns (stop_now, new_corners, new_dirs)."""
    stop_now = (prog_stop > thresh) | (t == T - 1)
    a_dir = (jnp.arctan2(act_wp[:, 0], act_wp[:, 1]) / _PI_REF + 2.0) / 2.0 % 1.0
    half_edge = jnp.linalg.norm(corners[:, 0] - corners[:, 1], axis=-1) / 2.0
    a_dist = jnp.linalg.norm(act_wp, axis=-1) * half_edge
    a_alt_m = jnp.round(act_alt * 360.0) + 40.0
    moved, moved_dir = move_view_corners_batch(
        corners, jnp.round(a_dir * 360.0), a_dist, a_alt_m, extent, directions
    )
    do_move = ~stop_now
    new_corners = jnp.where(do_move[:, None, None], moved, corners)
    new_dirs = jnp.where(do_move, moved_dir, directions)
    return stop_now, new_corners, new_dirs


def rollout(
    *,
    map_bank: jnp.ndarray,
    batch: EpisodeBatch,
    cfg: RolloutConfig,
    model_step: Callable,
    init_model_state: Any,
    rng: jax.Array,
):
    """Run one full episode batch under lax.scan.

    ``model_step(model_state, images, dir_feat, step_index, ended, rng)``
    → ``(new_model_state, action (B, 4), saliency (B, H, W))`` abstracts the
    model family: the ET closure appends to padded history and re-encodes;
    the LSTM closure advances its recurrent state. ``images`` are the
    normalised (B, 224, 224, 3) views; the closure owns the vision tower
    (so Darknet BN state and params stay with their model family).
    """
    B = batch.start_corners.shape[0]
    T = cfg.max_action_len

    def body(carry, t):
        corners, directions, ended, model_state, loss_acc, rng = carry
        rng, r_model, r_eps = jax.random.split(rng, 3)
        any_alive = ~jnp.all(ended)

        # ---- render current views on device ----
        views, gt_sal = render_views(map_bank, batch, corners, cfg)
        # input normalisation — the /std is folded into the first conv when
        # the eval tower is BN-folded (fold_darknet_params); the mean
        # subtraction must stay here (the conv zero-pads the NORMALISED
        # tensor, so only the scale commutes with the padding)
        if cfg.fused_input_norm:
            x = views - RGB_MEAN
        else:
            x = (views - RGB_MEAN) / RGB_STD

        rad = directions / 180.0 * _PI_REF
        dir_feat = jnp.stack([jnp.sin(rad), jnp.cos(rad)], axis=-1)
        if cfg.no_direction:
            dir_feat = jnp.zeros_like(dir_feat)

        # ---- model ----
        model_state, action, pred_sal = model_step(
            model_state, x, dir_feat, t, ended, r_model
        )
        # towers may compute in bfloat16; losses/geometry stay fp32
        action = action.astype(jnp.float32)
        pred_sal = pred_sal.astype(jnp.float32)
        # losses see the RAW head outputs (agent.py:663-669); the decode
        # below only feeds the trajectory records and student feedback
        pred_wp = action[:, 0:2]
        pred_alt = action[:, 2]
        pred_prog = action[:, 3]
        wp_norm, alt_clip, prog_clip = decode_action(action)

        # ---- oracle + losses ----
        need_sal_stats = cfg.compute_losses or cfg.collect_ha_metrics
        if need_sal_stats:
            # one fused pass over both saliency maps: NSS moments + HA
            # precision/recall sums. Pallas kernel on TPU for eval; the XLA
            # formulation when training (the kernel has no VJP and the NSS
            # term is differentiated).
            neg_nss, nss_valid, ha_prec, ha_rec = saliency_reductions(
                pred_sal, gt_sal, nss_r=cfg.nss_r,
                use_pallas=_pallas_ok() and not cfg.train,
            )
        else:
            neg_nss = jnp.zeros((B,), jnp.float32)
            nss_valid = jnp.zeros((B,), bool)
            ha_prec = jnp.zeros((B,))
            ha_rec = jnp.zeros((B,))

        if cfg.compute_losses:
            oracle = teacher_action_batch(
                corners, ended, batch.gt_corners, batch.gt_len, cfg.teacher_forcing
            )
            gt_wp = oracle["waypoint_ratio"]
            gt_alt = oracle["altitude"]
            gt_prog = oracle["progress"]
            heading_eps = 1e-5 * jax.random.uniform(r_eps, (B,))
            ml = step_losses(
                pred_wp, pred_alt, pred_prog, gt_wp, gt_alt, gt_prog, heading_eps
            )
            ml = ml + cfg.nss_w * jnp.sum(jnp.where(nss_valid, neg_nss, 0.0))
            loss_acc = loss_acc + jnp.where(any_alive, ml, 0.0)
        else:
            gt_wp = jnp.zeros((B, 2), jnp.float32)
            gt_alt = jnp.zeros((B,), jnp.float32)
            gt_prog = jnp.zeros((B,), jnp.float32)

        # ---- feedback + stop decision ----
        if cfg.teacher_forcing:
            act_wp, act_alt = gt_wp, gt_alt
            prog_stop = gt_prog
            thresh = 0.5
        else:
            act_wp, act_alt = wp_norm, alt_clip
            prog_stop = prog_clip
            thresh = cfg.stop_threshold

        # The simulator transition is NOT part of the reference's autodiff
        # graph: actions are detached to host numpy before the env step
        # (agent.py:724-755), so step t's loss never backprops into step
        # t-1's action through the next view/oracle. Detaching here matches
        # that semantics exactly AND removes the (useless) backward through
        # render/dynamics/oracle in student-forced training.
        act_wp = jax.lax.stop_gradient(act_wp)
        act_alt = jax.lax.stop_gradient(act_alt)
        prog_stop = jax.lax.stop_gradient(prog_stop)

        stop_now, new_corners, new_dirs = dynamics_update(
            corners, directions, act_wp, act_alt, prog_stop, thresh, t, T,
            batch.extent,
        )
        ended_next = ended | stop_now

        ys = dict(
            alive_pre=~ended,
            alive_post=~ended_next,
            actions_wp=wp_norm,
            actions_alt=alt_clip,
            pred_progress=pred_prog,
            gt_wp=gt_wp,
            gt_alt=gt_alt,
            gt_progress=gt_prog,
            corners=new_corners,
            directions=new_dirs,
            ha_precision=ha_prec,
            ha_recall=ha_rec,
            ha_nss=neg_nss,
            # the reference records HA metrics for every item while the
            # episode loop is still running, ended or not (agent.py:673-691)
            ha_valid=nss_valid & any_alive & jnp.bool_(cfg.collect_ha_metrics),
        )
        if cfg.collect_views:
            ys["views"] = views
        if cfg.collect_saliency:
            # per-step attention debug dumps (agent.py:694-706)
            ys["pred_sal"] = pred_sal
            ys["gt_sal"] = gt_sal
        new_carry = (new_corners, new_dirs, ended_next, model_state, loss_acc, rng)
        return new_carry, ys

    init = (
        batch.start_corners.astype(jnp.float32),
        batch.start_dir.astype(jnp.float32),
        jnp.zeros((B,), bool),
        init_model_state,
        jnp.float32(0.0),
        rng,
    )
    # prevent_cse=False: safe (and faster) under lax.scan, which already
    # provides the barrier jax.checkpoint's CSE workaround exists for
    if cfg.remat:
        # "dots" also saves the render outputs (checkpoint_name-tagged in
        # render_views): the render is gradient-free (detached simulator
        # feedback) so its backward-pass recompute is pure waste, and the
        # tent einsums' batch dim keeps dots_with_no_batch_dims_saveable
        # from saving them on its own (see render_views docstring)
        policy = (jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            jax.checkpoint_policies.save_only_these_names("rendered_views"))
                  if cfg.remat_policy == "dots" else None)
        body_fn = jax.checkpoint(body, prevent_cse=False, policy=policy)
    else:
        body_fn = body
    (final_corners, final_dirs, ended, model_state, loss, _), ys = jax.lax.scan(
        body_fn, init, jnp.arange(T)
    )
    outputs = RolloutOutputs(
        alive_pre=ys["alive_pre"],
        alive_post=ys["alive_post"],
        actions_wp=ys["actions_wp"],
        actions_alt=ys["actions_alt"],
        pred_progress=ys["pred_progress"],
        gt_wp=ys["gt_wp"],
        gt_alt=ys["gt_alt"],
        gt_progress=ys["gt_progress"],
        corners=ys["corners"],
        directions=ys["directions"],
        ha_precision=ys["ha_precision"],
        ha_recall=ys["ha_recall"],
        ha_nss=ys["ha_nss"],
        ha_valid=ys["ha_valid"],
        loss=loss,
        views=ys.get("views"),
        pred_sal=ys.get("pred_sal"),
        gt_sal=ys.get("gt_sal"),
    )
    return outputs, model_state


# --------------------------------------------------------------------------
# Model-family step closures
# --------------------------------------------------------------------------


def make_et_step(
    darknet_model,
    et_model,
    darknet_vars,     # {"params", "batch_stats"}
    et_params,        # {"params"}
    batch: EpisodeBatch,
    cfg: RolloutConfig,
):
    """ET closure: pads history to T and re-encodes the full episode each
    step (the reference's O(T²) semantics, agent.py:605-630, kept for model
    parity — the transformer *is* history-conditioned).

    In eval (deterministic) mode with ``cfg.et_decode_trunk`` the full
    re-encode is replaced by an exact incremental KV decode: each step only
    the two new tokens (frame t, direction t) run through the trunk against
    cached language + history keys/values (models/et_fast.py). Same outputs
    — the causal masks make every history token step-invariant. Opt-in:
    wins +2-6% everywhere post two-softmax-merge, but kept off the default
    path because its reassociation flips a borderline golden-gate episode
    across render modes (PERF.md)."""
    B = batch.lang_feat.shape[0]
    T = cfg.max_action_len

    if not cfg.train and cfg.et_decode_trunk:
        return _make_et_decode_step(
            darknet_model, et_model, darknet_vars, et_params, batch, cfg
        )

    def init_state(feat_channels: int, spatial: int):
        return {
            "frames": jnp.zeros((B, T, feat_channels, spatial), jnp.float32),
            "dirs": jnp.zeros((B, T, 2), jnp.float32),
            "lengths": jnp.zeros((B,), jnp.int32),
            "batch_stats": darknet_vars.get("batch_stats", {}),
        }

    def step(state, x, dir_feat, t, ended, rng):
        dk_vars = {"params": darknet_vars["params"]}
        if state["batch_stats"]:
            dk_vars["batch_stats"] = state["batch_stats"]
        if cfg.train:
            feats, updates = darknet_model.apply(
                dk_vars, x, train=True, mutable=["batch_stats"]
            )
            new_stats = updates["batch_stats"]
        else:
            feats = darknet_model.apply(dk_vars, x, train=False)
            new_stats = state["batch_stats"]
        if cfg.language_only:
            feats = jnp.zeros_like(feats)
        frames = state["frames"].at[:, t].set(feats)
        dirs = state["dirs"].at[:, t].set(dir_feat)
        lengths = state["lengths"] + (~ended).astype(jnp.int32)
        action, sal = et_model.apply(
            et_params,
            batch.lang_feat,
            batch.lang_cls,
            frames,
            dirs,
            lengths,
            batch.lang_mask,
            deterministic=not cfg.train,
            rngs={"dropout": rng} if cfg.train else None,
        )
        new_state = {
            "frames": frames,
            "dirs": dirs,
            "lengths": lengths,
            "batch_stats": new_stats,
        }
        return new_state, action, sal

    return step, init_state


def _make_et_decode_step(
    darknet_model, et_model, darknet_vars, et_params, batch: EpisodeBatch,
    cfg: RolloutConfig,
):
    """Incremental-decode ET closure (eval only — see make_et_step)."""
    from avdn_tpu.models import et_fast

    B = batch.lang_feat.shape[0]
    T = cfg.max_action_len
    et_cfg = et_model.cfg
    dtype = et_model.dtype
    # episode constants: per-layer language K/V (computed once; hoisted out
    # of the scan as loop invariants)
    lang_kv = et_fast.make_lang_cache(
        et_params, et_cfg, batch.lang_feat, batch.lang_mask, dtype=dtype
    )

    def init_state(feat_channels: int, spatial: int):
        return {
            "cache": et_fast.init_cache(et_cfg, B, T, dtype=dtype),
            "lengths": jnp.zeros((B,), jnp.int32),
            "batch_stats": darknet_vars.get("batch_stats", {}),
        }

    def step(state, x, dir_feat, t, ended, rng):
        dk_vars = {"params": darknet_vars["params"]}
        if state["batch_stats"]:
            dk_vars["batch_stats"] = state["batch_stats"]
        feats = darknet_model.apply(dk_vars, x, train=False)
        if cfg.language_only:
            feats = jnp.zeros_like(feats)
        lengths = state["lengths"] + (~ended).astype(jnp.int32)
        cache, action, sal = et_fast.decode_step(
            et_params, et_cfg, lang_kv, state["cache"], batch.lang_cls,
            feats, dir_feat, t, lengths, batch.lang_mask, dtype=dtype,
        )
        new_state = {
            "cache": cache,
            "lengths": lengths,
            "batch_stats": state["batch_stats"],
        }
        return new_state, action, sal

    return step, init_state


def make_lstm_step(
    darknet_model,
    lstm_model,
    darknet_vars,
    lstm_params,
    batch: EpisodeBatch,
    cfg: RolloutConfig,
):
    """HAA-LSTM closure: threads (h, c, hh, cc) through the scan
    (the reference's recurrent variant, src/xview_lstm/agent.py:592-602)."""
    from avdn_tpu.models.lstm import init_lstm_state

    B = batch.lang_feat.shape[0]

    def init_state(*_):
        return {
            "lstm": init_lstm_state(B, lstm_model.cfg),
            "batch_stats": darknet_vars.get("batch_stats", {}),
        }

    def step(state, x, dir_feat, t, ended, rng):
        dk_vars = {"params": darknet_vars["params"]}
        if state["batch_stats"]:
            dk_vars["batch_stats"] = state["batch_stats"]
        if cfg.train:
            feats, updates = darknet_model.apply(
                dk_vars, x, train=True, mutable=["batch_stats"]
            )
            new_stats = updates["batch_stats"]
        else:
            feats = darknet_model.apply(dk_vars, x, train=False)
            new_stats = state["batch_stats"]
        if cfg.language_only:
            feats = jnp.zeros_like(feats)
        # the LSTM cell takes the raw heading in degrees (it applies its own
        # sin/cos, vln_model.py:229); recover degrees from the engine's
        # (sin, cos) so ablation zeroing still flows through one place
        deg = (
            jnp.arctan2(dir_feat[:, 0:1], dir_feat[:, 1:2]) / _PI_REF * 180.0
        )
        new_lstm, action, sal = lstm_model.apply(
            lstm_params,
            deg,
            feats,
            batch.lang_cls,
            batch.lang_feat,
            state["lstm"],
            deterministic=not cfg.train,
            rngs={"dropout": rng} if cfg.train else None,
        )
        return (
            {"lstm": new_lstm, "batch_stats": new_stats},
            action,
            sal,
        )

    return step, init_state


def make_lstm_vision_only_step(darknet_model, lstm_model, darknet_vars,
                               lstm_params, batch: EpisodeBatch,
                               cfg: RolloutConfig):
    """HAA-LSTM vision-only ablation cell (src/models/vln_model.py:255-343):
    no language inputs at all."""
    from avdn_tpu.models.lstm import init_lstm_state

    B = batch.start_corners.shape[0]

    def init_state(*_):
        return {
            "lstm": init_lstm_state(B, lstm_model.cfg),
            "batch_stats": darknet_vars.get("batch_stats", {}),
        }

    def step(state, x, dir_feat, t, ended, rng):
        dk_vars = {"params": darknet_vars["params"]}
        if state["batch_stats"]:
            dk_vars["batch_stats"] = state["batch_stats"]
        if cfg.train:
            feats, updates = darknet_model.apply(
                dk_vars, x, train=True, mutable=["batch_stats"]
            )
            new_stats = updates["batch_stats"]
        else:
            feats = darknet_model.apply(dk_vars, x, train=False)
            new_stats = state["batch_stats"]
        deg = jnp.arctan2(dir_feat[:, 0:1], dir_feat[:, 1:2]) / _PI_REF * 180.0
        new_lstm, action, sal = lstm_model.apply(
            lstm_params, deg, feats, state["lstm"],
            deterministic=not cfg.train,
            rngs={"dropout": rng} if cfg.train else None,
        )
        return {"lstm": new_lstm, "batch_stats": new_stats}, action, sal

    return step, init_state


def make_lstm_lang_only_step(lstm_model, lstm_params, batch: EpisodeBatch,
                             cfg: RolloutConfig):
    """HAA-LSTM language-only ablation cell (src/models/vln_model.py:349-412):
    no vision tower; saliency output is zero (the variant has no saliency
    head)."""
    B = batch.start_corners.shape[0]
    hid = lstm_model.cfg.hidden_size

    def init_state(*_):
        return {
            "lstm": (jnp.zeros((B, hid)), jnp.zeros((B, hid))),
            "batch_stats": {},
        }

    def step(state, x, dir_feat, t, ended, rng):
        deg = jnp.arctan2(dir_feat[:, 0:1], dir_feat[:, 1:2]) / _PI_REF * 180.0
        new_lstm, action = lstm_model.apply(
            lstm_params, deg, batch.lang_feat, state["lstm"],
            deterministic=not cfg.train,
            rngs={"dropout": rng} if cfg.train else None,
        )
        sal = jnp.zeros((x.shape[0], 224, 224))
        return {"lstm": new_lstm, "batch_stats": {}}, action, sal

    return step, init_state
