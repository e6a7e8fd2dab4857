"""Training / validation drivers — the reference's main.py flows, TPU-native.

Mirrors src/xview_et/main.py (and the near-identical LSTM main):
``build_dataset`` → train/val envs; ``train`` → interval loop of
``log_every`` epochs, checkpoint ``latest_dict_{iter}``, student-forced nav
eval + teacher-forced human-attention eval on every val env, best-by-SPL
checkpoint of val_unseen (main.py:150-250); ``valid`` → inference mode with
the Eval.ai ``output_test_result.npy`` dump for test_unseen (main.py:274-276).

Differences by design: evaluation reuses the in-memory TrainState with
deterministic/eval-mode flags instead of re-instantiating an agent and
re-reading the checkpoint from disk (main.py:182-187 — same math, no IO);
phase timers and JSONL metrics are always on.

Parallelism (the reference's multi-GPU driver initialises distributed mode,
main.py:294-304, but trains unsynced replicas — SURVEY §2.2; here it is
real): every run builds a ``parallel.setup_runtime`` mesh — parameters
replicated, train AND eval batches sharded over the ``data`` axis, XLA's
mean-gradient all-reduce inside the jitted step. Multi-process runs
additionally shard the dataset per process (per-rank seeds, main.py:304),
merge eval predictions with a pickle all-gather, and gate checkpoint/log
writes to process 0.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from avdn_tpu.config import Args
from avdn_tpu.data.annotations import ANDHDataset
from avdn_tpu.data.batcher import BatcherConfig, make_train_batch
from avdn_tpu.data.maps import DeviceMapBank
from avdn_tpu.data.tokenizer import WordPieceTokenizer
from avdn_tpu.metrics import assemble_trajectories, eval_metrics
from avdn_tpu.models import (
    BertConfig,
    BertLanguageEncoder,
    Darknet,
    DarknetConfig,
    HAATransformer,
    HAALSTM,
)
from avdn_tpu.models.et import ETConfig
from avdn_tpu.models.lstm import LSTMConfig, init_lstm_state
from avdn_tpu.train.step import (
    TrainConfig,
    create_train_state,
    make_train_step,
    make_eval_rollout,
    _darknet_channels,
)
from avdn_tpu.train import checkpoints as ckpt
from avdn_tpu.parallel import setup_runtime, merge_prediction_dicts
from avdn_tpu.parallel.runtime import ParallelRuntime
from avdn_tpu.utils import MetricWriter, PhaseTimer, set_random_seed, time_since
from avdn_tpu.utils.profiling import profile_trace


def train_bf16(args: Args) -> bool:
    """Training computes fp32 unless --bf16 True (reference numerics by
    default; the bf16 train recipe is opt-in / --preset production)."""
    return getattr(args, "bf16", None) is True


def eval_bf16(args: Args) -> bool:
    """Eval/serving towers default to bfloat16 compute on TPU — metric
    equivalence is golden-gated alongside the render modes
    (tests/test_render_mode_goldens.py 'twopass_bf16'); measured +36% eval
    throughput (PERF.md). CPU backends fall back to fp32 exactly like the
    render_bf16 einsums (sim/warp2pass.py) — bf16 there is emulated and
    slower. --bf16 True/False forces the choice on any backend."""
    flag = getattr(args, "bf16", None)
    if flag is None:
        return jax.default_backend() != "cpu"
    return bool(flag)


def build_models(args: Args, bf16: Optional[bool] = None):
    if bf16 is None:
        bf16 = train_bf16(args)
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    if args.demb == 768 and args.bert_layers == 12:
        bert_cfg = BertConfig()
    else:
        bert_cfg = BertConfig(
            hidden_size=args.demb,
            num_layers=args.bert_layers,
            num_heads=args.encoder_heads,
            intermediate_size=args.demb * 2,
        )
    bert = BertLanguageEncoder(bert_cfg, dtype=dtype)
    if args.darknet_model_file and os.path.exists(args.darknet_model_file):
        with open(args.darknet_model_file) as f:
            dk_cfg = DarknetConfig.from_text(f.read(), img_size=224)
    else:
        dk_cfg = DarknetConfig.default(img_size=224)
    darknet = Darknet(dk_cfg, dtype=dtype)
    if args.family == "et":
        vln = HAATransformer(
            ETConfig(
                demb=args.demb,
                encoder_heads=args.encoder_heads,
                encoder_layers=args.encoder_layers,
                dropout_transformer=args.dropout_transformer_encoder,
                dropout_emb=args.dropout_emb,
            ),
            dtype=dtype,
        )
    else:
        vln = HAALSTM(LSTMConfig(hidden_size=args.demb), dtype=dtype)
    return bert, darknet, vln


def init_state(args: Args, bert, darknet, vln, cfg: TrainConfig, rng):
    ks = jax.random.split(rng, 3)
    L = args.max_instr_len
    bert_vars = bert.init(
        ks[0], jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32)
    )
    if args.bert_weight_file and os.path.exists(args.bert_weight_file):
        # pretrained language-tower init, like the reference's
        # from_pretrained('bert-base-uncased') (vln_model.py:131); the
        # 64/49 head keeps the fresh random init above (reference parity)
        bert_vars = ckpt.import_bert_pretrain(
            args.bert_weight_file, num_layers=args.bert_layers,
            head_params=bert_vars["params"]["cls_head"],
        )
        print(f"Loaded BERT pretrain from {args.bert_weight_file}")
    dk_vars = darknet.init(ks[1], jnp.zeros((1, 224, 224, 3)), train=False)
    if args.darknet_weight_file and os.path.exists(args.darknet_weight_file):
        dk_vars = ckpt.import_darknet_pretrain(
            args.darknet_weight_file, darknet.cfg.block_dicts()
        )
        print(f"Loaded darknet pretrain from {args.darknet_weight_file}")
    feat_ch = _darknet_channels(darknet)
    if args.family == "et":
        vln_vars = vln.init(
            ks[2],
            jnp.zeros((1, L, args.demb)),
            jnp.zeros((1, 49)),
            jnp.zeros((1, cfg.max_action_len, feat_ch, 49)),
            jnp.zeros((1, cfg.max_action_len, 2)),
            jnp.ones((1,), jnp.int32),
        )
    else:
        st = init_lstm_state(1, vln.cfg)
        vln_vars = vln.init(
            ks[2],
            jnp.zeros((1, 1)),
            jnp.zeros((1, feat_ch, 49)),
            jnp.zeros((1, 49)),
            jnp.zeros((1, L, args.demb)),
            st,
        )
    return create_train_state(cfg, bert_vars, dk_vars, vln_vars)


def _auto_render_crop(anno_dir: str, splits) -> int:
    """Derive the two-pass warp crop from the dataset (shared formula:
    sim/warp2pass.auto_render_crop over the finest ``lat_ratio``). Scans the
    raw JSON for ``lat_ratio`` only (no full annotation normalisation)."""
    from avdn_tpu.sim.warp2pass import auto_render_crop

    lats = []
    for split in splits:
        path = os.path.join(anno_dir, f"{split}_data.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            lats.extend(it["lat_ratio"] for it in json.load(f))
    if not lats:
        return 512
    return auto_render_crop(min(lats))


def train_render_twopass(args: Args) -> bool:
    """Training renders exact (cv2-parity gather) unless --render_twopass
    True is passed explicitly."""
    return args.render_twopass is True


def eval_render_twopass(args: Args) -> bool:
    """Eval/serving render with the two-pass MXU warp BY DEFAULT (the
    shipped configuration — ~5x eval throughput; navigation-metric
    equivalence vs the exact render is golden-gated in
    tests/test_render_mode_goldens.py). ``--render_twopass False`` restores
    the strict cv2-parity gather."""
    return args.render_twopass is not False


def resolve_render_crop(args: Args) -> Args:
    """``--render_crop 0`` → auto-size from the annotations of EVERY split
    the run touches (a val map with finer lat_ratio needs a larger window
    than any train map)."""
    twopass_any = train_render_twopass(args) or eval_render_twopass(args)
    if twopass_any and args.render_crop == 0:
        splits = ["train", "val_seen", "val_unseen"]
        if args.submit:
            splits.append("test_unseen")
        args.render_crop = _auto_render_crop(args.train_anno_dir, splits)
        # stderr: tools that print a one-line JSON result to stdout
        # (tools/bench_serving.py, bench.py) load the driver too
        print(f"render_crop auto-derived: {args.render_crop}px",
              file=sys.stderr)
    elif args.render_crop == 0:
        args.render_crop = 512
    return args


def train_config_from_args(args: Args) -> TrainConfig:
    # the reference hard-asserts the optimizer choice (agent.py:152); a
    # typo'd --optim must fail loudly, never silently train with another one
    if args.optim not in ("adam", "adamW"):
        raise ValueError(
            f"--optim {args.optim!r} is not supported: the reference asserts "
            "optim in ('adam', 'adamW') (src/xview_et/agent.py:152) and so "
            "do we"
        )
    return TrainConfig(
        family=args.family,
        feedback=args.feedback,
        lr=args.lr,
        optim=args.optim,
        ml_weight=args.ml_weight,
        teacher_weight=args.teacher_weight,
        nss_w=args.nss_w,
        nss_r=args.nss_r,
        max_action_len=args.max_action_len,
        student_stop=0.25 if args.family == "lstm" else 0.5,
        darknet_in_vln=args.family == "lstm",
        single_bert_pass=args.train_val_on_full,
        language_only=args.language_only,
        vision_only=args.vision_only,
        no_direction=args.no_direction,
        render_subsample=args.render_subsample,
        render_twopass=train_render_twopass(args),
        render_crop=args.render_crop,
        render_bf16=args.render_bf16,
        fold_bn_eval=args.fold_bn_eval,
        grad_accum=args.grad_accum,
        remat=args.remat,
        remat_policy=args.remat_policy,
        fused_teacher=args.fused_teacher,
        fast_eval_trunk=args.fast_eval_trunk,
        et_decode_trunk=args.et_decode_trunk,
    )


def eval_config_from_args(args: Args) -> TrainConfig:
    """The eval/serving-side config: identical to the train config except
    the render mode, which defaults to the two-pass MXU warp (the shipped
    eval default — see :func:`eval_render_twopass`), and the opt-in
    quantized vision tower (``--quant int8``, eval-only by construction)."""
    import dataclasses

    return dataclasses.replace(train_config_from_args(args),
                               render_twopass=eval_render_twopass(args),
                               quant=getattr(args, "quant", "none"))


def batcher_config(args: Args) -> BatcherConfig:
    return BatcherConfig(
        max_gt_len=args.max_gt_len,
        max_circles=args.max_circles,
        instr_pad=args.max_instr_len,
        dialog_pad=args.dialog_pad,
        lang_dim=args.demb,
        vision_only=args.vision_only,
        single_bert_pass=args.train_val_on_full,
    )


def build_dataset(args: Args, runtime: Optional[ParallelRuntime] = None):
    ft = args.train_val_on_full  # full-trajectory concatenation mode
    shard, seed = None, args.seed
    if runtime is not None and runtime.multiprocess:
        # per-process train shard with a per-rank shuffle seed
        # (reference main.py:304 seeds per rank; sharding is the corrected
        # form of its unsynced replicas, SURVEY §2.2)
        shard = (runtime.process_index, runtime.process_count)
        seed = args.seed + runtime.process_index
    train_env = ANDHDataset(args.train_anno_dir, ["train"], args.batch_size,
                            seed=seed, full_traj=ft, shard=shard)
    val_names = ["val_seen", "val_unseen"]
    if args.submit:
        val_names.append("test_unseen")
    val_envs = {
        name: ANDHDataset(args.val_anno_dir, [name], args.batch_size,
                          seed=args.seed, full_traj=ft, shard=shard)
        for name in val_names
    }
    return train_env, val_envs


def _localize_eval_state(state):
    """Host copy of the eval-read TrainState fields (params, batch_stats,
    step); optimizer moment trees are replaced by None — the eval rollout
    never reads them and fetching them would quadruple the D2H bytes.
    Idempotent: an already-localized state passes through unchanged."""
    if state.opt_bert is None:
        return state
    return state.replace(
        step=jax.device_get(state.step),
        opt_bert=None, opt_darknet=None, opt_vln=None,
        **jax.device_get(dict(
            bert_params=state.bert_params,
            darknet_params=state.darknet_params,
            vln_params=state.vln_params,
            batch_stats=state.batch_stats,
        )),
    )


def _eval_env(args, env, eval_fn, state, tokenizer, bank, bcfg,
              rng, runtime: Optional[ParallelRuntime] = None,
              on_batch=None, profile_dir=None) -> Dict[str, dict]:
    """One full pass over a val env; returns preds keyed by instr_id.
    Wrap-around duplicate items overwrite by key (reference agent.test,
    agent.py:204-206). ``on_batch(out_host, meta)`` observes each batch's
    raw rollout outputs (debug-image dumps).

    Placement: single-process runs shard each eval batch over the runtime
    mesh; multi-process runs evaluate each process's dataset shard *locally*
    (the val env is already per-process) and union the prediction dicts
    across processes afterwards. ``profile_dir`` traces the FIRST batch only
    (a whole-validation trace is unbounded on real splits)."""
    preds: Dict[str, dict] = {}
    local_eval = runtime is not None and runtime.multiprocess
    if local_eval:
        # a process-local copy of ONLY what eval reads (params + BN stats):
        # eval then runs as an independent per-process program over local
        # devices only. The 3 AdamW moment trees (~3x the param bytes) are
        # dropped rather than fetched, and no global (non-addressable)
        # device array leaks into the per-process program.
        state = _localize_eval_state(state)

    def _prepare(items):
        """Host batch assembly — prefetched so GeoTIFF decode/tokenisation
        overlaps the device rollouts (the train loop does the same)."""
        bank_arr, slot_of = bank.prepare(items)
        batch, meta = make_train_batch(items, tokenizer, slot_of, bcfg)
        if runtime is not None and not local_eval:
            bank_arr = runtime.place_bank(bank_arr)
            batch = runtime.shard_batch(batch)
        return bank_arr, batch, meta

    if getattr(args, "prefetch", False):
        from avdn_tpu.data.prefetch import Prefetcher

        batches = Prefetcher(env, _prepare, depth=2)
    else:
        batches = (_prepare(items) for items in env)
    for bi, (bank_arr, batch, meta) in enumerate(batches):
        if profile_dir and bi == 0:
            with profile_trace(profile_dir):
                out = eval_fn(state, bank_arr, batch, rng)
                # device_get, not block_until_ready: the latter is not a
                # sync point on the remote backend (PERF.md methodology)
                out_host = jax.device_get(out)
        else:
            out = eval_fn(state, bank_arr, batch, rng)
            out_host = jax.device_get(out)
        preds.update(assemble_trajectories(out_host, meta))
        if on_batch is not None:
            on_batch(out_host, meta)
    if local_eval:
        preds = merge_prediction_dicts(preds)
    return preds


def _write_debug_images(args, env, preds, env_name):
    """Inference-mode trajectory overlays (agent.py:776-879 flow)."""
    from avdn_tpu.viz import save_debug_overlays
    from avdn_tpu.data.maps import load_map_image

    owned = getattr(env, "owned_instr_ids", None)
    items_by_id = {
        it["map_name"] + "__" + it["route_index"]: it for it in env.data
        # multi-process: wrap-around pad items are owned (and written) by
        # another process — skip them so no file is written twice
        if owned is None or it["map_name"] + "__" + str(it["route_index"]) in owned
    }
    host_maps = {}
    for it in items_by_id.values():
        nm = it["map_name"]
        if nm not in host_maps:
            try:
                host_maps[nm] = load_map_image(
                    os.path.join(args.val_dataset_dir, nm + ".tif"),
                    it["lng_ratio"], it["lat_ratio"],
                )
            except FileNotFoundError:
                pass
    save_debug_overlays(args.pred_dir, env_name, preds, host_maps, items_by_id)


def _write_saliency_debug(args, env_name, out, meta):
    """Per-step pred/GT attention heatmaps + input views during the
    teacher-forced HA eval in inference mode (agent.py:694-706): one jpg
    triple per item per step while the episode loop is still running."""
    from avdn_tpu.viz import save_saliency_heatmaps

    out_dir = os.path.join(args.pred_dir, "debug_images")
    alive_any = np.asarray(out.alive_pre).any(axis=1)  # (T,)
    pred = np.asarray(out.pred_sal)
    gt = np.asarray(out.gt_sal)
    views = np.asarray(out.views) if out.views is not None else None
    for t in range(pred.shape[0]):
        if not alive_any[t]:
            break
        for i, m in enumerate(meta):
            map_name, route = m["instr_id"].split("__", 1)
            tag = f"{env_name}val{map_name}_{route}"
            save_saliency_heatmaps(
                out_dir, tag, pred[t, i], gt[t, i],
                view=None if views is None else views[t, i], step=t,
            )


def run_validation(args, state, val_envs, eval_student, eval_teacher,
                   tokenizer, bank, bcfg, writer, step: int,
                   eval_student_test=None, eval_teacher_debug=None,
                   runtime: Optional[ParallelRuntime] = None,
                   profile_dir=None):
    """Student nav eval + teacher-forced HA eval over all val envs
    (main.py:188-239). Returns {env_name: avg_metrics}.

    With ``eval_teacher_debug`` (a collect_debug rollout) in inference mode,
    per-step saliency heatmaps are written to preds/debug_images
    (agent.py:694-706). In multi-process runs every process evaluates its
    val shard and the merged predictions produce identical metrics on every
    process; files (the Eval.ai npy) are written by process 0 only."""
    results = {}
    is_main = runtime is None or runtime.is_main
    if runtime is not None and runtime.multiprocess:
        # fetch the eval-read params once for the whole validation (every
        # _eval_env call below would otherwise repeat the D2H transfer)
        state = _localize_eval_state(state)
    # One fixed key for every eval batch, by design: eval runs
    # deterministic=True throughout (dropout off, BERT rngs unused), and the
    # only rng consumer left is the heading-loss jitter inside the unused
    # eval losses — reusing the key keeps evaluation exactly reproducible.
    rng = jax.random.PRNGKey(args.seed)
    loss_str = f"iter {step}"
    for ei, (env_name, env) in enumerate(val_envs.items()):
        fn = eval_student
        if "test" in env_name and eval_student_test is not None:
            fn = eval_student_test
        preds = _eval_env(args, env, fn, state, tokenizer, bank, bcfg, rng,
                          runtime=runtime,
                          profile_dir=profile_dir if ei == 0 else None)
        if "test_unseen" in env_name:
            if is_main:
                np.save("./output_test_result.npy", preds, allow_pickle=True)
                print("inference_result on test is generated.")
            continue
        if args.inference:
            _write_debug_images(args, env, preds, env_name)
        avg, _ = eval_metrics(preds)
        results[env_name] = avg
        loss_str += f", {env_name} " + "".join(
            f", {k}: {v:.2f}" for k, v in avg.items()
        )
        writer.scalars(step, {f"{k}/{env_name}": v for k, v in avg.items()})
    for env_name, env in val_envs.items():
        if "test_unseen" in env_name:
            continue
        teacher_fn, on_batch = eval_teacher, None
        if args.inference and eval_teacher_debug is not None:
            teacher_fn = eval_teacher_debug

            def on_batch(out, meta, _env=env_name):
                _write_saliency_debug(args, _env, out, meta)

        preds = _eval_env(args, env, teacher_fn, state, tokenizer, bank,
                          bcfg, rng, runtime=runtime, on_batch=on_batch)
        ha_avg, _ = eval_metrics(preds, human_att_eval=True)
        results[env_name + "_human_att"] = ha_avg
        loss_str += f", {env_name}_human_att " + "".join(
            f", {k}: {v:.2f}" for k, v in ha_avg.items()
        )
        writer.scalars(step, {f"{k}/{env_name}_ha": v for k, v in ha_avg.items()})
    writer.text(loss_str)
    return results


def _enable_compile_cache(args: Args):
    """Persistent XLA compilation cache — first compiles of the full stack
    are expensive; subsequent runs start instantly."""
    try:
        cache_dir = os.path.join(args.output_dir, ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def _find_latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Newest ``latest_dict_{iter}`` by iteration number, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        if name.startswith("latest_dict_"):
            try:
                n = int(name[len("latest_dict_"):])
            except ValueError:
                continue
            if best is None or n > best[0]:
                best = (n, name)
    return os.path.join(ckpt_dir, best[1]) if best else None


def _prune_checkpoints(ckpt_dir: str, keep: int):
    """Keep the ``keep`` newest ``latest_dict_*`` checkpoints (0 = keep all,
    the reference's behaviour — it never deletes). ``best_val_unseen`` is
    never pruned."""
    if keep <= 0 or not os.path.isdir(ckpt_dir):
        return
    import shutil

    entries = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("latest_dict_"):
            try:
                entries.append((int(name[len("latest_dict_"):]), name))
            except ValueError:
                continue
    for _, name in sorted(entries)[:-keep]:
        shutil.rmtree(os.path.join(ckpt_dir, name), ignore_errors=True)


def _check_dataset(args: Args, splits):
    """Fail fast (before the expensive model init) when the dataset is
    missing, with a message that names the flag to fix."""
    missing = [
        s for s in splits
        if not os.path.exists(os.path.join(args.train_anno_dir, f"{s}_data.json"))
    ]
    if missing:
        raise FileNotFoundError(
            f"annotation files for splits {missing} not found under "
            f"{args.train_anno_dir} — point --root_dir at a dataset root "
            "containing AVDN/{annotations,train_images}"
        )


def train(args: Args):
    runtime = setup_runtime(args)
    # per-rank host seeds (reference main.py:304 seed+rank); model init below
    # uses PRNGKey(args.seed) explicitly, so params are identical on every
    # process regardless
    set_random_seed(args.seed + runtime.process_index)
    _check_dataset(args, ["train", "val_seen", "val_unseen"])
    _enable_compile_cache(args)
    args = resolve_render_crop(args)
    cfg = train_config_from_args(args)
    bert, darknet, vln = build_models(args)
    state = init_state(args, bert, darknet, vln, cfg, jax.random.PRNGKey(args.seed))
    tokenizer = WordPieceTokenizer.load(args.bert_vocab_file)
    bcfg = batcher_config(args)
    bank = DeviceMapBank(
        args.train_dataset_dir, (args.map_bank_px, args.map_bank_px),
        n_slots=args.map_bank_slots,
        sharding=None if runtime.multiprocess else runtime.replicated,
    )
    log_dir = (args.log_dir if runtime.is_main
               else os.path.join(args.log_dir, f"proc{runtime.process_index}"))
    writer = MetricWriter(log_dir, "train.txt")
    writer.text(runtime.describe())
    if runtime.is_main:
        with open(os.path.join(args.log_dir, "training_args.json"), "w") as f:
            json.dump(vars(args), f, indent=4, default=str)

    train_env, val_envs = build_dataset(args, runtime)
    # donate the incoming state: params/opt buffers are updated in place
    # instead of doubling HBM residency across the step boundary
    train_step = jax.jit(make_train_step(cfg, bert, darknet, vln),
                         donate_argnums=0)
    if runtime.multiprocess:
        # AOT-compile + host barrier before first execution: keeps the
        # per-process compile skew out of the communicator connect window
        from avdn_tpu.parallel.runtime import CompileSynced

        train_step = CompileSynced(train_step, "train_step")
    ecfg = eval_config_from_args(args)  # eval default: two-pass render
    # eval towers may run a different compute dtype than training (shipped:
    # bf16 eval / fp32 train) — same fp32 params, modules rebuilt with the
    # eval dtype only when it differs
    if eval_bf16(args) != train_bf16(args):
        ebert, edarknet, evln = build_models(args, bf16=eval_bf16(args))
    else:
        ebert, edarknet, evln = bert, darknet, vln
    eval_student = jax.jit(make_eval_rollout(ecfg, ebert, edarknet, evln,
                                             teacher=False))
    eval_teacher = jax.jit(make_eval_rollout(ecfg, ebert, edarknet, evln,
                                             teacher=True, collect_ha=True))
    eval_student_test = (
        jax.jit(make_eval_rollout(ecfg, ebert, edarknet, evln, teacher=False,
                                  compute_losses=False))
        if args.submit else None
    )

    start_iter = 0
    if args.resume_file == "latest":
        # production auto-resume: newest latest_dict_* in this run's ckpt
        # dir, or a fresh start when none exists (restart-safe launcher)
        args.resume_file = _find_latest_checkpoint(args.ckpt_dir)
        writer.text(f"auto-resume: {args.resume_file or 'no checkpoint, fresh start'}")
    if args.resume_file:
        ckpt.wait_for_saves()  # the file may be an in-flight async write
        fresh = state
        state = ckpt.load_checkpoint(args.resume_file, state)
        if not args.resume_optimizer:
            # params-only resume (reference default, agent.py:936-937)
            state = state.replace(
                opt_bert=fresh.opt_bert,
                opt_darknet=fresh.opt_darknet,
                opt_vln=fresh.opt_vln,
            )
        start_iter = int(jax.device_get(state.step))
        writer.text(f"\nLOAD the model from {args.resume_file}, iteration {start_iter}")

    # replicate params/optimizer over the data mesh (after resume so the
    # loaded state is what gets placed); the jitted step then emits the
    # mean-gradient all-reduce over the sharded batch
    state = runtime.replicate(state)
    # failure detection: a divergent resume (e.g. node-local ckpt_dir on a
    # pod) would otherwise train silently split replicas
    runtime.assert_replicas_identical(state)

    if args.eval_first:
        run_validation(args, state, val_envs, eval_student, eval_teacher,
                       tokenizer, bank, bcfg, writer, start_iter,
                       eval_student_test, runtime=runtime)

    best_val = {"val_unseen": {"spl": 0.0, "state": ""}}
    interval = max(int(train_env.size() / args.batch_size), 1) * args.log_every
    timers = PhaseTimer()
    rng = jax.random.PRNGKey(args.seed + 1)
    start = time.time()
    interval_t0 = time.time()

    def _prepare(items):
        """Host batch assembly (bank placement + numpy batch build + mesh
        sharding) — runs on the prefetch thread when --prefetch is on."""
        with timers("map_bank"):
            bank_arr, slot_of = bank.prepare(items)
            if runtime.multiprocess:
                # all processes must agree on the compiled bank shape
                runtime.sync_bank_growth(bank)
                bank_arr = bank.array
            bank_arr = runtime.place_bank(bank_arr)
        with timers("batch_build"):
            batch, _ = make_train_batch(items, tokenizer, slot_of, bcfg)
            batch = runtime.shard_batch(batch)
        return bank_arr, batch

    def _epoch_batches():
        # multi-process: bank-growth sync is a collective — keep it on the
        # main thread (a prefetch thread could interleave it with the train
        # step's collectives and deadlock)
        if args.prefetch and not runtime.multiprocess:
            from avdn_tpu.data.prefetch import Prefetcher
            return Prefetcher(train_env, _prepare, depth=2)
        return (_prepare(items) for items in train_env)

    # preemption: SIGTERM → flag → consensus save + clean exit (the grace
    # window is short; auto-resume picks the saved step back up)
    guard = None
    if getattr(args, "preempt_save", True):
        from avdn_tpu.utils.preemption import PreemptionGuard

        guard = PreemptionGuard().install()

    n_steps = 0
    preempted = False
    for idx in range(start_iter, start_iter + args.iters, interval):
        it = idx + interval
        losses = []
        for _epoch in range(args.log_every):
            for bank_arr, batch in _epoch_batches():
                with timers("train_step"):
                    rng, r = jax.random.split(rng)
                    if args.profile_dir and n_steps == 1:
                        # trace the second step — the first one compiles;
                        # device_get forces completion inside the trace
                        # (block_until_ready is not a sync point here)
                        with profile_trace(args.profile_dir):
                            state, metrics = train_step(state, bank_arr, batch, r)
                            jax.device_get(metrics["loss"])
                        writer.text(f"profiler trace written to {args.profile_dir}")
                    else:
                        state, metrics = train_step(state, bank_arr, batch, r)
                losses.append(metrics["loss"])
                n_steps += 1
                # consensus per step (collective in multiprocess mode):
                # every replica must agree to stop at the same step
                if guard is not None and runtime.any_flag(guard.triggered):
                    preempted = True
                    break
            if preempted:
                break
        if preempted:
            step_now = int(jax.device_get(state.step))
            if runtime.is_main:
                ckpt.save_checkpoint(args.ckpt_dir, f"latest_dict_{step_now}",
                                     state, asynchronous=False)
            ckpt.wait_for_saves()
            writer.text(
                f"\npreemption signal — saved latest_dict_{step_now}, "
                "exiting cleanly (relaunch with --resume_file latest)"
            )
            break
        il_loss = float(np.mean([jax.device_get(l) for l in losses]))
        # interval throughput: global episodes per wall-second (all phases,
        # incl. host assembly; the phase-timer line splits it out)
        dt_interval = time.time() - interval_t0
        eps = len(losses) * args.batch_size * runtime.process_count / max(
            dt_interval, 1e-9)
        writer.scalars(it, {"loss/IL_loss": il_loss,
                            "throughput/train_eps": eps})
        writer.text(f"\nIL_loss {il_loss:.4f}  ({eps:.1f} episodes/s)")
        writer.text(f"phase timers: {timers.summary()}")

        # checkpoints are written by process 0 only; synchronous there —
        # orbax's async path can barrier across jax processes, which would
        # deadlock against processes that never call save
        do_async = args.async_ckpt and not runtime.multiprocess
        if runtime.is_main:
            ckpt.save_checkpoint(args.ckpt_dir, f"latest_dict_{it}", state,
                                 asynchronous=do_async)
            if args.ckpt_keep > 0:
                ckpt.wait_for_saves()  # never prune an in-flight write
                _prune_checkpoints(args.ckpt_dir, args.ckpt_keep)
        results = run_validation(args, state, val_envs, eval_student,
                                 eval_teacher, tokenizer, bank, bcfg, writer,
                                 it, eval_student_test, runtime=runtime)
        if "val_unseen" in results:
            spl = results["val_unseen"].get("spl", 0.0)
            if spl >= best_val["val_unseen"]["spl"]:
                best_val["val_unseen"]["spl"] = spl
                best_val["val_unseen"]["state"] = f"Iter {it} spl {spl:.2f}"
                if runtime.is_main:
                    ckpt.save_checkpoint(args.ckpt_dir, "best_val_unseen",
                                         state, asynchronous=do_async)
        writer.text(
            f"{time_since(start, (it - start_iter) / args.iters)} iter {it} "
            f"BEST: {best_val['val_unseen']['state']}"
        )
        # reset AFTER checkpointing + validation so the next interval's
        # logged episodes/s covers training time only (not the previous
        # interval's full val pass)
        interval_t0 = time.time()
    if guard is not None:
        guard.uninstall()
    ckpt.wait_for_saves()
    writer.close()


def valid(args: Args):
    """Inference mode (main.py:253-288)."""
    runtime = setup_runtime(args)
    set_random_seed(args.seed + runtime.process_index)
    _check_dataset(args, ["val_seen", "val_unseen"])
    _enable_compile_cache(args)
    args = resolve_render_crop(args)
    cfg = train_config_from_args(args)
    # inference driver: towers run the EVAL compute dtype (shipped: bf16 on
    # TPU); params stay fp32 so checkpoint load/import is dtype-agnostic
    bert, darknet, vln = build_models(args, bf16=eval_bf16(args))
    state = init_state(args, bert, darknet, vln, cfg, jax.random.PRNGKey(args.seed))
    if args.resume_file == "latest":
        # same sentinel train() honors; inference has no fresh-start
        # fallback — evaluating random weights is never what was asked
        args.resume_file = _find_latest_checkpoint(args.ckpt_dir)
        if not args.resume_file:
            raise FileNotFoundError(
                f"--resume_file latest: no latest_dict_* checkpoint under "
                f"{args.ckpt_dir}"
            )
    if args.resume_file:
        if os.path.isdir(args.resume_file):
            ckpt.wait_for_saves()  # may be an in-flight async write
            state = ckpt.load_checkpoint(args.resume_file, state)
        else:
            # released torch checkpoint
            bert_v, dk_v, vln_v, epoch = ckpt.import_reference_agent(
                args.resume_file, args.family, darknet.cfg.block_dicts(),
                bert_layers=args.bert_layers, et_layers=args.encoder_layers,
            )
            state = state.replace(
                bert_params=bert_v["params"],
                darknet_params=dk_v["params"],
                batch_stats=dk_v.get("batch_stats", {}),
                vln_params=vln_v["params"],
            )
            print(f"Imported reference checkpoint (epoch {epoch})")
    tokenizer = WordPieceTokenizer.load(args.bert_vocab_file)
    bcfg = batcher_config(args)
    bank = DeviceMapBank(
        args.val_dataset_dir, (args.map_bank_px, args.map_bank_px),
        n_slots=args.map_bank_slots,
        sharding=None if runtime.multiprocess else runtime.replicated,
    )
    log_dir = (args.log_dir if runtime.is_main
               else os.path.join(args.log_dir, f"proc{runtime.process_index}"))
    writer = MetricWriter(log_dir, "valid.txt")
    writer.text(runtime.describe())
    if runtime.is_main:
        with open(os.path.join(args.log_dir, "validation_args.json"), "w") as f:
            json.dump(vars(args), f, indent=4, default=str)
    _, val_envs = build_dataset(args, runtime)
    ecfg = eval_config_from_args(args)  # eval default: two-pass render
    eval_student = jax.jit(make_eval_rollout(ecfg, bert, darknet, vln,
                                             teacher=False))
    eval_teacher = jax.jit(make_eval_rollout(ecfg, bert, darknet, vln,
                                             teacher=True, collect_ha=True))
    eval_teacher_debug = (
        jax.jit(make_eval_rollout(ecfg, bert, darknet, vln, teacher=True,
                                  collect_ha=True, collect_debug=True))
        if args.inference else None
    )
    eval_student_test = (
        jax.jit(make_eval_rollout(ecfg, bert, darknet, vln, teacher=False,
                                  compute_losses=False))
        if args.submit else None
    )
    state = runtime.replicate(state)
    runtime.assert_replicas_identical(state)
    run_validation(args, state, val_envs, eval_student, eval_teacher,
                   tokenizer, bank, bcfg, writer,
                   int(jax.device_get(state.step)),
                   eval_student_test, eval_teacher_debug=eval_teacher_debug,
                   runtime=runtime,
                   # trace the first eval batch only — a whole-validation
                   # trace is unbounded on the real 781-episode splits
                   profile_dir=args.profile_dir or None)
    writer.close()
