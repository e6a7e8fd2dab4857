"""Production batch-inference API.

The reference has no serving surface — running its agent requires the full
training harness (env + agent + DataLoader, src/xview_et/main.py:253-288).
Here inference is one object: load a checkpoint once (ours or a released
torch ``best_val_unseen``), then map ANDH-format annotation items to
predicted trajectories with a compiled student-forced rollout
(``compute_losses=False`` — no ground truth required). Batches pad to a
fixed serving batch size so one compiled program handles any request size.

    nav = Navigator(args)                    # args: a parsed config.Args
    nav = Navigator.from_args(["--resume_file", ckpt, "--render_twopass", "True"])
    preds = nav.navigate(items)              # {instr_id: {path_corners, actions, progress}}

Fast modes (``--render_twopass``, ``--bf16``, folding) apply exactly as in
the eval driver; the map bank persists across calls so repeated requests on
the same tiles skip the GeoTIFF decode.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from avdn_tpu.config import Args


class Navigator:
    """Compiled closed-loop navigation for serving.

    ``serve_batch`` fixes the compiled batch size: shorter item lists are
    padded (padding items are dropped from the returned predictions), longer
    lists are chunked.
    """

    def __init__(self, args: Args, serve_batch: Optional[int] = None):
        import jax

        from avdn_tpu.data.batcher import make_train_batch  # noqa: F401
        from avdn_tpu.data.maps import DeviceMapBank
        from avdn_tpu.data.tokenizer import WordPieceTokenizer
        from avdn_tpu.parallel import setup_runtime
        from avdn_tpu.train import checkpoints as ckpt
        from avdn_tpu.train.loop import (
            batcher_config,
            build_models,
            eval_bf16,
            eval_config_from_args,
            init_state,
            resolve_render_crop,
        )
        from avdn_tpu.train.step import make_eval_rollout

        self.args = args
        self.serve_batch = serve_batch or args.batch_size
        self.runtime = setup_runtime(args, batch_size=self.serve_batch)
        args = resolve_render_crop(args)
        # serving uses the EVAL config: two-pass render + bf16 towers by
        # default (the shipped fast modes; --render_twopass False /
        # --bf16 False restore cv2/fp32 parity)
        self.cfg = eval_config_from_args(args)
        bert, darknet, vln = build_models(args, bf16=eval_bf16(args))
        state = init_state(args, bert, darknet, vln, self.cfg,
                           jax.random.PRNGKey(args.seed))
        if args.resume_file == "latest":
            from avdn_tpu.train.loop import _find_latest_checkpoint

            args.resume_file = _find_latest_checkpoint(args.ckpt_dir)
            if not args.resume_file:
                raise FileNotFoundError(
                    "--resume_file latest: no latest_dict_* checkpoint "
                    f"under {args.ckpt_dir}"
                )
        if args.resume_file:
            if os.path.isdir(args.resume_file):
                ckpt.wait_for_saves()
                state = ckpt.load_checkpoint(args.resume_file, state)
            else:  # released torch checkpoint
                bert_v, dk_v, vln_v, _ = ckpt.import_reference_agent(
                    args.resume_file, args.family, darknet.cfg.block_dicts(),
                    bert_layers=args.bert_layers,
                    et_layers=args.encoder_layers,
                )
                state = state.replace(
                    bert_params=bert_v["params"],
                    darknet_params=dk_v["params"],
                    batch_stats=dk_v.get("batch_stats", {}),
                    vln_params=vln_v["params"],
                )
        self.state = self.runtime.replicate(state)
        self.tokenizer = WordPieceTokenizer.load(args.bert_vocab_file)
        self.bcfg = batcher_config(args)
        self.bank = DeviceMapBank(
            args.val_dataset_dir, (args.map_bank_px, args.map_bank_px),
            n_slots=args.map_bank_slots,
            sharding=None if self.runtime.multiprocess
            else self.runtime.replicated,
        )
        self._rollout = jax.jit(make_eval_rollout(
            self.cfg, bert, darknet, vln, teacher=False,
            compute_losses=False,
        ))
        self._rng = jax.random.PRNGKey(args.seed)
        self._local_state = None  # multiprocess: host copy, fetched once
        # cumulative host/device phase profile of every navigate() call —
        # tools/bench_serving.py reports it; near-free to keep always-on
        from avdn_tpu.utils import PhaseTimer

        self.timers = PhaseTimer()

    @classmethod
    def from_args(cls, argv: Optional[List[str]] = None,
                  family: str = "et", **kw) -> "Navigator":
        from avdn_tpu.config import parse_args

        return cls(parse_args(argv, family=family), **kw)

    @staticmethod
    def _normalize_item(item: dict) -> dict:
        """Accept raw ANDH items; fill the GT-only fields serving doesn't
        need (losses are off) so the batcher's static shapes hold."""
        it = dict(item)
        it.setdefault("route_index", "0_1")
        it["angle"] = round(float(it["angle"])) % 360
        it["instructions"] = str(it["instructions"]).lower()
        pd = it.get("pre_dialogs", "")
        it["pre_dialogs"] = (" ".join(pd) if isinstance(pd, list)
                             else str(pd)).lower()
        start = np.asarray(it["gt_path_corners"][0]
                           if it.get("gt_path_corners")
                           else it["start_corners"], np.float64)
        it["gt_path_corners"] = [np.asarray(c, np.float64)
                                 for c in (it.get("gt_path_corners")
                                           or [start])]
        it.setdefault("attention_list", [])
        return it

    # -- pipeline stages ---------------------------------------------------
    # navigate() composes these; serve_http's dispatcher drives them
    # directly so the host assembly of request batch i+1 overlaps the
    # device rollout of batch i ACROSS requests (inside one navigate()
    # call the same overlap only engages when items > serve_batch).

    def prepare(self, chunk: List[dict]):
        """Host batch assembly (GeoTIFF decode into the persistent map
        bank, tokenisation, numpy batch build, device placement) for ONE
        ≤ ``serve_batch`` chunk of already-normalized items. Pure host +
        async-transfer work — safe to run while a previous ``launch`` is
        still executing on device (the bank update builds a NEW array; the
        in-flight rollout keeps its own)."""
        from avdn_tpu.data.batcher import make_train_batch

        chunk = list(chunk)
        while len(chunk) < self.serve_batch:  # pad; dropped via meta["valid"]
            chunk = chunk + [dict(chunk[0], _pad=True)]
        with self.timers("map_bank"):
            bank_arr, slot_of = self.bank.prepare(chunk)
        with self.timers("batch_build"):
            batch, meta = make_train_batch(chunk, self.tokenizer,
                                           slot_of, self.bcfg)
        if not self.runtime.multiprocess:
            with self.timers("device_place"):
                bank_arr = self.runtime.place_bank(bank_arr)
                batch = self.runtime.shard_batch(batch)
        return bank_arr, batch, meta

    def launch(self, prepared):
        """Dispatch the compiled rollout for a ``prepare``d chunk. Async —
        returns a pending handle immediately; the host is free to prepare
        the next chunk while the device runs."""
        import jax

        bank_arr, batch, meta = prepared
        state = self.state
        if self.runtime.multiprocess:
            # serving is per-process: use a local copy (mirrors _eval_env)
            if self._local_state is None:
                self._local_state = jax.device_get(self.state)
            state = self._local_state
        with self.timers("dispatch"):
            return self._rollout(state, bank_arr, batch, self._rng), meta

    def drain(self, pending) -> Dict[str, dict]:
        """Block on a ``launch``ed rollout and assemble its predictions."""
        import jax

        from avdn_tpu.metrics import assemble_trajectories

        out, meta = pending
        with self.timers("device_wait"):
            out = jax.device_get(out)
        with self.timers("assemble"):
            return assemble_trajectories(out, meta)

    def navigate(self, items: List[dict]) -> Dict[str, dict]:
        """Predicted trajectories for ANDH items, keyed by instr_id. Each
        record: ``path_corners`` [(corners (4,2) gps-offset, heading°), …],
        ``actions`` [[waypoint_ratio (2,), altitude], …], ``progress``."""
        items = [self._normalize_item(it) for it in items]
        preds: Dict[str, dict] = {}
        B = self.serve_batch

        def _chunks():
            for lo in range(0, len(items), B):
                yield items[lo : lo + B]

        many = len(items) > B
        if many:
            from avdn_tpu.data.prefetch import Prefetcher

            prepared = Prefetcher(_chunks(), self.prepare, depth=2)
        else:  # single chunk: a prefetch thread would only add latency
            prepared = (self.prepare(c) for c in _chunks())

        pending = None  # launched device call — drain one behind
        for prep in prepared:
            if pending is not None:
                preds.update(self.drain(pending))
            # launch is async; the host returns to assembling/draining
            pending = self.launch(prep)
        if pending is not None:
            preds.update(self.drain(pending))
        return preds
