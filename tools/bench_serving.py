"""End-to-end serving benchmark: the FULL stack, not just the device.

``bench.py``'s serving point measures the compiled rollout alone; this tool
measures what a deployment actually gets: N concurrent HTTP clients →
``serve_http`` front-end → coalescing dispatcher → ``Navigator`` (host
GeoTIFF decode, tokenisation, batch assembly with prefetch overlap) →
compiled rollout → JSON responses. Reports sustained episodes/sec and
request latency percentiles (after a warmup request that pays the compile).

Reference point being beaten: the reference's inference flow is the full
training harness run serially (src/xview_et/main.py:253-288) — it has no
serving stack at all.

    python tools/bench_serving.py                       # flagship, fixture data
    python tools/bench_serving.py --tiny                # CI-sized models
    python tools/bench_serving.py --root_dir ./datasets --resume_file ckpt

Prints one JSON line: {"serving_e2e_eps", "p50_ms", "p99_ms", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TINY_CFG = """
[net]
channels=3
height=224
width=224

[convolutional]
batch_normalize=1
filters=16
size=3
stride=8
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=4
pad=1
activation=leaky
"""


def _post(url, obj, timeout=1200):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def run(ns) -> dict:
    from avdn_tpu.config import Args, postprocess_args
    from avdn_tpu.serve import Navigator
    from avdn_tpu.serve_http import make_server

    root = ns.root_dir
    tmp = None
    if root is None:
        from avdn_tpu.data.demo import write_demo_dataset

        tmp = tempfile.mkdtemp(prefix="avdn_serve_bench_")
        # enough distinct episodes that clients don't all hit one item
        root = write_demo_dataset(tmp, n_train=16, n_val=8)
    over = {}
    if ns.tiny:
        cfg_path = os.path.join(tempfile.mkdtemp(), "tiny.cfg")
        with open(cfg_path, "w") as f:
            f.write(TINY_CFG)
        over = dict(demb=64, encoder_heads=4, encoder_layers=1,
                    bert_layers=2, max_instr_len=32, dialog_pad=64,
                    darknet_model_file=cfg_path, map_bank_px=256,
                    map_bank_slots=3)
    args = postprocess_args(Args(
        root_dir=root,
        output_dir=os.path.join(tempfile.mkdtemp(), "out"),
        batch_size=ns.serve_batch,
        max_action_len=ns.max_action_len,
        resume_file=ns.resume_file,
        bf16=ns.bf16,
        optim="adamW",
        **over,
    ))
    nav = Navigator(args, serve_batch=ns.serve_batch)
    server = make_server(nav, host="127.0.0.1", port=0,
                         max_wait_ms=ns.max_wait_ms)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.server_port}"

    anno = os.path.join(root, "AVDN", "annotations", "val_seen_data.json")
    pool = json.load(open(anno))

    # warmup: pays the jit compile + first GeoTIFF decodes
    _post(base + "/navigate", {"items": pool[: ns.items_per_request]})
    from avdn_tpu.utils import PhaseTimer

    nav.timers = PhaseTimer()  # profile the measured window only

    latencies, done = [], []
    lock = threading.Lock()

    def client(ci):
        for r in range(ns.requests_per_client):
            items = [dict(pool[(ci + r + k) % len(pool)],
                          route_index=f"c{ci}r{r}k{k}_1")
                     for k in range(ns.items_per_request)]
            t0 = time.perf_counter()
            out = _post(base + "/navigate", {"items": items})
            dt = time.perf_counter() - t0
            assert len(out["predictions"]) == len(items)
            with lock:
                latencies.append(dt)
                done.append(len(items))

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(ns.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    server.shutdown()
    server.service.close()

    lat_ms = sorted(1e3 * l for l in latencies)

    def pct(p):
        return round(lat_ms[min(len(lat_ms) - 1,
                                int(p / 100 * len(lat_ms)))], 1)

    out = {
        "serving_e2e_eps": round(sum(done) / wall, 2),
        "p50_ms": pct(50),
        "p99_ms": pct(99),
        "episodes": sum(done),
        "requests": len(latencies),
        "wall_s": round(wall, 2),
        "batches_run": server.service.batches_run,
        "clients": ns.clients,
        "items_per_request": ns.items_per_request,
        "serve_batch": ns.serve_batch,
        "T": ns.max_action_len,
        "config": "tiny" if ns.tiny else "flagship",
        "bf16": ns.bf16,
    }
    # cumulative Navigator host/device phase profile over the measured
    # window (serve.py instruments every navigate() call)
    out["nav_phase_profile"] = nav.timers.summary()
    if tmp:
        out["dataset"] = "demo-fixture"
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root_dir", default=None,
                    help="dataset root (default: generate a demo fixture)")
    ap.add_argument("--resume_file", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="CI-sized models instead of the flagship config")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--serve_batch", type=int, default=16)
    ap.add_argument("--max_action_len", type=int, default=5)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests_per_client", type=int, default=4)
    ap.add_argument("--items_per_request", type=int, default=4)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ns = ap.parse_args(argv)
    print(json.dumps(run(ns)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
