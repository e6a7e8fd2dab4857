"""HTTP serving front-end (avdn_tpu.serve_http): stdlib server + request
coalescing over the Navigator. No reference analogue (the reference has no
serving surface, src/xview_et/main.py:253-288 is the closest flow)."""

import pytest

pytestmark = pytest.mark.e2e  # compile-heavy driver flow (tiered suite, README)

import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from fixtures import write_fixture_dataset
from test_e2e_loop import TINY_DARKNET_CFG, make_args


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """A tiny trained checkpoint behind a live HTTP server on a free port."""
    from avdn_tpu.serve import Navigator
    from avdn_tpu.serve_http import make_server
    from avdn_tpu.train.loop import train

    root = write_fixture_dataset(str(tmp_path_factory.mktemp("andh_http")))
    out = str(tmp_path_factory.mktemp("out_http"))
    cfg_path = os.path.join(out, "tiny_yolo.cfg")
    with open(cfg_path, "w") as f:
        f.write(TINY_DARKNET_CFG)
    targs = make_args(root, out, cfg_path, iters=1, log_every=1)
    train(targs)
    args = make_args(root, out, cfg_path,
                     resume_file=os.path.join(targs.ckpt_dir,
                                              "best_val_unseen"))
    nav = Navigator(args, serve_batch=4)
    server = make_server(nav, host="127.0.0.1", port=0, max_wait_ms=300.0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_port}"
    try:
        yield base, server, root
    finally:
        server.shutdown()
        server.service.close()


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


class TestServeHTTP:
    def test_healthz(self, served):
        base, server, root = served
        code, body = _get(base + "/healthz")
        assert code == 200
        assert body["status"] == "ok"
        assert body["serve_batch"] == 4

    def test_navigate_order_ids_and_json_shapes(self, served):
        base, server, root = served
        anno = os.path.join(root, "AVDN", "annotations", "val_seen_data.json")
        items = json.load(open(anno))[:2]
        code, body = _post(base + "/navigate", {"items": items})
        assert code == 200
        preds = body["predictions"]
        assert len(preds) == 2
        # request order preserved, client instr_ids restored
        for it, rec in zip(items, preds):
            assert rec["instr_id"] == it["map_name"] + "__" + it["route_index"]
        corners0, heading0 = preds[0]["path_corners"][0]
        assert np.asarray(corners0).shape == (4, 2)  # JSON lists, not numpy
        assert isinstance(heading0, (int, float))
        assert isinstance(preds[0]["actions"], list)

    def test_concurrent_requests_coalesce_into_one_batch(self, served):
        """4 concurrent single-item posts inside the 300 ms window must run
        as ONE device batch (serve_batch=4), each reply carrying its own
        item's prediction — the point of the coalescing dispatcher."""
        base, server, root = served
        anno = os.path.join(root, "AVDN", "annotations", "train_data.json")
        items = json.load(open(anno))[:4]
        # distinct instructions so cross-wired responses would be visible
        before = server.service.batches_run
        results = [None] * 4
        # warm the compiled program first so the timed window isn't racing
        # a cold jit compile
        _post(base + "/navigate", {"items": items[:1]})
        before = server.service.batches_run

        def go(i):
            it = dict(items[i], route_index=f"77_{i + 1}")
            results[i] = _post(base + "/navigate", {"items": [it]})

        ts = [threading.Thread(target=go, args=(i,)) for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        for i, (code, body) in enumerate(results):
            assert code == 200
            assert len(body["predictions"]) == 1
            want = items[i]["map_name"] + f"__77_{i + 1}"
            assert body["predictions"][0]["instr_id"] == want
        # all four inside one (or at worst two) coalesced device batches
        assert server.service.batches_run - before <= 2

    def test_burst_pipelines_multiple_batches(self, served):
        """A burst larger than serve_batch forces the dispatcher through
        ≥2 sequential device batches, i.e. the round-5 software pipeline:
        batch i+1 is prepared and launched BEFORE batch i's waiters are
        answered (serve_http._run). Every response must still carry its
        own items, in order."""
        base, server, root = served
        anno = os.path.join(root, "AVDN", "annotations", "train_data.json")
        items = json.load(open(anno))
        before = server.service.batches_run
        results = [None] * 6

        def go(i):
            # 2 items per request, 6 requests = 12 items >> serve_batch 4
            reqs = [dict(items[(i + k) % len(items)],
                         route_index=f"b{i}_{k + 1}") for k in range(2)]
            results[i] = _post(base + "/navigate", {"items": reqs})

        ts = [threading.Thread(target=go, args=(i,)) for i in range(6)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        for i, (code, body) in enumerate(results):
            assert code == 200
            assert len(body["predictions"]) == 2
            for k, rec in enumerate(body["predictions"]):
                want = (items[(i + k) % len(items)]["map_name"]
                        + f"__b{i}_{k + 1}")
                assert rec["instr_id"] == want
        assert server.service.batches_run - before >= 3  # really pipelined

    def test_duplicate_route_index_across_requests(self, served):
        """Two concurrent requests reusing the SAME route_index must not
        cross-wire: the service rewrites ids per request before merging."""
        base, server, root = served
        anno = os.path.join(root, "AVDN", "annotations", "train_data.json")
        raw = json.load(open(anno))[0]
        a = dict(raw, instructions="fly north")
        b = dict(raw, instructions="fly south to the red building")
        out = [None, None]

        def go(i, it):
            out[i] = _post(base + "/navigate", {"items": [it]})

        ts = [threading.Thread(target=go, args=(i, it))
              for i, it in enumerate((a, b))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        same_id = raw["map_name"] + "__" + raw["route_index"]
        for code, body in out:
            assert code == 200
            assert len(body["predictions"]) == 1
            assert body["predictions"][0]["instr_id"] == same_id

    def test_bad_requests(self, served):
        base, server, root = served
        code, body = _post(base + "/navigate", {"nope": 1})
        assert code == 400 and "error" in body
        code, body = _post(base + "/navigate", {"items": "not-a-list"})
        assert code == 400
        code, body = _get(base + "/nothing")
        assert code == 404
        # a malformed item is the CLIENT's fault: 400 (never 500), and the
        # message names the offending item and fields
        code, body = _post(base + "/navigate",
                           {"items": [{"instructions": "no map fields"}]})
        assert code == 400 and "item 0" in body["error"]
        code, body = _post(base + "/navigate", {"items": [17]})
        assert code == 400 and "item 0" in body["error"]

    def test_request_caps_413(self, served):
        """Oversized requests are rejected up front: a huge declared body
        before any bytes are read, and an over-long item list before any
        validation/dispatch work."""
        import http.client

        base, server, root = served
        host, port = base.split("//")[1].split(":")
        # declared 100 MB body, nothing actually sent — the server must
        # answer 413 without waiting for (or buffering) the body
        conn = http.client.HTTPConnection(host, int(port), timeout=30)
        conn.putrequest("POST", "/navigate")
        conn.putheader("Content-Type", "application/json")
        conn.putheader("Content-Length", str(100 * 1024 * 1024))
        conn.endheaders()
        resp = conn.getresponse()
        body = json.loads(resp.read())
        assert resp.status == 413 and "limit" in body["error"]
        conn.close()
        # more items than max_items: 413 before any per-item validation
        code, body = _post(base + "/navigate", {"items": [{}] * 1025})
        assert code == 413 and "1025 items" in body["error"]

    def test_empty_items_ok(self, served):
        base, server, root = served
        code, body = _post(base + "/navigate", {"items": []})
        assert code == 200 and body["predictions"] == []
