"""tools/profile_train.py — xplane self-time attribution unit tests.

The tool parses raw XPlane protobufs (the tensorboard profile plugin's
converter is broken against the baked TF build, PERF.md "Train-step
profile"), so the nesting/self-time logic is ours and needs pinning:
XLA op-trace events NEST (``while`` envelopes its body ops) and async DMA
events SPAN the compute they overlap — a naive duration sum multi-counts
(observed 2921 "ms/step" vs the real 304 on the first capture).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

xplane_pb2 = pytest.importorskip(
    "tensorflow.tsl.profiler.protobuf.xplane_pb2")

import profile_train  # noqa: E402


def _make_space(tmp_path):
    """One device plane, one op line:

    while.1 [0, 100) containing fusion.2 [10, 40) and conv.3 [40, 90);
    copy-start.4 [0, 95) async DMA spanning everything;
    standalone dot.5 [100, 130).

    Self times: while.1 = 100-(30+50) = 20, fusion.2 = 30, conv.3 = 50,
    dot.5 = 30; async copy-start bucketed apart (95).
    """
    xs = xplane_pb2.XSpace()
    plane = xs.planes.add()
    plane.name = "/device:TPU:0"
    sm = plane.stat_metadata
    sm[1].id = 1
    sm[1].name = "hlo_category"
    sm[2].id = 2
    sm[2].name = "tf_op"
    sm[10].id = 10
    sm[10].name = "convolution fusion"

    def meta(mid, name, cat_ref=None, scope=None):
        em = plane.event_metadata[mid]
        em.id = mid
        em.name = name
        if cat_ref is not None:
            st = em.stats.add()
            st.metadata_id = 1
            st.ref_value = cat_ref
        if scope is not None:
            st = em.stats.add()
            st.metadata_id = 2
            st.str_value = scope
        return em

    meta(1, "%while.1 = while(...)")
    meta(2, "%fusion.2 = fusion(...)", cat_ref=10, scope="jit(step)/scan")
    meta(3, "%conv.3 = convolution(...)", cat_ref=10)
    meta(4, "%copy-start.4 = copy-start(...)")
    meta(5, "%dot.5 = dot(...)", cat_ref=10)

    line = plane.lines.add()
    line.name = "XLA Ops"
    line.timestamp_ns = 0
    G = 10 ** 9  # ps per ms: keep synthetic times at ms scale so the
    # tool's 3-decimal ms rounding doesn't flatten them
    for mid, off, dur in ((1, 0, 100), (2, 10, 30), (3, 40, 50),
                          (4, 0, 95), (5, 100, 30)):
        ev = line.events.add()
        ev.metadata_id = mid
        ev.offset_ps = off * G
        ev.duration_ps = dur * G

    path = tmp_path / "host.xplane.pb"
    path.write_bytes(xs.SerializeToString())
    return str(tmp_path)


def test_self_time_nesting_and_async(tmp_path):
    out = profile_train.analyze(_make_space(tmp_path), steps=1)
    ops = {r["op"]: r for r in out["top_ops"]}
    assert ops["conv.3"]["ms"] == pytest.approx(50.0, abs=1e-6)
    assert ops["fusion.2"]["ms"] == pytest.approx(30.0, abs=1e-6)
    assert ops["while.1"]["ms"] == pytest.approx(20.0, abs=1e-6)
    assert ops["dot.5"]["ms"] == pytest.approx(30.0, abs=1e-6)
    # async DMA bucketed apart, full span, NOT in op/category sums
    assert out["async_dma_ms"]["copy-start"] == pytest.approx(95.0, abs=1e-6)
    assert "copy-start.4" not in ops
    # category: the three categorized ops sum; while.1 has no category
    # stat and no hint match -> uncategorized
    assert out["by_category_ms"]["convolution fusion"] == pytest.approx(
        110.0, abs=1e-6)
    # totals: self-time sum == 130 (not 255, the naive duration sum)
    assert out["device_self_ms_total"] == pytest.approx(130.0, abs=1e-6)
    # busy union: [0,130) fully covered by sync ops
    assert out["device_busy_pct_of_span"] == pytest.approx(100.0, abs=0.1)
    # scope plumbed through
    assert ops["fusion.2"]["scope"] == "jit(step)/scan"
    assert ops["fusion.2"]["cat"] == "convolution fusion"


def test_host_planes_ignored(tmp_path):
    xs = xplane_pb2.XSpace()
    p = xs.planes.add()
    p.name = "/host:CPU"
    path = tmp_path / "h.xplane.pb"
    path.write_bytes(xs.SerializeToString())
    out = profile_train.analyze(str(tmp_path), steps=1)
    assert out["device_self_ms_total"] == 0.0
    assert out["top_ops"] == []


def test_missing_trace_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        profile_train.analyze(str(tmp_path), steps=1)
