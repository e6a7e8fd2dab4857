"""Utility-layer tests: logging, timers, collectives (single-process)."""

import json
import os
import time

import numpy as np

from avdn_tpu.utils import (
    write_to_record_file, time_since, PhaseTimer, MetricWriter, print_progress,
)
from avdn_tpu.parallel.collectives import (
    init_distributed, all_gather_metrics, reduce_mean_metrics,
)


class TestLogging:
    def test_record_file(self, tmp_path):
        p = str(tmp_path / "rec.txt")
        write_to_record_file("hello", p, verbose=False)
        write_to_record_file("world", p, verbose=False)
        assert open(p).read().splitlines() == ["hello", "world"]

    def test_time_since(self):
        s = time_since(time.time() - 30, 0.5)
        assert "m" in s and "-" in s

    def test_phase_timer(self):
        t = PhaseTimer()
        with t("a"):
            time.sleep(0.01)
        with t("b"):
            pass
        assert t.totals["a"] >= 0.01
        assert "a:" in t.summary()

    def test_metric_writer_jsonl(self, tmp_path):
        w = MetricWriter(str(tmp_path))
        w.scalars(1, {"x": 1.5})
        w.scalars(2, {"x": 2.5, "y": 0.0})
        w.text("line")
        w.close()
        recs = [json.loads(l) for l in open(w.jsonl_path)]
        assert recs[0] == {"step": 1, "x": 1.5}
        assert os.path.exists(w.record_path)


class TestCollectives:
    def test_single_process(self):
        assert init_distributed() == 0
        rows = all_gather_metrics({"a": 1.0, "b": 2.0})
        assert rows == [{"a": 1.0, "b": 2.0}]
        avg = reduce_mean_metrics({"a": 3.0})
        assert avg == {"a": 3.0}


class TestPrefetcher:
    def test_order_and_completion(self):
        from avdn_tpu.data.prefetch import Prefetcher

        seen = []
        pf = Prefetcher(range(20), lambda x: x * x, depth=3)
        for v in pf:
            seen.append(v)
        assert seen == [i * i for i in range(20)]

    def test_producer_exception_surfaces(self):
        from avdn_tpu.data.prefetch import Prefetcher

        def boom(x):
            if x == 3:
                raise ValueError("boom")
            return x

        import pytest as _pytest
        with _pytest.raises(ValueError, match="boom"):
            list(Prefetcher(range(10), boom))

    def test_slow_consumer_backpressure(self):
        import time
        from avdn_tpu.data.prefetch import Prefetcher

        produced = []

        def prep(x):
            produced.append(x)
            return x

        pf = Prefetcher(range(100), prep, depth=2)
        it = iter(pf)
        next(it)
        time.sleep(0.05)
        # queue depth bounds run-ahead: consumer took 1, queue holds <= 2(+1)
        assert len(produced) <= 5
        assert list(it) == list(range(1, 100))


class TestDebugCensus:
    def test_census_sees_live_arrays(self):
        import jax.numpy as jnp
        from avdn_tpu.utils.debug import device_memory_census, format_memory_census

        keep = jnp.ones((64, 128), jnp.float32)
        rows = device_memory_census()
        assert any(k == "float32[64, 128]" for k, n, b in rows), rows
        row = next(r for r in rows if r[0] == "float32[64, 128]")
        assert row[2] >= 64 * 128 * 4
        text = format_memory_census()
        assert "total live device memory" in text
        del keep
