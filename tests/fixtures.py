"""Test fixtures: thin re-export of the packaged demo-dataset generator
(avdn_tpu/data/demo.py) under the historical test-fixture names."""

from avdn_tpu.data.demo import DEG_TO_M, make_view, write_demo_dataset

write_fixture_dataset = write_demo_dataset

__all__ = ["DEG_TO_M", "make_view", "write_fixture_dataset",
           "write_demo_dataset"]
