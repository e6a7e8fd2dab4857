"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the TPU-world "fake cluster" pattern — multi-device sharding tests
run on CPU via ``xla_force_host_platform_device_count`` (no TPU pod needed).

Note: this environment pre-registers an ``axon`` TPU backend via
sitecustomize and sets ``jax_platforms`` to ``axon,cpu``; overriding the env
var is not enough, we must update jax.config before any backend is touched.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
