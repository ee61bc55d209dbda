"""Test configuration: force CPU JAX with an 8-device virtual mesh.

Tests never require TPU hardware; multi-chip sharding is exercised on a
virtual 8-device CPU platform (the TPU-side analog of multi-node testing
without a cluster — SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Parity tests compare against torch/numpy float32 oracles; stop XLA from
# downcasting conv/matmul inputs (the production TPU path uses bf16 anyway).
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "float32")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
