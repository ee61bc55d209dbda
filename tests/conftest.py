"""Test configuration: force CPU JAX with an 8-device virtual mesh.

Tests never require TPU hardware; multi-chip sharding is exercised on a
virtual 8-device CPU platform (the TPU-side analog of multi-node testing
without a cluster — SURVEY.md §4).

NOTE: this environment pre-imports jax at interpreter start (TPU plugin
registration), so JAX_PLATFORMS in os.environ is frozen before conftest
runs — we must override through jax.config instead.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    # Parity tests compare against torch/numpy float32 oracles; stop XLA
    # from downcasting conv/matmul inputs (the TPU path uses bf16 anyway).
    jax.config.update("jax_default_matmul_precision", "float32")
# JAX_TPU_TESTS=1 leaves the real backend in place so
# tests/test_tpu_hardware.py can run compiled-kernel checks on chip.
