"""Test configuration.

Forces JAX onto CPU with 8 virtual devices BEFORE jax is imported anywhere, so
mesh/pjit/sharding tests run single-process without TPU hardware (SURVEY.md §4
item 5). fp32 on CPU also gives bit-exact parity with the torch reference.
"""

import os
import sys
from pathlib import Path

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import jax  # noqa: E402

# The axon sitecustomize pre-imports jax at interpreter start, so env vars
# alone are too late — force the platform through the live config (must
# happen before any backend use).
jax.config.update("jax_platforms", "cpu")

# JAX CPU's default matmul precision is reduced (~bf16 accumulation); parity
# tests against torch/numpy need true fp32. The framework itself leaves
# precision at the platform default (bf16 on the TPU MXU is the perf path).
jax.config.update("jax_default_matmul_precision", "highest")
