"""Test harness: force an 8-virtual-device CPU platform BEFORE jax imports.

This is the TPU-world "multi-node without a cluster" mechanism (SURVEY.md
section 4): sharding tests run on a virtual 8-device CPU mesh; the driver
separately dry-run-compiles the multi-chip path via __graft_entry__.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The hosting environment pins jax_platforms to the TPU plugin, overriding
# the env var — force CPU explicitly before any backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_graph():
    from tip_tpu.data import synthetic_trigraph, build_trigraph

    raw = synthetic_trigraph(n_drug=50, n_prot=80, n_et=6, pairs_per_et=60, seed=3)
    return build_trigraph(raw, split_rate=0.85, seed=11)
