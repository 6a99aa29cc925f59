"""Test configuration: force a CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count``), the standard way to validate
``jax.sharding`` programs without TPU pod hardware. Must run before jax's
backend initializes, hence the env mutation at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize imports jax at interpreter startup (before
# this conftest), freezing JAX_PLATFORMS=axon into jax's config — override
# through the config API, which works post-import as long as no backend has
# initialized yet.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_random_triples(rng, num_nodes, num_rels, num_edges, unique=True):
    """Random (s, p, o) triples; optionally deduplicated."""
    t = np.stack(
        [
            rng.integers(0, num_nodes, num_edges),
            rng.integers(0, num_rels, num_edges),
            rng.integers(0, num_nodes, num_edges),
        ],
        axis=1,
    )
    if unique:
        t = np.unique(t, axis=0)
    return t.astype(np.int64)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end tests (subprocess drives)"
    )
