"""Test configuration: force the local CPU backend with 8 virtual devices.

The session environment pins JAX_PLATFORMS=axon (the tunneled TPU chip) via a
patched jax import, so plain env vars are not enough — we override the config
knob directly before any backend is initialized. Sharding tests then see an
8-device CPU mesh, mirroring a v5e host slice.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

CITESEER = "/root/reference/inputs/citeseer/graph"
MICO = "/root/reference/inputs/mico/graph"


@pytest.fixture(scope="session")
def citeseer():
    from graphminer_tpu import load_graph
    return load_graph(CITESEER, use_vlabel=True, use_elabel=True)


@pytest.fixture(scope="session")
def rand_graphs():
    """Small random graphs for differential testing against brute force."""
    from graphminer_tpu.core.graph import HostGraph
    rng = np.random.default_rng(0)
    out = []
    for n, p in [(24, 0.25), (40, 0.15), (64, 0.1), (80, 0.3)]:
        m = rng.random((n, n)) < p
        m = np.triu(m, 1)
        src, dst = np.nonzero(m)
        g = HostGraph.from_edges(src, dst, n, symmetrize=True)
        out.append(g)
    return out
