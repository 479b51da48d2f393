"""Test config: run the suite on a virtual 8-device CPU mesh.

Mirrors the reference's CPU CI (SURVEY §4.4); multi-chip sharding tests use
the forced host platform device count. Must set env before importing jax.
"""

import os

# Force CPU: the sandbox exports JAX_PLATFORMS=axon (tunneled TPU) and a
# sitecustomize registers the axon PJRT plugin at interpreter start, ignoring
# the env var — so set the config explicitly too (below, after import).
# Tests use the virtual 8-device CPU mesh; TPU-path coverage comes from
# bench.py / __graft_entry__ on hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Finite-difference gradient checks run in float64, like the reference's
# FiniteDifferences-based machinery (test_module.jl:59-64). CPU-only suite.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(17)


def _fixture_graphs():
    """The reference's two hand-written 4-node test graphs
    (GraphNeuralNetworks/test/test_module.jl:160-185): one fully-connected-ish
    directed graph and one with an isolated vertex."""
    import graphneuralnetworks_tpu as gnn
    adj1 = np.array([[0, 1, 0, 1],
                     [1, 0, 1, 0],
                     [0, 1, 0, 1],
                     [1, 0, 1, 0]], dtype=np.float32)
    adj_single_vertex = np.array([[0, 0, 0, 1],
                                  [0, 0, 0, 0],
                                  [0, 0, 0, 1],
                                  [1, 0, 1, 0]], dtype=np.float32)
    g1 = gnn.from_dense_adjacency(adj1)
    g2 = gnn.from_dense_adjacency(adj_single_vertex)
    return [g1, g2]


@pytest.fixture
def test_graphs():
    return _fixture_graphs()
