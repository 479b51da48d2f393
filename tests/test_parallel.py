"""Multi-chip tests on the virtual 8-device CPU mesh.

The reference has no distributed analog (SURVEY §2.6); the oracle is the
single-device propagate. These validate: partition bookkeeping, halo
all_to_all propagate == unsharded propagate, and gradient flow through the
collectives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import graphneuralnetworks_tpu as gnn
from graphneuralnetworks_tpu import ops
from graphneuralnetworks_tpu.parallel import (make_sharded_propagate,
                                              partition_graph,
                                              shard_partitioned)

NDEV = 8


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:NDEV]).reshape(NDEV)
    return Mesh(devs, ("graph",))


def test_partition_roundtrip():
    g = gnn.rand_graph(100, 400, seed=0)
    pg = partition_graph(g, 4)
    x = np.random.default_rng(0).standard_normal((int(g.num_nodes), 3))
    xs = pg.scatter_nodes(x)
    assert xs.shape == (4, pg.n_local, 3)
    back = pg.gather_nodes(xs)
    np.testing.assert_allclose(back, x)


def test_halo_propagate_matches_single_device(mesh):
    g = gnn.rand_graph(96, 512, seed=1)
    pg = partition_graph(g, NDEV)
    rng = np.random.default_rng(2)
    nn = int(g.num_nodes)
    x = rng.standard_normal((nn, 16)).astype(np.float32)

    # single-device oracle
    xg = jnp.zeros((g.n_pad, 16)).at[:nn].set(x)
    y_ref = ops.propagate(ops.copy_xj, g, "sum", xj=xg)

    run = make_sharded_propagate(mesh, pg)
    xs = pg.scatter_nodes(x)
    ys = run(xs, pg)
    y = pg.gather_nodes(ys)
    np.testing.assert_allclose(y, np.asarray(y_ref)[:nn], rtol=1e-4,
                               atol=1e-4)


def test_halo_propagate_weighted(mesh):
    w = np.random.default_rng(3).random(512).astype(np.float32)
    g = gnn.rand_graph(96, 512, seed=1, edge_weight=w)
    pg = partition_graph(g, NDEV)
    rng = np.random.default_rng(2)
    nn = int(g.num_nodes)
    x = rng.standard_normal((nn, 8)).astype(np.float32)
    xg = jnp.zeros((g.n_pad, 8)).at[:nn].set(x)
    y_ref = ops.propagate(ops.w_mul_xj, g, "sum", xj=xg, e=g.edge_weight)

    run = make_sharded_propagate(mesh, pg)
    ys = run(pg.scatter_nodes(x), pg)
    y = pg.gather_nodes(ys)
    np.testing.assert_allclose(y, np.asarray(y_ref)[:nn], rtol=1e-4,
                               atol=1e-4)


def test_gradient_through_halo_exchange(mesh):
    g = gnn.rand_graph(64, 256, seed=4)
    pg = partition_graph(g, NDEV)
    nn = int(g.num_nodes)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((nn, 4)).astype(np.float32)
    run = make_sharded_propagate(mesh, pg)

    def loss_sharded(xs):
        ys = run(xs, pg)
        return jnp.sum(jnp.where(pg.node_mask[..., None], ys, 0) ** 2)

    xs = pg.scatter_nodes(x)
    grad_sharded = pg.gather_nodes(jax.grad(loss_sharded)(xs))

    xg = jnp.zeros((g.n_pad, 4)).at[:nn].set(x)

    def loss_ref(xx):
        y = ops.propagate(ops.copy_xj, g, "sum", xj=xx)
        return jnp.sum(jnp.where(g.node_mask[:, None], y, 0) ** 2)

    grad_ref = np.asarray(jax.grad(loss_ref)(xg))[:nn]
    np.testing.assert_allclose(grad_sharded, grad_ref, rtol=1e-4, atol=1e-4)


def test_custom_parts(mesh):
    g = gnn.rand_graph(64, 256, seed=6)
    nn = int(g.num_nodes)
    parts = np.random.default_rng(7).integers(0, NDEV, nn)
    pg = partition_graph(g, NDEV, parts=parts)
    x = np.random.default_rng(8).standard_normal((nn, 4)).astype(np.float32)
    xg = jnp.zeros((g.n_pad, 4)).at[:nn].set(jnp.asarray(x))
    y_ref = ops.propagate(ops.copy_xj, g, "sum", xj=xg)
    run = make_sharded_propagate(mesh, pg)
    y = pg.gather_nodes(run(pg.scatter_nodes(x), pg))
    np.testing.assert_allclose(y, np.asarray(y_ref)[:nn], rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("weighted", [False, True])
def test_halo_propagate_kernel_matches_single_device(mesh, weighted):
    """Kernel-backed shard aggregation (spmm_aux) == unsharded propagate,
    forward and gradient."""
    w = (np.random.default_rng(7).random(512).astype(np.float32)
         if weighted else None)
    g = gnn.rand_graph(96, 512, seed=5, edge_weight=w)
    pg = partition_graph(g, NDEV, build_spmm_aux=True)
    assert pg.spmm_aux is not None
    pg_xla = __import__("dataclasses").replace(pg, spmm_aux=None)
    rng = np.random.default_rng(6)
    nn = int(g.num_nodes)
    x = rng.standard_normal((nn, 16)).astype(np.float32)

    xg = jnp.zeros((g.n_pad, 16)).at[:nn].set(x)
    y_ref = ops.propagate(ops.w_mul_xj if weighted else ops.copy_xj, g,
                          "sum", xj=xg)

    xs = pg.scatter_nodes(x)
    ys = make_sharded_propagate(mesh, pg)(xs, pg)
    y = pg.gather_nodes(ys)
    np.testing.assert_allclose(y, np.asarray(y_ref)[:nn], rtol=1e-4,
                               atol=1e-4)

    # gradient parity kernel vs XLA shard path
    t = jnp.asarray(rng.standard_normal(xs.shape), jnp.float32)

    def loss(xs, pg):
        return jnp.sum(make_sharded_propagate(mesh, pg)(xs, pg) * t)

    g1 = jax.grad(loss)(xs, pg)
    g2 = jax.grad(loss)(xs, pg_xla)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-4)
