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


# ---------------------------------------------------------------------------
# round 2: the REAL layer zoo under the mesh (ShardGraph + make_sharded_apply)
# ---------------------------------------------------------------------------

from flax import nnx  # noqa: E402

from graphneuralnetworks_tpu import models as M  # noqa: E402
from graphneuralnetworks_tpu.parallel import make_sharded_apply  # noqa: E402


def _x(g, d=16, seed=2):
    nn_ = int(g.num_nodes)
    x = np.random.default_rng(seed).standard_normal((nn_, d)) \
        .astype(np.float32)
    xg = jnp.zeros((g.n_pad, d)).at[:nn_].set(x)
    return x, xg, nn_


def _run_sharded(mesh, pg, layer, x):
    graphdef, state = nnx.split(layer)

    def fn(st, sg, x_own):
        return nnx.merge(graphdef, st)(sg, x_own)

    run = make_sharded_apply(mesh, pg, fn)
    return run, state, pg.scatter_nodes(x)


@pytest.mark.parametrize("mk,needs_aux", [
    (lambda: M.GCNConv(16, 8, jax.nn.relu, rngs=nnx.Rngs(0)), False),
    (lambda: M.GCNConv(16, 8, use_edge_weight=True, rngs=nnx.Rngs(0)), False),
    (lambda: M.SAGEConv(16, 8, rngs=nnx.Rngs(0)), False),          # mean
    (lambda: M.GraphConv(16, 8, aggr="max", rngs=nnx.Rngs(0)), False),
    (lambda: M.GraphConv(16, 8, aggr="min", rngs=nnx.Rngs(0)), False),
    (lambda: M.GATConv(16, 4, heads=2, rngs=nnx.Rngs(0)), False),
    (lambda: M.GATv2Conv(16, 4, heads=2, rngs=nnx.Rngs(0)), False),
    (lambda: M.GINConv(M.MLP([16, 16, 8], rngs=nnx.Rngs(0)), 0.1), False),
    (lambda: M.TransformerConv(16, 4, heads=2, add_self_loops=True,
                               rngs=nnx.Rngs(0)), False),
    (lambda: M.GCNConv(16, 8, jax.nn.relu, rngs=nnx.Rngs(0)), True),
    (lambda: M.GATConv(16, 4, heads=2, rngs=nnx.Rngs(0)), True),
])
def test_sharded_layer_matches_single_device(mesh, mk, needs_aux):
    """Each REAL layer, run unmodified under the 8-way mesh, must equal the
    single-device forward (GNNlib msgpass.jl:69-156 semantics, sharded)."""
    g = gnn.rand_graph(96, 512, seed=7, bidirected=True,
                       edge_weight=np.random.default_rng(7)
                       .random(512).astype(np.float32))
    pg = partition_graph(g, NDEV, build_spmm_aux=needs_aux)
    layer = mk()
    x, xg, nn_ = _x(g)
    y_ref = np.asarray(layer(g, xg))[:nn_]
    run, state, xs = _run_sharded(mesh, pg, layer, x)
    ys = jax.jit(run)(state, xs, pg)
    y = pg.gather_nodes(ys)
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-5)


def test_sharded_chain_grads_match_single_device(mesh):
    """Forward+grad of a GCN->GAT chain under the mesh == single device,
    for params and input features (through all_to_all transposes)."""
    g = gnn.rand_graph(64, 256, seed=1, bidirected=True)
    pg = partition_graph(g, NDEV, build_spmm_aux=True)
    chain = M.GNNChain(
        M.GCNConv(16, 16, jax.nn.relu, rngs=nnx.Rngs(0)),
        M.GATConv(16, 8, heads=2, concat=False, rngs=nnx.Rngs(1)))
    x, xg, nn_ = _x(g)
    graphdef, state = nnx.split(chain)

    def fn(st, sg, x_own):
        return nnx.merge(graphdef, st)(sg, x_own)

    run = make_sharded_apply(mesh, pg, fn)
    xs = pg.scatter_nodes(x)
    nm = jnp.asarray(np.asarray(pg.node_mask))

    def loss_sh(st, xs):
        ys = run(st, xs, pg)
        return jnp.sum(jnp.where(nm[..., None], ys, 0) ** 2)

    def loss_ref(st, xg):
        return jnp.sum(nnx.merge(graphdef, st)(g, xg)[:nn_] ** 2)

    gs_sh = jax.jit(jax.grad(loss_sh))(state, xs)
    gs_ref = jax.jit(jax.grad(loss_ref))(state, xg)
    for a, b in zip(jax.tree_util.tree_leaves(gs_sh),
                    jax.tree_util.tree_leaves(gs_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
    gx = pg.gather_nodes(jax.jit(jax.grad(loss_sh, argnums=1))(state, xs))
    gx_ref = np.asarray(
        jax.jit(jax.grad(lambda z: loss_ref(state, z)))(xg))[:nn_]
    np.testing.assert_allclose(gx, gx_ref, rtol=1e-3, atol=1e-5)


def test_sharded_softmax_edge_neighbors(mesh):
    """softmax_edge_neighbors (GNNlib utils.jl:84-97) is local per shard —
    every in-edge of an owned node lives on its shard."""
    g = gnn.rand_graph(48, 192, seed=3, bidirected=True)
    pg = partition_graph(g, NDEV)
    ne = int(g.num_edges)
    logits = np.random.default_rng(3).standard_normal((ne,)) \
        .astype(np.float32)
    lg = jnp.zeros((g.e_pad,)).at[:ne].set(logits)
    alpha_ref = np.asarray(ops.softmax_edge_neighbors(g, lg))

    # map global edge order -> shard-local edge order by (receiver-part, pos)
    def fn(_, sg, x_own):
        e_local = sg.receivers.shape[0]
        return ops.softmax_edge_neighbors(sg, x_own[:e_local, 0])

    # ship per-edge logits through the "node" slot: build a per-shard edge
    # array instead by packing logits along the partition's edge layout
    r = np.asarray(g.receivers)[:ne]
    parts = np.asarray(pg.node_global)
    # reconstruct each shard's edge list: edges sorted by receiver, grouped
    # by receiver part, preserving order (partition.py keeps global order)
    nparts = pg.num_parts
    owner = np.zeros(int(g.num_nodes), np.int32)
    nm = np.asarray(pg.node_mask)
    for p in range(nparts):
        owner[parts[p][nm[p]]] = p
    e_owner = owner[r]
    packed = np.zeros((nparts, pg.e_local), np.float32)
    for p in range(nparts):
        le = logits[e_owner == p]
        packed[p, :len(le)] = le

    from jax.sharding import PartitionSpec as P
    import functools
    from graphneuralnetworks_tpu.parallel import (shard_partitioned,
                                                  shard_graph_local)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P("graph"), shard_partitioned(pg)),
                       out_specs=P("graph"), check_vma=False)
    def run(lg_stacked, pg_local):
        sg = shard_graph_local(pg_local, "graph")
        return ops.softmax_edge_neighbors(sg, lg_stacked[0])[None]

    alphas = np.asarray(jax.jit(run)(jnp.asarray(packed), pg))
    # compare per shard against the reference alphas of the same edges
    for p in range(nparts):
        sel = e_owner == p
        np.testing.assert_allclose(alphas[p, :sel.sum()],
                                   alpha_ref[:ne][sel], rtol=1e-5,
                                   atol=1e-6)
