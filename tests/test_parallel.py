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
    pg_xla = __import__("dataclasses").replace(pg, spmm_aux=None,
                                               split_aux=None)
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


def _sbm_edges(n=4096, e=40000, ncomm=16, p_intra=0.8, seed=0):
    """Hidden-community SBM edge list (ids shuffled)."""
    rng = np.random.default_rng(seed)
    comm = rng.permutation(n) % ncomm
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    intra = rng.random(e) < p_intra
    cs = comm[s]
    for c in range(ncomm):
        m = intra & (cs == c)
        if m.any():
            r[m] = rng.choice(np.nonzero(comm == c)[0], int(m.sum()))
    return s.astype(np.int32), r.astype(np.int32)


def test_partition_nodes_quality_and_balance():
    """The locality-aware partitioner (net-new; no reference analog): on a
    hidden-community graph it must beat the contiguous-range cut decisively
    while staying balanced."""
    from graphneuralnetworks_tpu.parallel import partition_nodes
    n = 4096
    s, r = _sbm_edges(n=n)
    for P_ in (2, 8):
        parts = partition_nodes(s, r, n, P_)
        assert parts.shape == (n,) and parts.min() >= 0 \
            and parts.max() < P_
        sizes = np.bincount(parts, minlength=P_)
        assert sizes.max() <= int(np.ceil(n / P_ * 1.05))
        cut = float(np.mean(parts[s] != parts[r]))
        rng_parts = (np.arange(n) * P_ // n).astype(np.int32)
        cut_range = float(np.mean(rng_parts[s] != rng_parts[r]))
        # range finds nothing (ids shuffled): cut ~ (P-1)/P; BFS+LDG must
        # at least halve it on this graph
        assert cut < 0.55 * cut_range, (P_, cut, cut_range)


def test_partition_graph_bfs_string(mesh):
    """partition_graph(parts="bfs") routes through partition_nodes and the
    sharded propagate still equals the single-device oracle."""
    s, r = _sbm_edges(n=256, e=2048, ncomm=8)
    g = gnn.graph(s, r, num_nodes=256)
    pg = partition_graph(g, NDEV, parts="bfs")
    nn = int(g.num_nodes)
    x = np.random.default_rng(1).standard_normal((nn, 8)).astype(np.float32)
    xg = jnp.zeros((g.n_pad, 8)).at[:nn].set(jnp.asarray(x))
    y_ref = ops.propagate(ops.copy_xj, g, "sum", xj=xg)
    run = make_sharded_propagate(mesh, pg)
    y = pg.gather_nodes(run(pg.scatter_nodes(x), pg))
    np.testing.assert_allclose(y, np.asarray(y_ref)[:nn], rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("weighted", [False, True])
def test_split_overlap_path_matches_combined(mesh, weighted):
    """The owned/remote halo-overlap split (SURVEY §7.3.4) must equal the
    combined single-all_to_all path, forward and gradient."""
    import dataclasses
    w = (np.random.default_rng(9).random(512).astype(np.float32)
         if weighted else None)
    g = gnn.rand_graph(96, 512, seed=11, edge_weight=w)
    pg = partition_graph(g, NDEV)                      # split_local default
    assert pg.own_recv is not None and pg.halo_send_rem is not None
    # the remote buffer excludes the diagonal: strictly fewer rows than the
    # combined halo buffer on this random graph
    assert pg.h_rem <= pg.h_max
    pg_comb = dataclasses.replace(
        pg, own_recv=None, own_send=None, own_mask=None, own_weight=None,
        rem_recv=None, rem_send=None, rem_mask=None, rem_weight=None,
        halo_send_rem=None, split_aux=None)
    nn = int(g.num_nodes)
    x = np.random.default_rng(12).standard_normal((nn, 8)) \
        .astype(np.float32)
    xs = pg.scatter_nodes(x)
    y_split = pg.gather_nodes(make_sharded_propagate(mesh, pg)(xs, pg))
    y_comb = pg.gather_nodes(
        make_sharded_propagate(mesh, pg_comb)(xs, pg_comb))
    np.testing.assert_allclose(y_split, y_comb, rtol=1e-4, atol=1e-4)

    t = jnp.asarray(np.random.default_rng(13)
                    .standard_normal(xs.shape), jnp.float32)

    def loss(xs, pg_):
        return jnp.sum(make_sharded_propagate(mesh, pg_)(xs, pg_) * t)

    g1 = jax.grad(loss)(xs, pg)
    g2 = jax.grad(loss)(xs, pg_comb)
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


def test_make_mesh_train_step_matches_single_device():
    # the public dp x graph API (VERDICT r2 next #4): one step on a
    # ("data", "graph") 2x4 mesh must match a single-device step on the
    # concatenated batch (same masked-mean loss, same adam update)
    import optax
    from flax import nnx
    from graphneuralnetworks_tpu import models as M
    from graphneuralnetworks_tpu.parallel import (make_mesh_train_step,
                                                  stack_partitions)

    dp, gp = 2, 4
    devs = np.array(jax.devices()[:NDEV]).reshape(dp, gp)
    mesh2 = Mesh(devs, ("data", "graph"))
    din, nout = 6, 3
    rng = np.random.default_rng(0)

    graphs = [gnn.rand_graph(48, 192, seed=i) for i in range(dp)]
    from graphneuralnetworks_tpu.parallel import union_capacities
    probes = [partition_graph(g, gp) for g in graphs]
    caps = union_capacities(*probes)
    pgs = [partition_graph(g, gp, **caps) for g in graphs]
    xs, ys = [], []
    for g, pg in zip(graphs, pgs):
        nn_ = int(g.num_nodes)
        x = rng.standard_normal((nn_, din)).astype(np.float32)
        y = rng.integers(0, nout, nn_).astype(np.int32)
        xs.append((x, y))
    x_stack = jnp.asarray(np.stack(
        [np.asarray(pg.scatter_nodes(x)) for pg, (x, _) in zip(pgs, xs)]))
    y_stack = jnp.asarray(np.stack(
        [np.asarray(pg.scatter_nodes(y)) for pg, (_, y) in zip(pgs, xs)]))
    pg_stack = stack_partitions(pgs)

    def mk_model():
        rngs = nnx.Rngs(0)
        return M.GNNChain(M.GCNConv(din, 8, jax.nn.relu, rngs=rngs),
                          M.SAGEConv(8, nout, rngs=rngs))

    def local_loss(m, sg, x_local, y_local):
        logits = m(sg, x_local)
        ls = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(ls, y_local[:, None], axis=-1)[:, 0]
        mask = sg.node_mask.astype(ls.dtype)
        return jnp.sum(nll * mask), jnp.sum(mask)

    # sgd: the update is LINEAR in the gradients, so an allclose on the
    # post-step params is a direct gradient-parity check (adam would
    # amplify near-zero-grad float32 noise through m/sqrt(v))
    tx = optax.sgd(1e-1)
    step, params, opt_state = make_mesh_train_step(
        mk_model(), tx, mesh2, pg_stack, local_loss, donate=False)
    params2, opt_state2, loss = step(params, opt_state, pg_stack,
                                     x_stack, y_stack)
    # second step exercises the donated/cached path shape stability
    _, _, loss_b = step(params2, opt_state2, pg_stack, x_stack, y_stack)
    assert float(loss_b) < float(loss)

    # ---- single-device oracle over the same two graphs ----------------------
    model_ref = mk_model()
    gd, p_ref = nnx.split(model_ref)
    o_ref = tx.init(p_ref)

    def ref_loss(p):
        m = nnx.merge(gd, p)
        tot = cnt = 0.0
        for g, (x, y) in zip(graphs, xs):
            nn_ = int(g.num_nodes)
            xg = jnp.zeros((g.n_pad, din)).at[:nn_].set(x)
            yg = jnp.zeros((g.n_pad,), jnp.int32).at[:nn_].set(y)
            logits = m(g, xg)
            ls = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(ls, yg[:, None], axis=-1)[:, 0]
            mask = g.node_mask.astype(ls.dtype)
            tot = tot + jnp.sum(nll * mask)
            cnt = cnt + jnp.sum(mask)
        return tot / jnp.maximum(cnt, 1.0)

    loss_ref, grads_ref = jax.value_and_grad(ref_loss)(p_ref)
    upd, _ = tx.update(grads_ref, o_ref, p_ref)
    p_ref2 = optax.apply_updates(p_ref, upd)

    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(params2), jax.tree.leaves(p_ref2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_make_mesh_train_step_graph_only(mesh):
    # data_axis=None: pure graph-partitioned training on the 8-way axis
    import optax
    from flax import nnx
    from graphneuralnetworks_tpu import models as M
    from graphneuralnetworks_tpu.parallel import make_mesh_train_step

    g = gnn.rand_graph(64, 256, seed=5)
    pg = partition_graph(g, NDEV)
    rng = np.random.default_rng(1)
    nn_ = int(g.num_nodes)
    x = rng.standard_normal((nn_, 5)).astype(np.float32)
    y = rng.integers(0, 2, nn_).astype(np.int32)
    x_s = jnp.asarray(np.asarray(pg.scatter_nodes(x)))
    y_s = jnp.asarray(np.asarray(pg.scatter_nodes(y)))

    model = M.GNNChain(M.GraphConv(5, 4, jax.nn.relu, rngs=nnx.Rngs(0)),
                       nnx.Linear(4, 2, rngs=nnx.Rngs(1)))

    def local_loss(m, sg, x_local, y_local):
        logits = m(sg, x_local)
        ls = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(ls, y_local[:, None], axis=-1)[:, 0]
        mask = sg.node_mask.astype(ls.dtype)
        return jnp.sum(nll * mask), jnp.sum(mask)

    step, params, opt_state = make_mesh_train_step(
        model, optax.sgd(0.1), mesh, pg, local_loss, data_axis=None,
        donate=False)
    losses = []
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, pg, x_s, y_s)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("weighted", [False, True])
def test_sharded_dconv_reverse_matches_single_device(mesh, weighted):
    # reverse-direction propagation under the mesh (VERDICT r2 missing #6):
    # DConv needs g.reverse() + out-degree; both ride the reverse partition
    # built by partition_graph(..., with_reverse=True)
    g = gnn.rand_graph(64, 256, seed=9,
                       edge_weight=(np.random.default_rng(4).random(256)
                                    .astype(np.float32) + 0.5)
                       if weighted else None)
    pg = partition_graph(g, NDEV, with_reverse=True)
    x, xg, nn_ = _x(g)
    layer = M.DConv(16, 8, k=3, rngs=nnx.Rngs(0))
    y_ref = np.asarray(layer(g, xg))[:nn_]

    run, state, xs = _run_sharded(mesh, pg, layer, x)
    ys = run(state, xs, pg)
    y = pg.gather_nodes(ys)
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)

    # gradient parity through BOTH directions' collectives
    def loss_sh(st):
        ys = run(st, xs, pg)
        nm = jnp.asarray(np.asarray(pg.node_mask))
        return jnp.sum(jnp.where(nm[..., None], ys, 0) ** 2)

    graphdef, _ = nnx.split(layer)

    def loss_ref(st):
        return jnp.sum(nnx.merge(graphdef, st)(g, xg)[:nn_] ** 2)

    gs_sh = jax.jit(jax.grad(loss_sh))(state)
    gs_ref = jax.jit(jax.grad(loss_ref))(state)
    for a, b in zip(jax.tree_util.tree_leaves(gs_sh),
                    jax.tree_util.tree_leaves(gs_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
