"""Layer zoo tests: shapes + finite-difference gradient checks per layer.

Replicates the reference's `test_gradients` machinery
(GraphNeuralNetworks/test/test_module.jl:81-157): scalar loss, AD gradient
w.r.t. inputs and parameters, compared against central finite differences on
the two fixture graphs (test_module.jl:160-185, provided by conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import graphneuralnetworks_tpu as gnn
from graphneuralnetworks_tpu import models as M

IN, OUT, EIN = 4, 5, 3
# float64 FD against a network whose *other* params stay float32: rounding
# noise floor is ~1e-5 on O(10) losses.
RTOL, ATOL = 1e-4, 1e-5


def _x(g, d=IN, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((g.n_pad, d)), jnp.float32)


def check_fd(loss, arg, n_checks=6, eps=1e-5, seed=1):
    """Central finite differences (float64) on random coords of a pytree arg.

    The substituted leaves are promoted to float64 so both the AD gradient and
    the difference quotient are computed in double precision (the reference
    computes FD in Float64, test_module.jl:59-64).
    """
    arg = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64) if jnp.issubdtype(a.dtype, jnp.floating)
        else a, arg)
    loss = jax.jit(loss)
    g_ad = jax.grad(loss)(arg)
    leaves_ad, treedef = jax.tree_util.tree_flatten(g_ad)
    leaves, _ = jax.tree_util.tree_flatten(arg)
    rng = np.random.default_rng(seed)
    checked = 0
    for li, (leaf, gleaf) in enumerate(zip(leaves, leaves_ad)):
        leaf = np.asarray(leaf, np.float64)
        if leaf.size == 0:
            continue
        for _ in range(max(1, n_checks // max(1, len(leaves)))):
            idx = tuple(rng.integers(0, s) for s in leaf.shape)
            lp = leaf.copy(); lp[idx] += eps
            lm = leaf.copy(); lm[idx] -= eps

            def subst(new):
                ls = list(leaves)
                ls[li] = jnp.asarray(new, jnp.float64)
                return jax.tree_util.tree_unflatten(treedef, ls)

            fd = (loss(subst(lp)) - loss(subst(lm))) / (2 * eps)
            ad = np.asarray(gleaf)[idx]
            np.testing.assert_allclose(ad, fd, rtol=RTOL, atol=ATOL,
                                       err_msg=f"leaf {li} idx {idx}")
            checked += 1
    assert checked > 0


def run_layer_test(make_layer, g, *, din=IN, dout=OUT, extra_args=(),
                   out_index=None, check_params=True):
    layer = make_layer()
    x = _x(g, din)
    out = layer(g, x, *extra_args)
    if out_index is not None:
        out = out[out_index]
    assert out.shape == (g.n_pad, dout), f"got {out.shape}"
    assert np.isfinite(np.asarray(out)[np.asarray(g.node_mask)]).all()

    # gradient w.r.t. input features
    def loss_x(xx):
        o = layer(g, xx, *extra_args)
        if out_index is not None:
            o = o[out_index]
        return jnp.sum(jnp.where(g.node_mask[:, None], o, 0) ** 2)

    check_fd(loss_x, x)

    # gradient w.r.t. parameters
    if check_params:
        graphdef, params, rest = nnx.split(layer, nnx.Param, ...)

        def loss_p(p):
            m = nnx.merge(graphdef, p, rest)
            o = m(g, x, *extra_args)
            if out_index is not None:
                o = o[out_index]
            return jnp.sum(jnp.where(g.node_mask[:, None], o, 0) ** 2)

        check_fd(loss_p, params)
    return layer


@pytest.fixture
def rngs():
    return lambda: nnx.Rngs(0)


def test_gcn_conv(test_graphs, rngs):
    for g in test_graphs:
        run_layer_test(lambda: M.GCNConv(IN, OUT, rngs=rngs()), g)
    # tanh activation + no self loops
    run_layer_test(lambda: M.GCNConv(IN, OUT, jnp.tanh, add_self_loops=False,
                                     rngs=rngs()), test_graphs[0])


def test_gcn_conv_edge_weight(rngs):
    """Closed-form value check with edge weights
    (test/layers/conv.jl:38-43)."""
    s = [1, 1, 2, 3]
    t = [0, 0, 1, 1]  # 0-based version of the reference fixture
    w = np.asarray([1.0, 2.0, 3.0, 4.0], np.float32)
    g = gnn.graph(s, t, num_nodes=4, edge_weight=w)
    x = jnp.ones((g.n_pad, 1), jnp.float32)
    l = M.GCNConv(1, 1, add_self_loops=False, use_edge_weight=True,
                  rngs=nnx.Rngs(0))
    # set weight to identity for the value check
    l.weight.value = jnp.ones((1, 1))
    l.bias.value = jnp.zeros((1,))
    y = l(g, x)
    # manual: d_in = scatter(w, t); c = 1/sqrt(d); y_i = c_i * sum_j w_ij c_j
    d = np.zeros(g.n_pad); np.add.at(d, t, w)
    c = np.where(d > 0, 1 / np.sqrt(np.maximum(d, 1e-12)), 0)
    expect = np.zeros(g.n_pad)
    for si, ti, wi in zip(s, t, w):
        expect[ti] += wi * c[si]
    expect *= c
    np.testing.assert_allclose(np.asarray(y)[:4, 0], expect[:4], rtol=1e-5)


def test_gcn_conv_weight_override(test_graphs, rngs):
    g = test_graphs[0]
    l = M.GCNConv(IN, OUT, rngs=rngs())
    x = _x(g)
    w2 = jnp.asarray(np.random.default_rng(3).standard_normal((IN, OUT)),
                     jnp.float32)
    y = l(g, x, conv_weight=w2)
    l2 = M.GCNConv(IN, OUT, rngs=rngs())
    l2.weight.value = w2
    l2.bias.value = l.bias.value
    np.testing.assert_allclose(np.asarray(y), np.asarray(l2(g, x)), rtol=1e-5)


def test_cheb_conv(test_graphs, rngs):
    for g in test_graphs:
        run_layer_test(lambda: M.ChebConv(IN, OUT, 3, rngs=rngs()), g)


def test_graph_conv(test_graphs, rngs):
    for g in test_graphs:
        run_layer_test(lambda: M.GraphConv(IN, OUT, rngs=rngs()), g)
    run_layer_test(lambda: M.GraphConv(IN, OUT, jax.nn.relu, aggr="mean",
                                       rngs=rngs()), test_graphs[0])
    run_layer_test(lambda: M.GraphConv(IN, OUT, aggr="max", rngs=rngs()),
                   test_graphs[1])


@pytest.mark.parametrize("heads,concat", [(1, True), (2, True), (2, False)])
def test_gat_conv(test_graphs, rngs, heads, concat):
    dout = OUT * heads if concat else OUT
    for g in test_graphs:
        run_layer_test(lambda: M.GATConv(IN, OUT, heads=heads, concat=concat,
                                         rngs=rngs()), g, dout=dout)


def test_gat_conv_edge_features(test_graphs, rngs):
    g = test_graphs[0]
    e = jnp.asarray(np.random.default_rng(5).standard_normal(
        (g.e_pad, EIN)), jnp.float32)
    run_layer_test(lambda: M.GATConv(IN, OUT, heads=2, edge_features=EIN,
                                     add_self_loops=False, rngs=rngs()),
                   g, dout=2 * OUT, extra_args=(e,))


@pytest.mark.parametrize("heads,concat", [(1, True), (2, False)])
def test_gatv2_conv(test_graphs, rngs, heads, concat):
    dout = OUT * heads if concat else OUT
    for g in test_graphs:
        run_layer_test(lambda: M.GATv2Conv(IN, OUT, heads=heads,
                                           concat=concat, rngs=rngs()),
                       g, dout=dout)


def test_gated_graph_conv(test_graphs, rngs):
    for g in test_graphs:
        run_layer_test(lambda: M.GatedGraphConv(OUT, 3, rngs=rngs()), g)


def test_edge_conv(test_graphs, rngs):
    for g in test_graphs:
        run_layer_test(lambda: M.EdgeConv(
            M.MLP([2 * IN, OUT], rngs=rngs())), g)


def test_gin_conv(test_graphs, rngs):
    for g in test_graphs:
        run_layer_test(lambda: M.GINConv(
            M.MLP([IN, OUT], rngs=rngs()), 0.01), g)


def test_nn_conv(test_graphs, rngs):
    for g in test_graphs:
        e = jnp.asarray(np.random.default_rng(5).standard_normal(
            (g.e_pad, EIN)), jnp.float32)
        run_layer_test(lambda: M.NNConv(
            IN, OUT, M.MLP([EIN, IN * OUT], rngs=rngs()), jnp.tanh,
            rngs=rngs()), g, extra_args=(e,))


def test_sage_conv(test_graphs, rngs):
    for g in test_graphs:
        run_layer_test(lambda: M.SAGEConv(IN, OUT, rngs=rngs()), g)


def test_res_gated_graph_conv(test_graphs, rngs):
    for g in test_graphs:
        run_layer_test(lambda: M.ResGatedGraphConv(IN, OUT, rngs=rngs()), g)


def test_cg_conv(test_graphs, rngs):
    g = test_graphs[0]
    run_layer_test(lambda: M.CGConv(IN, OUT, rngs=rngs()), g)
    e = jnp.asarray(np.random.default_rng(5).standard_normal(
        (g.e_pad, EIN)), jnp.float32)
    run_layer_test(lambda: M.CGConv(IN, OUT, edge_features=EIN,
                                    rngs=rngs()), g, extra_args=(e,))
    # residual with matching dims
    run_layer_test(lambda: M.CGConv(IN, IN, residual=True, rngs=rngs()),
                   g, dout=IN)


def test_agnn_conv(test_graphs, rngs):
    for g in test_graphs:
        run_layer_test(lambda: M.AGNNConv(rngs=rngs()), g, dout=IN)
    run_layer_test(lambda: M.AGNNConv(add_self_loops=False, rngs=rngs()),
                   test_graphs[0], dout=IN)


def test_megnet_conv(test_graphs, rngs):
    g = test_graphs[0]
    e = jnp.asarray(np.random.default_rng(5).standard_normal(
        (g.e_pad, IN)), jnp.float32)
    layer = M.MEGNetConv(IN, OUT, rngs=nnx.Rngs(0))
    x = _x(g)
    xo, eo = layer(g, x, e)
    assert xo.shape == (g.n_pad, OUT)
    assert eo.shape == (g.e_pad, OUT)


def test_gmm_conv(test_graphs, rngs):
    g = test_graphs[0]
    e = jnp.asarray(np.random.default_rng(5).standard_normal(
        (g.e_pad, EIN)), jnp.float32)
    run_layer_test(lambda: M.GMMConv(IN, OUT, edge_features=EIN, K=2,
                                     rngs=rngs()), g, extra_args=(e,))


def test_sg_conv(test_graphs, rngs):
    for g in test_graphs:
        run_layer_test(lambda: M.SGConv(IN, OUT, 2, rngs=rngs()), g)


def test_tag_conv(test_graphs, rngs):
    for g in test_graphs:
        run_layer_test(lambda: M.TAGConv(IN, OUT, 2, rngs=rngs()), g)


def test_d_conv(test_graphs, rngs):
    for g in test_graphs:
        run_layer_test(lambda: M.DConv(IN, OUT, 2, rngs=rngs()), g)


@pytest.mark.parametrize("kw", [
    dict(),
    dict(gating=True, bias_qkv=False),
    dict(root_weight=False, ff_channels=8, skip_connection=False),
    dict(heads=2, concat=False, skip_connection=False),
])
def test_transformer_conv(test_graphs, rngs, kw):
    heads = kw.get("heads", 1)
    concat = kw.get("concat", True)
    dout = OUT * heads if concat else OUT
    skip = kw.get("skip_connection", False)
    din = dout if skip else IN
    for g in test_graphs:
        run_layer_test(lambda: M.TransformerConv(din, OUT, **kw,
                                                 rngs=rngs()),
                       g, din=din, dout=dout)


def test_egnn_conv(test_graphs, rngs):
    g = test_graphs[0]
    layer = M.EGNNConv(IN, OUT, rngs=nnx.Rngs(0))
    h = _x(g, IN)
    pos = _x(g, 3, seed=9)
    ho, xo = layer(g, h, pos)
    assert ho.shape == (g.n_pad, OUT)
    assert xo.shape == (g.n_pad, 3)


def test_gnn_chain(test_graphs, rngs):
    g = test_graphs[0]
    r = rngs()
    model = M.GNNChain(
        M.GCNConv(IN, 8, jax.nn.relu, rngs=r),
        M.GCNConv(8, 8, rngs=r),
        jax.nn.relu,
        nnx.Linear(8, OUT, rngs=r),
    )
    x = _x(g)
    out = model(g, x)
    assert out.shape == (g.n_pad, OUT)
    assert len(model) == 4
    sub = model[:2]
    assert sub(g, x).shape == (g.n_pad, 8)


def test_with_graph_and_dot_decoder(test_graphs, rngs):
    g = test_graphs[0].replace()
    x = _x(g)
    g = g.with_nodes(x=x)
    model = M.GNNChain(M.GCNConv(IN, OUT, rngs=rngs()))
    wg = M.WithGraph(model, g)
    np.testing.assert_allclose(np.asarray(wg(x)), np.asarray(model(g, x)))
    dec = M.DotDecoder()
    assert dec(g, x).shape == (g.e_pad, 1)


def test_pooling(test_graphs, rngs):
    gs = [g.with_nodes(x=_x(g, IN, seed=i))
          for i, g in enumerate(test_graphs)]
    gb = gnn.batch(gs)
    x = gb.nodes["x"]
    p = M.GlobalPool("mean")(gb, x)
    assert p.shape == (2, IN)
    # manual check graph 1 mean
    gid = np.asarray(gb.node_graph_id)
    mask = (gid == 1) & np.asarray(gb.node_mask)
    np.testing.assert_allclose(np.asarray(p)[1],
                               np.asarray(x)[mask].mean(0), rtol=1e-5)

    r = rngs()
    gap = M.GlobalAttentionPool(M.MLP([IN, 1], rngs=r),
                                M.MLP([IN, OUT], rngs=r))
    assert gap(gb, x).shape == (2, OUT)

    s2s = M.Set2Set(IN, 2, rngs=rngs())
    assert s2s(gb, x).shape == (2, 2 * IN)

    topk = M.TopKPool(IN, 3, rngs=rngs())
    xk, idx = topk(gs[0], gs[0].nodes["x"])
    assert xk.shape == (3, IN) and idx.shape == (3,)
    # only real nodes selected
    assert np.asarray(idx).max() < int(gs[0].num_nodes)

    # topk_index (GNNlib/src/layers/pool.jl:22-27): vector form + per-graph
    # batched form returning GLOBAL node indices
    y = jnp.sum(x, axis=1)
    vals, idx = M.topk_index(y, 3)
    yn = np.asarray(y)
    np.testing.assert_array_equal(np.asarray(idx), np.argsort(-yn)[:3])
    valsb, idxb = M.topk_index(y, 2, g=gb)
    gid = np.asarray(gb.node_graph_id)
    nmask = np.asarray(gb.node_mask)
    for b in range(int(gb.num_graphs)):
        cand = np.where((gid == b) & nmask)[0]
        expect = cand[np.argsort(-yn[cand])[:2]]
        np.testing.assert_array_equal(np.asarray(idxb)[b], expect)
        np.testing.assert_allclose(np.asarray(valsb)[b], yn[expect],
                                   rtol=1e-6)


def test_chebconv_sparse_matches_dense(rngs):
    """The matrix-free scaled-Laplacian path (r5 — the dense path is
    small-graph-only and ZOO_SWEEP_r5 caught ChebConv failing at 131k
    nodes) must equal the dense path, single and batched."""
    g = gnn.rand_graph(200, 800, seed=4, bidirected=True)
    x = jnp.asarray(np.random.default_rng(5).standard_normal(
        (g.n_pad, IN)), jnp.float32)
    layer = M.ChebConv(IN, OUT, 3, rngs=rngs())
    y_dense = layer(g, x)
    lam = gnn.laplacian_lambda_max(g)
    y_sparse = layer(g, x, lambda_max=lam)
    np.testing.assert_allclose(np.asarray(y_dense), np.asarray(y_sparse),
                               rtol=2e-4, atol=2e-4)
    gb = gnn.batch([gnn.rand_graph(40, 160, seed=i, bidirected=True)
                    for i in range(3)])
    xb = jnp.asarray(np.random.default_rng(6).standard_normal(
        (gb.n_pad, IN)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(layer(gb, xb)),
        np.asarray(layer(gb, xb, lambda_max=gnn.laplacian_lambda_max(gb))),
        rtol=2e-4, atol=2e-4)
