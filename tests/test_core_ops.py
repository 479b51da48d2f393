"""Core op tests: gather/segment/propagate vs dense ground truth + gradients.

Replicates the reference's kernel ground-truth pattern
(GNNlib/test/msgpass.jl:69-116): propagate(copy_xj, +) must equal A^T @ X, and
scatter semantics on isolated nodes (msgpass.jl:21-26) must give zeros for +.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import graphneuralnetworks_tpu as gnn
from graphneuralnetworks_tpu import ops


def dense_aggregate(g, m, aggr):
    """Dense numpy reference for aggregate_neighbors."""
    ne = int(g.num_edges)
    r = np.asarray(g.receivers)[:ne]
    m = np.asarray(m)[:ne]
    n = g.n_pad
    out = np.zeros((n,) + m.shape[1:], np.float64)
    if aggr == "sum":
        np.add.at(out, r, m)
    elif aggr == "mean":
        np.add.at(out, r, m)
        cnt = np.bincount(r, minlength=n).astype(np.float64)
        out /= np.maximum(cnt, 1).reshape((-1,) + (1,) * (m.ndim - 1))
    elif aggr == "max":
        tmp = np.full((n,) + m.shape[1:], -np.inf)
        np.maximum.at(tmp, r, m)
        out = np.where(np.isinf(tmp), 0.0, tmp)
    elif aggr == "min":
        tmp = np.full((n,) + m.shape[1:], np.inf)
        np.minimum.at(tmp, r, m)
        out = np.where(np.isinf(tmp), 0.0, tmp)
    return out


@pytest.mark.parametrize("aggr", ["sum", "mean", "max", "min"])
def test_propagate_copy_xj_matches_dense(aggr, rng):
    g = gnn.rand_graph(30, 120, seed=1)
    x = jnp.asarray(rng.standard_normal((g.n_pad, 7)), jnp.float32)
    out = ops.propagate(ops.copy_xj, g, aggr, xj=x)
    m = np.asarray(x)[np.asarray(g.senders)]
    expected = dense_aggregate(g, m, aggr)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


def test_propagate_equals_adjoint_matmul(rng):
    """propagate(copy_xj, g, +) == A^T x  (GNNlib/test/msgpass.jl:69-116)."""
    g = gnn.rand_graph(24, 100, seed=2)
    x = jnp.asarray(rng.standard_normal((g.n_pad, 5)), jnp.float32)
    out = ops.propagate(ops.copy_xj, g, "sum", xj=x)
    A = np.asarray(gnn.adjacency_matrix(g))
    np.testing.assert_allclose(np.asarray(out), A.T @ np.asarray(x),
                               rtol=1e-4, atol=1e-4)


def test_w_mul_xj_weighted_spmm(rng):
    s = [0, 1, 2, 3]
    r = [1, 2, 3, 0]
    w = np.asarray([0.5, 2.0, -1.0, 3.0], np.float32)
    g = gnn.graph(s, r, num_nodes=4, edge_weight=w)
    x = jnp.asarray(rng.standard_normal((g.n_pad, 3)), jnp.float32)
    out = ops.propagate(ops.w_mul_xj, g, "sum", xj=x, e=g.edge_weight)
    A = np.asarray(gnn.adjacency_matrix(g, weighted=True))
    np.testing.assert_allclose(np.asarray(out), A.T @ np.asarray(x),
                               rtol=1e-5, atol=1e-5)


def test_isolated_nodes_zero(test_graphs):
    """Isolated vertices aggregate to zero for + (msgpass.jl:21-26)."""
    g = test_graphs[1]  # has isolated vertex 1
    x = jnp.ones((g.n_pad, 3), jnp.float32)
    out = ops.propagate(ops.copy_xj, g, "sum", xj=x)
    assert np.allclose(np.asarray(out)[1], 0.0)


def test_apply_edges_xi_dot_xj(rng):
    g = gnn.rand_graph(10, 40, seed=3)
    x = jnp.asarray(rng.standard_normal((g.n_pad, 4)), jnp.float32)
    d = ops.apply_edges(ops.xi_dot_xj, g, xi=x, xj=x)
    s, r = np.asarray(g.senders), np.asarray(g.receivers)
    xn = np.asarray(x)
    expected = np.sum(xn[r] * xn[s], -1, keepdims=True)
    np.testing.assert_allclose(np.asarray(d), expected, rtol=1e-5, atol=1e-5)


def test_softmax_edge_neighbors(rng):
    g = gnn.rand_graph(12, 48, seed=4)
    e = jnp.asarray(rng.standard_normal((g.e_pad, 2)), jnp.float32)
    a = ops.softmax_edge_neighbors(g, e)
    an = np.asarray(a)
    ne = int(g.num_edges)
    r = np.asarray(g.receivers)[:ne]
    en = np.asarray(e)[:ne]
    # per-destination softmax
    for node in range(int(g.num_nodes)):
        idx = np.nonzero(r == node)[0]
        if len(idx) == 0:
            continue
        ex = np.exp(en[idx] - en[idx].max(0))
        np.testing.assert_allclose(an[idx], ex / ex.sum(0), rtol=1e-5,
                                   atol=1e-6)
    # padding edges get exactly 0
    assert np.all(an[ne:] == 0)
    # sums to 1 per destination with in-edges
    sums = dense_aggregate(g, an, "sum")
    deg = np.bincount(r, minlength=g.n_pad)
    np.testing.assert_allclose(sums[deg > 0],
                               np.ones_like(sums[deg > 0]), rtol=1e-5)


def test_graphwise_reductions(rng):
    gs = [gnn.rand_graph(5, 12, seed=i) for i in range(3)]
    for i, g in enumerate(gs):
        gs[i] = g.replace(nodes={"x": jnp.asarray(
            rng.standard_normal((g.n_pad, 3)), jnp.float32)})
    gb = gnn.batch(gs)
    x = gb.nodes["x"]
    out = ops.reduce_nodes("sum", gb, x)
    assert out.shape[0] == 3
    # check graph 0 sum
    gid = np.asarray(gb.node_graph_id)
    mask = (gid == 0) & np.asarray(gb.node_mask)
    np.testing.assert_allclose(np.asarray(out)[0],
                               np.asarray(x)[mask].sum(0), rtol=1e-5)
    mean = ops.reduce_nodes("mean", gb, x)
    np.testing.assert_allclose(np.asarray(mean)[0],
                               np.asarray(x)[mask].mean(0), rtol=1e-5)


def test_gradients_flow_through_propagate(rng):
    """Gradient of sum(propagate) w.r.t. x vs finite differences."""
    g = gnn.rand_graph(8, 24, seed=5)
    x0 = np.asarray(rng.standard_normal((g.n_pad, 3)), np.float32)

    def loss(x):
        y = ops.propagate(ops.copy_xj, g, "sum", xj=x)
        return jnp.sum(y * y)

    grad = np.asarray(jax.grad(loss)(jnp.asarray(x0)))
    eps = 1e-3
    for (i, j) in [(0, 0), (3, 2), (7, 1)]:
        xp = x0.copy(); xp[i, j] += eps
        xm = x0.copy(); xm[i, j] -= eps
        fd = (loss(jnp.asarray(xp)) - loss(jnp.asarray(xm))) / (2 * eps)
        np.testing.assert_allclose(grad[i, j], fd, rtol=2e-2, atol=1e-3)


def test_gradient_wrt_edge_weight(rng):
    """Edge weights are differentiable (reference rrule query.jl:244-278)."""
    g = gnn.rand_graph(8, 24, seed=6, edge_weight=np.ones(24, np.float32))
    x = jnp.asarray(rng.standard_normal((g.n_pad, 3)), jnp.float32)

    def loss(w):
        y = ops.propagate(ops.w_mul_xj, g, "sum", xj=x, e=w)
        return jnp.sum(y ** 2)

    grad = jax.grad(loss)(g.edge_weight)
    assert np.isfinite(np.asarray(grad)).all()
    assert np.abs(np.asarray(grad)[: int(g.num_edges)]).sum() > 0


def test_jit_static_shapes(rng):
    """Same padded shapes across different true sizes hit one trace."""
    traces = []

    @jax.jit
    def f(g, x):
        traces.append(1)
        return ops.propagate(ops.copy_xj, g, "sum", xj=x)

    g1 = gnn.rand_graph(10, 30, seed=7, n_pad=16, e_pad=128)
    g2 = gnn.rand_graph(13, 40, seed=8, n_pad=16, e_pad=128)
    x = jnp.zeros((16, 4))
    f(g1, x)
    f(g2, x)
    assert len(traces) == 1
