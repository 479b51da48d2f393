"""Hetero + temporal container and layer tests.

Reference analogs: GNNGraphs/test/gnnheterograph.jl,
temporalsnapshotsgnngraph.jl, GraphNeuralNetworks/test/layers/heteroconv.jl,
temporalconv.jl.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import graphneuralnetworks_tpu as gnn
from graphneuralnetworks_tpu import models as M


def make_hetero():
    return gnn.heterograph({
        ("user", "rates", "movie"): ([0, 0, 1, 2], [0, 1, 1, 2]),
        ("movie", "rated_by", "user"): ([0, 1, 1, 2], [0, 0, 1, 2]),
    }, num_nodes={"user": 3, "movie": 4})


def test_heterograph_basics():
    g = make_hetero()
    assert g.num_node_types == 2 and g.num_edge_types == 2
    assert set(g.ntypes) == {"user", "movie"}
    assert int(g.num_nodes["movie"]) == 4
    s, r = g.edge_index(("user", "rates", "movie"))
    assert s.shape == r.shape
    sub = g.edge_type_subgraph(("user", "rates", "movie"))
    assert sub.num_edge_types == 1
    d = g.degree(("user", "rates", "movie"), dir="in")
    ne = int(g.relations[("user", "rates", "movie")].num_edges)
    assert float(d.sum()) == ne


def test_rand_heterograph():
    g = gnn.rand_heterograph({"A": 10, "B": 6},
                             {("A", "to", "B"): 20}, seed=3)
    rel = g.relations[("A", "to", "B")]
    assert int(rel.num_edges) == 20
    g2 = gnn.rand_bipartite_heterograph(8, 5, 12)
    assert g2.num_edge_types == 2


def test_hetero_conv_forward_and_grad():
    g = make_hetero()
    rngs = nnx.Rngs(0)
    din, dout = 4, 6
    layer = M.HeteroGraphConv({
        ("user", "rates", "movie"): M.GraphConv(din, dout, rngs=rngs),
        ("movie", "rated_by", "user"): M.SAGEConv(din, dout, rngs=rngs),
    })
    rng = np.random.default_rng(0)
    x = {"user": jnp.asarray(rng.standard_normal(
            (g.n_pad("user"), din)), jnp.float32),
         "movie": jnp.asarray(rng.standard_normal(
            (g.n_pad("movie"), din)), jnp.float32)}
    out = layer(g, x)
    assert out["movie"].shape == (g.n_pad("movie"), dout)
    assert out["user"].shape == (g.n_pad("user"), dout)

    def loss(xx):
        o = layer(g, xx)
        return sum(jnp.sum(v ** 2) for v in o.values())

    grads = jax.grad(loss)(x)
    assert all(np.isfinite(np.asarray(v)).all() for v in grads.values())
    assert float(jnp.abs(grads["user"]).sum()) > 0


def test_hetero_conv_multi_relation_merge():
    """Two relations writing the same dst type are aggregated
    (heteroconv.jl:68-86)."""
    g = gnn.heterograph({
        ("A", "r1", "C"): ([0, 1], [0, 1]),
        ("B", "r2", "C"): ([0, 1], [0, 1]),
    }, num_nodes={"A": 2, "B": 2, "C": 2})
    rngs = nnx.Rngs(0)
    conv = M.HeteroGraphConv({
        ("A", "r1", "C"): M.GraphConv(3, 4, rngs=rngs),
        ("B", "r2", "C"): M.GraphConv(3, 4, rngs=rngs),
    }, aggr="sum")
    x = {t: jnp.ones((g.n_pad(t), 3)) for t in ("A", "B", "C")}
    out = conv(g, x)
    assert set(out) == {"C"}
    # sum of individual relation outputs
    o1 = conv.convs[0](g.relation_graph(("A", "r1", "C")), (x["A"], x["C"]))
    o2 = conv.convs[1](g.relation_graph(("B", "r2", "C")), (x["B"], x["C"]))
    np.testing.assert_allclose(np.asarray(out["C"]), np.asarray(o1 + o2),
                               rtol=1e-5)


def test_batch_hetero():
    g1 = make_hetero()
    g2 = make_hetero()
    gb = gnn.batch_hetero([g1, g2])
    assert int(gb.num_nodes["user"]) == 6
    rel = gb.relations[("user", "rates", "movie")]
    assert int(rel.num_edges) == 8


# ---------------------------------------------------------------------------
# temporal
# ---------------------------------------------------------------------------

def test_temporal_graph_container():
    snaps = [gnn.rand_graph(6, 12, seed=i) for i in range(4)]
    tg = gnn.TemporalGraph.from_snapshots(snaps)
    assert tg.num_snapshots == 4
    assert isinstance(tg[1], gnn.GraphTuple)
    tg2 = tg.add_snapshot(2, gnn.rand_graph(6, 12, seed=9))
    assert tg2.num_snapshots == 5
    tg3 = tg2.remove_snapshot(0)
    assert tg3.num_snapshots == 4
    sl = tg[1:3]
    assert sl.num_snapshots == 2


def test_temporal_uniform_stacked():
    snaps = [gnn.rand_graph(6, 12, seed=i) for i in range(3)]
    tg = gnn.TemporalGraph.from_snapshots(snaps, uniform=True)
    st = tg.stacked()
    assert st.senders.shape[0] == 3


T, N_IN, N_OUT = 4, 3, 5


@pytest.mark.parametrize("make", [
    lambda r: M.GConvGRU(N_IN, N_OUT, 2, rngs=r),
    lambda r: M.GConvLSTM(N_IN, N_OUT, 2, rngs=r),
    lambda r: M.DCGRU(N_IN, N_OUT, 2, rngs=r),
    lambda r: M.TGCN(N_IN, N_OUT, rngs=r),
    lambda r: M.EvolveGCNO(N_IN, N_OUT, rngs=r),
])
def test_recurrent_static_graph(make):
    g = gnn.rand_graph(6, 12, seed=0)
    layer = make(nnx.Rngs(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, g.n_pad, N_IN)), jnp.float32)
    y = layer(g, x)
    assert y.shape == (T, g.n_pad, N_OUT)
    assert np.isfinite(np.asarray(y)).all()

    # gradient flows through the scan
    graphdef, params, rest = nnx.split(layer, nnx.Param, ...)

    def loss(p):
        m = nnx.merge(graphdef, p, rest)
        return jnp.sum(m(g, x) ** 2)

    grads = jax.grad(loss)(params)
    total = sum(float(jnp.abs(v).sum())
                for v in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0


def test_evolvegcno_snapshot_graphs():
    """EvolveGCNO works on time-varying graphs (temporalconv.jl:678-709)."""
    snaps = [gnn.rand_graph(6, 12, seed=i, n_pad=8, e_pad=128)
             for i in range(3)]
    tg = gnn.TemporalGraph.from_snapshots(snaps)
    layer = M.EvolveGCNO(N_IN, N_OUT, rngs=nnx.Rngs(0))
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((8, N_IN)), jnp.float32)
          for _ in range(3)]
    ys = layer(tg, xs)
    assert len(ys) == 3 and ys[0].shape == (8, N_OUT)


def test_a3tgcn():
    g = gnn.rand_graph(6, 12, seed=0)
    layer = M.A3TGCN(N_IN, N_OUT, rngs=nnx.Rngs(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, g.n_pad, N_IN)), jnp.float32)
    y = layer(g, x)
    assert y.shape == (g.n_pad, N_OUT)


def test_gcn_conv_bipartite():
    """GCNConv inside HeteroGraphConv (reference gcn_conv hetero branch)."""
    import jax
    g = make_hetero()
    rngs = nnx.Rngs(0)
    conv = M.HeteroGraphConv({
        ("user", "rates", "movie"): M.GCNConv(4, 6, rngs=rngs),
    })
    x = {"user": jnp.ones((g.n_pad("user"), 4)),
         "movie": jnp.ones((g.n_pad("movie"), 4))}
    out = conv(g, x)
    assert out["movie"].shape == (g.n_pad("movie"), 6)
    assert np.isfinite(np.asarray(out["movie"])).all()

    def loss(xx):
        return jnp.sum(conv(g, xx)["movie"] ** 2)

    grads = jax.grad(loss)(x)
    assert float(jnp.abs(grads["user"]).sum()) > 0
