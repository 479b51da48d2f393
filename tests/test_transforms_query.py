"""Transforms / queries / generators / utils surface tests.

Reference analogs: GNNGraphs/test/{transform,query,generate,utils,operators,
datastore}.jl.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import graphneuralnetworks_tpu as gnn
from graphneuralnetworks_tpu.datastore import DataStore
from graphneuralnetworks_tpu.utils import edge_decoding, edge_encoding


def edges_set(g):
    ne = int(g.num_edges)
    return set(zip(np.asarray(g.senders)[:ne].tolist(),
                   np.asarray(g.receivers)[:ne].tolist()))


def test_add_remove_self_loops():
    g = gnn.graph([0, 1, 2], [1, 2, 0], num_nodes=3)
    g2 = gnn.add_self_loops(g)
    assert int(g2.num_edges) == 6
    assert {(i, i) for i in range(3)} <= edges_set(g2)
    g3 = gnn.remove_self_loops(g2)
    assert edges_set(g3) == edges_set(g)


def test_add_remove_edges_nodes():
    g = gnn.graph([0, 1], [1, 2], num_nodes=4,
                  nodes={"x": np.arange(8).reshape(4, 2).astype(np.float32)})
    g2 = gnn.add_edges(g, [3], [0])
    assert (3, 0) in edges_set(g2)
    g3 = gnn.remove_edges(g2, [0])
    assert int(g3.num_edges) == 2
    g4 = gnn.add_nodes(g2, 2)
    assert int(g4.num_nodes) == 6
    assert g4.nodes["x"].shape[0] == g4.n_pad
    g5 = gnn.remove_nodes(g2, [1])
    assert int(g5.num_nodes) == 3
    # node 1 removed: edges (0,1),(1,2) gone, (3,0) remapped to (2,0)
    assert edges_set(g5) == {(2, 0)}


def test_remove_multi_edges_and_bidirected():
    g = gnn.graph([0, 0, 1], [1, 1, 0], num_nodes=2,
                  edge_weight=np.asarray([1.0, 2.0, 5.0], np.float32))
    g2 = gnn.remove_multi_edges(g, aggr="sum")
    assert int(g2.num_edges) == 2
    ne = int(g2.num_edges)
    w = {e: float(v) for e, v in zip(
        zip(np.asarray(g2.senders)[:ne].tolist(),
            np.asarray(g2.receivers)[:ne].tolist()),
        np.asarray(g2.edge_weight)[:ne])}
    assert w[(0, 1)] == 3.0 and w[(1, 0)] == 5.0
    assert bool(gnn.is_bidirected(g2))
    g3 = gnn.to_unidirected(g2)
    assert int(g3.num_edges) == 1
    g4 = gnn.to_bidirected(g3)
    assert edges_set(g4) == {(0, 1), (1, 0)}


def test_has_queries():
    g = gnn.graph([0, 0, 1], [0, 1, 0], num_nodes=2)
    assert bool(gnn.has_self_loops(g))
    assert not bool(gnn.has_multi_edges(g))
    g2 = gnn.graph([0, 0], [1, 1], num_nodes=2)
    assert bool(gnn.has_multi_edges(g2))
    assert not bool(gnn.has_self_loops(g2))


def test_batch_unbatch_getgraph():
    gs = [gnn.rand_graph(5 + i, 10, seed=i,
                         nodes={"x": np.full((5 + i, 2), i, np.float32)})
          for i in range(3)]
    gb = gnn.batch(gs)
    assert int(gb.num_graphs) == 3
    assert int(gb.num_nodes) == 5 + 6 + 7
    parts = gnn.unbatch(gb)
    for i, (a, b) in enumerate(zip(parts, gs)):
        assert int(a.num_nodes) == int(b.num_nodes)
        assert edges_set(a) == edges_set(b)
        nn_ = int(a.num_nodes)
        np.testing.assert_allclose(np.asarray(a.nodes["x"])[:nn_],
                                   np.asarray(b.nodes["x"])[:nn_])
    sub = gnn.getgraph(gb, [1, 2])
    assert int(sub.num_graphs) == 2
    assert int(sub.num_nodes) == 13


def test_negative_sample_and_split(rng):
    g = gnn.rand_graph(30, 120, seed=0)
    neg = gnn.negative_sample(g, num_neg_edges=50, rng=rng)
    assert int(neg.num_edges) == 50
    assert not (edges_set(neg) & edges_set(g))
    g1, g2 = gnn.rand_edge_split(g, 0.8, rng=rng)
    assert int(g1.num_edges) + int(g2.num_edges) == int(g.num_edges)
    assert not (edges_set(g1) & edges_set(g2))
    # bidirected split keeps reverse pairs together
    assert bool(gnn.is_bidirected(g1))


def test_edge_encoding_roundtrip():
    n = 17
    for directed in (True, False):
        for self_loops in (True, False):
            pairs = [(i, j) for i in range(n) for j in range(n)
                     if (directed or i <= j) and (self_loops or i != j)]
            s = np.asarray([p[0] for p in pairs])
            r = np.asarray([p[1] for p in pairs])
            idx, maxid = edge_encoding(s, r, n, directed=directed,
                                       self_loops=self_loops)
            assert len(set(idx.tolist())) == len(pairs) == maxid
            s2, r2 = edge_decoding(idx, n, directed=directed,
                                   self_loops=self_loops)
            if directed:
                np.testing.assert_array_equal(s2, s)
                np.testing.assert_array_equal(r2, r)
            else:
                np.testing.assert_array_equal(np.minimum(s2, r2), s)
                np.testing.assert_array_equal(np.maximum(s2, r2), r)


def test_color_refinement():
    # path graph: endpoints get one color, middles another
    g = gnn.graph([0, 1, 1, 2, 2, 3], [1, 0, 2, 1, 3, 2], num_nodes=4)
    colors, ncolors, niters = gnn.color_refinement(g)
    assert colors[0] == colors[3] and colors[1] == colors[2]
    assert colors[0] != colors[1]


def test_generators():
    g = gnn.rand_graph(20, 40, seed=0)
    assert int(g.num_edges) == 40
    assert bool(gnn.is_bidirected(g))
    gd = gnn.rand_graph(20, 31, seed=0, bidirected=False)
    assert int(gd.num_edges) == 31

    pts = np.random.default_rng(0).standard_normal((30, 3))
    gk = gnn.knn_graph(pts, 4)
    d = gnn.degree(gk, dir="in", edge_weight=False)
    assert np.all(np.asarray(d)[:30] == 4)
    gr = gnn.radius_graph(pts, 0.8)
    # symmetric by construction of the distance criterion
    assert bool(gnn.is_bidirected(gr))

    tg = gnn.rand_temporal_radius_graph(12, 4, 0.05, 0.4,
                                        rng=np.random.default_rng(0))
    assert tg.num_snapshots == 4
    th = gnn.rand_temporal_hyperbolic_graph(
        10, 3, alpha=1.0, R=2.0, speed=0.1,
        rng=np.random.default_rng(0))
    assert th.num_snapshots == 3


def test_laplacians_and_khop():
    g = gnn.graph([0, 1, 1, 2], [1, 0, 2, 1], num_nodes=3)
    L = np.asarray(gnn.laplacian_matrix(g))[:3, :3]
    np.testing.assert_allclose(L, np.array([[1, -1, 0],
                                            [-1, 2, -1],
                                            [0, -1, 1]]), atol=1e-6)
    NL = np.asarray(gnn.normalized_laplacian(g))[:3, :3]
    assert abs(NL[0, 0] - 1.0) < 1e-6
    lam = float(gnn.laplacian_lambda_max(g))
    assert 1.4 < lam <= 2.01
    A2 = np.asarray(gnn.khop_adj(g, 2))[:3, :3]
    A = np.asarray(gnn.adjacency_matrix(g))[:3, :3]
    np.testing.assert_allclose(A2, A @ A, atol=1e-5)


def test_random_walk_pe_and_ppr():
    g = gnn.graph([0, 1, 2], [1, 2, 0], num_nodes=3)  # directed cycle
    pe = np.asarray(gnn.random_walk_pe(g, 3))
    # cycle: return in exactly 3 steps
    np.testing.assert_allclose(pe[:3, 2], 1.0, atol=1e-5)
    np.testing.assert_allclose(pe[:3, 0], 0.0, atol=1e-5)
    g2 = gnn.ppr_diffusion(g, alpha=0.85)
    assert g2.edge_weight is not None
    assert np.isfinite(np.asarray(g2.edge_weight)).all()


def test_datastore():
    ds = DataStore(x=np.ones((5, 3)), y=np.zeros(5))
    assert ds.n == 5 and ds.x.shape == (5, 3)
    with pytest.raises(ValueError):
        DataStore(x=np.ones((5, 3)), y=np.zeros(4))
    sub = ds.getobs([0, 2])
    assert sub.n == 2
    m = ds.map(lambda v: v * 2)
    assert float(m.x[0, 0]) == 2.0
    cat = DataStore.cat([ds, ds])
    assert cat.n == 10


def test_intersect():
    g1 = gnn.graph([0, 1, 2], [1, 2, 0], num_nodes=3)
    g2 = gnn.graph([0, 2, 1], [1, 1, 0], num_nodes=3)
    gi = gnn.intersect_graphs(g1, g2)
    assert edges_set(gi) == {(0, 1)}


def test_checkpoint_roundtrip(tmp_path):
    tree = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
    gnn.save_checkpoint(str(tmp_path), 5, tree)
    assert gnn.latest_step(str(tmp_path)) == 5
    back = gnn.restore_checkpoint(str(tmp_path), tree)
    np.testing.assert_allclose(np.asarray(back["w"]),
                               np.asarray(tree["w"]))


def test_sort_edge_index_and_perturb(rng):
    g = gnn.rand_graph(10, 20, seed=0)
    g2 = gnn.sort_edge_index(g)
    assert edges_set(g2) == edges_set(g)
    g3 = gnn.perturb_edges(g, 0.5, rng=rng)
    assert int(g3.num_edges) == 30


def test_set_edge_weight_and_blockdiag():
    g = gnn.graph([0, 1], [1, 0], num_nodes=2)
    g2 = gnn.set_edge_weight(g, [2.0, 3.0])
    assert g2.edge_weight is not None
    gb = gnn.blockdiag(g, g)
    assert int(gb.num_nodes) == 4 and int(gb.num_edges) == 4
    assert (2, 3) in edges_set(gb)


def test_converters():
    g = gnn.from_adjacency_list([[1, 2], [2], []])
    assert edges_set(g) == {(0, 1), (0, 2), (1, 2)}
    try:
        import scipy.sparse  # noqa
    except ImportError:
        return
    A = gnn.to_scipy_sparse(g)
    assert A.shape == (3, 3) and A.nnz == 3
    g2 = gnn.from_scipy_sparse(A)
    assert edges_set(g2) == edges_set(g)
    D = gnn.to_dense_adjacency(g)
    assert D.shape == (3, 3) and D[0, 1] == 1


def test_graphs_parity_queries():
    g = gnn.graph([0, 1], [1, 2], num_nodes=4)
    assert bool(gnn.has_edge(g, 0, 1))
    assert not bool(gnn.has_edge(g, 1, 0))
    assert bool(gnn.has_isolated_nodes(g))  # node 3 isolated
    g2 = gnn.graph([0, 1, 2, 3], [1, 2, 3, 0], num_nodes=4)
    assert not bool(gnn.has_isolated_nodes(g2))
    assert gnn.is_directed(g) is True
    assert gnn.get_graph_type(g) == "coo"


def test_laplacian_lambda_max_per_graph_batch():
    """Batched λmax returns per-graph values matching numpy eigmax on each
    block (reference: per-graph loop at query.jl:598-610)."""
    rng = np.random.default_rng(7)
    gs = []
    for n, e in [(6, 14), (9, 24), (5, 8)]:
        gs.append(gnn.rand_graph(n, e, seed=int(rng.integers(1000)),
                                 bidirected=True))
    gb = gnn.batch(gs)
    lam = np.asarray(gnn.laplacian_lambda_max(gb, iters=200))
    assert lam.shape == (3,)
    for i, g in enumerate(gs):
        NL = np.asarray(gnn.normalized_laplacian(g))
        n = int(g.num_nodes)
        expect = np.linalg.eigvalsh(NL[:n, :n]).max()
        np.testing.assert_allclose(lam[i], expect, rtol=1e-4, atol=1e-4)


def test_chebconv_batched_matches_per_graph():
    """ChebConv on a batch == ChebConv per graph (per-block λmax scaling)."""
    from flax import nnx
    from graphneuralnetworks_tpu import models as M
    rng = np.random.default_rng(11)
    gs = []
    for n, e in [(6, 14), (10, 26)]:
        x = rng.normal(size=(n, 4)).astype(np.float32)
        gs.append(gnn.rand_graph(n, e, seed=int(rng.integers(1000)),
                                 bidirected=True, nodes={"x": x}))
    layer = M.ChebConv(4, 5, k=3, rngs=nnx.Rngs(0))
    gb = gnn.batch(gs)
    out_b = np.asarray(layer(gb, gb.x))
    off = 0
    for g in gs:
        n = int(g.num_nodes)
        out_1 = np.asarray(layer(g, g.x))[:n]
        np.testing.assert_allclose(out_b[off:off + n], out_1,
                                   rtol=2e-3, atol=2e-3)
        off += n
