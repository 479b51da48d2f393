"""Regression tests for the round-1 review findings (VERDICT.md r1 §weak).

Each test pins one concrete bug fixed in round 2:
  1. NeighborLoader dropping edge_weight / edata / EID
  2. GCNConv bipartite path ignoring edge weights
  3. segment_reduce raising TypeError (shadowed builtin) on unknown aggr
  4. remove_multi_edges corrupting integer edge features
  5. negative_sample silent shortfall / broken bidirected pairs
"""

import numpy as np
import pytest

import jax.numpy as jnp
from flax import nnx

import graphneuralnetworks_tpu as gnn
from graphneuralnetworks_tpu import models as M
from graphneuralnetworks_tpu import transform
from graphneuralnetworks_tpu.ops.segment import segment_reduce
from graphneuralnetworks_tpu.sampling import NeighborLoader


def test_segment_reduce_unknown_aggr_is_value_error():
    data = jnp.ones((4, 2))
    ids = jnp.array([0, 0, 1, 1])
    with pytest.raises(ValueError, match="unknown aggregation"):
        segment_reduce("median", data, ids, 2)


@pytest.mark.parametrize("aggr", ["sum", "mean", "max", "min", "first"])
def test_remove_multi_edges_int_features(aggr):
    # duplicate edge 0->1 (x3) and 2->3 (x2) with int features
    s = np.array([0, 0, 0, 2, 2, 1])
    r = np.array([1, 1, 1, 3, 3, 0])
    feat = np.array([1, 5, 3, 10, 20, 7], dtype=np.int32)
    g = gnn.graph(s, r, num_nodes=4, edges={"e": feat})
    out = transform.remove_multi_edges(g, aggr=aggr)
    ne = int(out.num_edges)
    assert ne == 3
    os = np.asarray(out.senders)[:ne]
    orr = np.asarray(out.receivers)[:ne]
    oe = np.asarray(out.edges["e"])[:ne]
    assert oe.dtype == np.int32
    got = {(int(a), int(b)): int(v) for a, b, v in zip(os, orr, oe)}
    expect = {
        "sum": {(0, 1): 9, (2, 3): 30, (1, 0): 7},
        "mean": {(0, 1): 3, (2, 3): 15, (1, 0): 7},
        "max": {(0, 1): 5, (2, 3): 20, (1, 0): 7},
        "min": {(0, 1): 1, (2, 3): 10, (1, 0): 7},
        "first": {(0, 1): 1, (2, 3): 10, (1, 0): 7},
    }[aggr]
    assert got == expect


def test_negative_sample_exact_count_and_no_leak(rng):
    g = gnn.rand_graph(30, 200, seed=3, bidirected=False)
    neg = transform.negative_sample(g, num_neg_edges=150, rng=rng,
                                    bidirected=False)
    ne = int(neg.num_edges)
    assert ne == 150  # no silent shortfall
    s = np.asarray(neg.senders)[:ne]
    r = np.asarray(neg.receivers)[:ne]
    pos = set(zip(np.asarray(g.senders)[: int(g.num_edges)].tolist(),
                  np.asarray(g.receivers)[: int(g.num_edges)].tolist()))
    assert not (set(zip(s.tolist(), r.tolist())) & pos)
    assert np.all(s != r)
    # no duplicate negatives
    assert len(set(zip(s.tolist(), r.tolist()))) == ne


def test_negative_sample_bidirected_pairs_intact(rng):
    g = gnn.rand_graph(24, 120, seed=4, bidirected=True)
    neg = transform.negative_sample(g, num_neg_edges=60, rng=rng)
    ne = int(neg.num_edges)
    assert ne == 60
    s = np.asarray(neg.senders)[:ne]
    r = np.asarray(neg.receivers)[:ne]
    es = set(zip(s.tolist(), r.tolist()))
    # every negative edge's reverse is also present (bidirected invariant)
    assert all((b, a) in es for a, b in es)
    pos = set(zip(np.asarray(g.senders)[: int(g.num_edges)].tolist(),
                  np.asarray(g.receivers)[: int(g.num_edges)].tolist()))
    assert not (es & pos)


def test_negative_sample_warns_when_exhausted(rng):
    # K4 complete directed graph: 0 non-edges available
    s, r = zip(*[(i, j) for i in range(4) for j in range(4) if i != j])
    g = gnn.graph(np.array(s), np.array(r), num_nodes=4)
    with pytest.warns(UserWarning, match="non-edges"):
        neg = transform.negative_sample(g, num_neg_edges=10, rng=rng,
                                        bidirected=False)
    assert int(neg.num_edges) == 0


@pytest.mark.parametrize("force_py", [False, True])
def test_neighbor_loader_keeps_edge_data(force_py, monkeypatch):
    if force_py:
        import graphneuralnetworks_tpu.native as native
        monkeypatch.setattr(native, "sample_layers", None)
    g = gnn.rand_graph(60, 480, seed=5)
    ne = int(g.num_edges)
    w = np.arange(ne, dtype=np.float32) + 1.0
    ef = np.stack([np.arange(ne), np.arange(ne) * 2], axis=1) \
        .astype(np.float32)
    g = gnn.graph(np.asarray(g.senders)[:ne], np.asarray(g.receivers)[:ne],
                  num_nodes=60, edge_weight=w, edges={"ef": ef},
                  nodes={"x": np.random.default_rng(0).normal(
                      size=(60, 4)).astype(np.float32)})
    loader = NeighborLoader(g, num_neighbors=[3, 2], batch_size=8, seed=1)
    batch = next(iter(loader))
    bne = int(batch.num_edges)
    assert "EID" in batch.edges and "ef" in batch.edges
    assert batch.edge_weight is not None
    eid = np.asarray(batch.edges["EID"])[:bne]
    # edge weight/features correspond to the original edges via EID
    np.testing.assert_allclose(np.asarray(batch.edge_weight)[:bne],
                               np.asarray(g.edge_weight)[eid])
    np.testing.assert_allclose(np.asarray(batch.edges["ef"])[:bne],
                               np.asarray(g.edges["ef"])[eid])
    # endpoints match the original edges too (in original node ids)
    nid = np.asarray(batch.nodes["NID"])
    bs = nid[np.asarray(batch.senders)[:bne]]
    br = nid[np.asarray(batch.receivers)[:bne]]
    gs = np.asarray(g.senders)[: int(g.num_edges)]
    gr = np.asarray(g.receivers)[: int(g.num_edges)]
    np.testing.assert_array_equal(bs, gs[eid])
    np.testing.assert_array_equal(br, gr[eid])


def test_gcnconv_bipartite_uses_edge_weight():
    # bipartite relation: 5 src nodes -> 3 dst nodes
    rngs = nnx.Rngs(0)
    s = np.array([0, 1, 2, 3, 4, 0])
    r = np.array([0, 0, 1, 1, 2, 2])
    w = np.array([2.0, 0.5, 1.5, 3.0, 1.0, 0.25], np.float32)
    g = gnn.graph(s, r, num_nodes=5, edge_weight=w)
    xsrc = np.random.default_rng(1).normal(size=(5, 4)).astype(np.float32)
    xdst = np.zeros((3, 4), np.float32)
    xs = jnp.asarray(np.pad(xsrc, ((0, g.n_pad - 5), (0, 0))))
    xd = jnp.asarray(np.pad(xdst, ((0, g.n_pad - 3), (0, 0))))

    layer = M.GCNConv(4, 4, use_edge_weight=True, use_bias=False,
                      rngs=rngs)
    out_w = layer(g, (xs, xd))

    # oracle: unweighted degree norms (reference hetero path), weighted msg
    ne = 6
    dout = np.bincount(s, minlength=g.n_pad).astype(np.float64)
    din = np.bincount(r, minlength=g.n_pad).astype(np.float64)
    co = np.where(dout > 0, 1 / np.sqrt(dout), 0.0)
    ci = np.where(din > 0, 1 / np.sqrt(din), 0.0)
    xjc = np.asarray(xs, np.float64) * co[:, None]
    m = np.zeros((g.n_pad, 4))
    for k in range(ne):
        m[r[k]] += w[k] * xjc[s[k]]
    m = m * ci[:, None]
    expect = m @ np.asarray(layer.weight.value, np.float64)
    np.testing.assert_allclose(np.asarray(out_w, np.float64)[:3],
                               expect[:3], rtol=1e-5, atol=1e-6)
    # and it must differ from the unweighted result
    layer2 = M.GCNConv(4, 4, use_edge_weight=False, use_bias=False,
                       rngs=nnx.Rngs(0))
    out_u = layer2(g, (xs, xd))
    assert not np.allclose(np.asarray(out_w)[:3], np.asarray(out_u)[:3])
