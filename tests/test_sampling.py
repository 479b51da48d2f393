"""Sampling tests: sample_neighbors / induced_subgraph / NeighborLoader
(native C++ path vs numpy fallback).

Reference analogs: GNNGraphs/test/sampling.jl and samplers.jl.
"""

import numpy as np
import pytest

import graphneuralnetworks_tpu as gnn
from graphneuralnetworks_tpu.sampling import (NeighborLoader,
                                              induced_subgraph,
                                              sample_neighbors)


def test_sample_neighbors_basic(rng):
    g = gnn.rand_graph(50, 400, seed=0)
    seeds = np.arange(10)
    sub = sample_neighbors(g, seeds, K=3, rng=rng)
    ne = int(sub.num_edges)
    assert ne <= 30
    r = np.asarray(sub.receivers)[:ne]
    assert set(r.tolist()) <= set(seeds.tolist())
    # per-seed cap
    cnt = np.bincount(r, minlength=50)
    assert cnt.max() <= 3
    # EID maps back to real edges of g
    eid = np.asarray(sub.edges["EID"])[:ne]
    gs = np.asarray(g.senders)
    gr = np.asarray(g.receivers)
    ss = np.asarray(sub.senders)[:ne]
    assert np.all(gs[eid] == ss) and np.all(gr[eid] == r)


def test_sample_neighbors_all(rng):
    g = gnn.rand_graph(30, 120, seed=1)
    sub = sample_neighbors(g, np.arange(30), K=-1, rng=rng)
    assert int(sub.num_edges) == int(g.num_edges)


def test_induced_subgraph():
    g = gnn.rand_graph(40, 200, seed=2)
    nodes = np.arange(0, 40, 2)
    sub = induced_subgraph(g, nodes)
    assert int(sub.num_nodes) == 20
    ne = int(sub.num_edges)
    s = np.asarray(sub.senders)[:ne]
    r = np.asarray(sub.receivers)[:ne]
    assert s.max(initial=0) < 20 and r.max(initial=0) < 20
    # edge count equals edges with both endpoints even
    gs = np.asarray(g.senders)[: int(g.num_edges)]
    gr = np.asarray(g.receivers)[: int(g.num_edges)]
    expect = int(((gs % 2 == 0) & (gr % 2 == 0)).sum())
    assert ne == expect


@pytest.mark.parametrize("force_py", [False, True])
def test_neighbor_loader_shapes(force_py, monkeypatch):
    if force_py:
        import graphneuralnetworks_tpu.sampling as S
        monkeypatch.setattr("graphneuralnetworks_tpu.native.sample_layers",
                            None, raising=False)
    x = np.random.default_rng(0).standard_normal((200, 5)).astype(np.float32)
    g = gnn.rand_graph(200, 2000, seed=3, nodes={"x": x})
    loader = NeighborLoader(g, num_neighbors=[3, 2], batch_size=16, seed=1)
    batches = list(loader)
    assert len(batches) == len(loader)
    shapes = {(b.n_pad, b.e_pad) for b in batches}
    assert len(shapes) == 1  # uniform static shapes
    b = batches[0]
    nn = int(b.num_nodes)
    nid = np.asarray(b.nodes["NID"])[:nn]
    # seed rows first and features correctly gathered
    np.testing.assert_allclose(np.asarray(b.nodes["x"])[:nn], x[nid],
                               rtol=1e-6)
    # every edge receiver is an in-batch node; senders valid
    ne = int(b.num_edges)
    assert np.asarray(b.senders)[:ne].max(initial=0) < nn
    # edges are real edges of g (check a few via set membership)
    es = set(zip(np.asarray(g.senders)[: int(g.num_edges)].tolist(),
                 np.asarray(g.receivers)[: int(g.num_edges)].tolist()))
    ss = nid[np.asarray(b.senders)[:ne]]
    rr = nid[np.asarray(b.receivers)[:ne]]
    for a, c in list(zip(ss.tolist(), rr.tolist()))[:50]:
        assert (a, c) in es


def test_native_sampler_available():
    from graphneuralnetworks_tpu import native
    assert native.available(), "C++ sampler failed to build"
    g = gnn.rand_graph(100, 1000, seed=4)
    ne = int(g.num_edges)
    r = np.asarray(g.receivers)[:ne]
    s = np.asarray(g.senders)
    order = np.argsort(r, kind="stable")
    ptr = np.concatenate([[0], np.cumsum(np.bincount(r, minlength=100))])
    csr_send = s[:ne][order].astype(np.int32)
    csr_eid = order.astype(np.int32)
    nid, es, er, eid = native.sample_layers(csr_send, csr_eid, ptr,
                                            np.arange(8), [4, 3], False, 42)
    assert len(nid) >= 8
    assert es.max(initial=0) < len(nid)
    # sampled edges exist in g
    eset = set(zip(s[:ne][order].tolist(), r[order].tolist()))
    for a, b in zip(nid[es].tolist(), nid[er].tolist()):
        assert (a, b) in eset
    # EID maps each sampled edge to its original (global) edge
    gr = np.asarray(g.receivers)[:ne]
    np.testing.assert_array_equal(nid[es], s[:ne][eid])
    np.testing.assert_array_equal(nid[er], gr[eid])


def test_neighbor_loader_spmm_aux_one_trace():
    """Loader batches with build_spmm_aux share ONE jit trace (fixed aux
    shapes) and match the XLA path numerically."""
    import jax
    import jax.numpy as jnp
    from graphneuralnetworks_tpu import ops

    rng = np.random.default_rng(0)
    g = gnn.rand_graph(300, 1800, seed=4,
                       nodes={"x": rng.standard_normal((300, 8))
                              .astype(np.float32)})
    loader = gnn.NeighborLoader(g, num_neighbors=[4, 3], batch_size=16,
                                seed=1, build_spmm_aux=True)
    traces = []

    @jax.jit
    def step(b, x):
        traces.append(1)
        return ops.propagate(ops.copy_xj, b, "sum", xj=x)

    batches = []
    for i, b in enumerate(loader):
        assert b.spmm_aux is not None
        out = step(b, b.x)
        ref = ops.propagate(ops.copy_xj, b.replace(spmm_aux=None), "sum",
                            xj=b.x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        batches.append(b)
        if i >= 3:
            break
    assert len(traces) == 1  # identical shapes -> single compilation


def test_neighbor_loader_from_csr_matches_default():
    # from_csr (the disk-cache path bench.py uses at ogbn scale) must
    # produce identical batches to the in-place CSR build
    import numpy as np
    from graphneuralnetworks_tpu.sampling import NeighborLoader
    import graphneuralnetworks_tpu as gnn
    rng = np.random.default_rng(3)
    n, e = 60, 240
    g = gnn.graph(rng.integers(0, n, e), rng.integers(0, n, e), num_nodes=n)
    kw = dict(num_neighbors=[3, 2], batch_size=8, seed=7,
              input_nodes=np.arange(24), minimal_batch=True)
    a = NeighborLoader(g, **kw)
    b = NeighborLoader.from_csr(a._csr_send.copy(), a._csr_eid.copy(),
                                a._ptr.copy(), num_nodes=n, **kw)
    assert len(a) == len(b) and a.n_pad == b.n_pad and a.e_pad == b.e_pad
    for ga, gb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ga.senders),
                                      np.asarray(gb.senders))
        np.testing.assert_array_equal(np.asarray(ga.receivers),
                                      np.asarray(gb.receivers))
        np.testing.assert_array_equal(np.asarray(ga.nodes["NID"]),
                                      np.asarray(gb.nodes["NID"]))
