"""Real-format dataset loader tests: TUDataset raw files + Planetoid raw
pickles, parsed from fixtures written on the fly (no network).

Reference: GNNGraphs/src/mldatasets.jl:25-41 and the Cora/TUDataset example
pipelines.
"""

import os
import pickle

import numpy as np
import pytest

from graphneuralnetworks_tpu.data.datasets import (load_cora,
                                                   planetoid_from_raw,
                                                   tudataset_from_files)


def _write_tudataset(d, name="TOY"):
    # 2 graphs: triangle (3 nodes) + path (2 nodes); 1-based global ids
    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3),  # graph 1
             (4, 5), (5, 4)]                                   # graph 2
    with open(os.path.join(d, f"{name}_A.txt"), "w") as f:
        f.writelines(f"{a}, {b}\n" for a, b in edges)
    with open(os.path.join(d, f"{name}_graph_indicator.txt"), "w") as f:
        f.write("1\n1\n1\n2\n2\n")
    with open(os.path.join(d, f"{name}_graph_labels.txt"), "w") as f:
        f.write("-1\n1\n")
    with open(os.path.join(d, f"{name}_node_labels.txt"), "w") as f:
        f.write("0\n1\n2\n1\n0\n")
    with open(os.path.join(d, f"{name}_edge_labels.txt"), "w") as f:
        f.writelines("0\n1\n0\n1\n0\n1\n0\n1\n".splitlines(keepends=True))
    with open(os.path.join(d, f"{name}_node_attributes.txt"), "w") as f:
        f.writelines(f"{i * 0.5}, {i * 1.5}\n" for i in range(5))


def test_tudataset_from_files(tmp_path):
    _write_tudataset(str(tmp_path))
    graphs, y = tudataset_from_files(str(tmp_path), "TOY")
    assert len(graphs) == 2
    np.testing.assert_array_equal(y, [0, 1])  # -1/1 densified to 0/1
    g1, g2 = graphs
    assert int(g1.num_nodes) == 3 and int(g1.num_edges) == 6
    assert int(g2.num_nodes) == 2 and int(g2.num_edges) == 2
    # node features = one-hot(3 label values) ++ 2 attributes
    x1 = np.asarray(g1.nodes["x"])[:3]
    assert x1.shape == (3, 5)
    np.testing.assert_allclose(x1[0], [1, 0, 0, 0.0, 0.0])
    np.testing.assert_allclose(x1[2], [0, 0, 1, 1.0, 3.0])
    # graph-2 node ids re-based to 0
    ne2 = int(g2.num_edges)
    assert np.asarray(g2.senders)[:ne2].max() < 2
    # edge labels one-hot in edata
    assert np.asarray(g1.edges["e"]).shape[1] == 2
    # graph label rides gdata
    assert int(np.asarray(g2.globals_["y"])[0]) == 1


def _write_planetoid(d, name="cora", *, n_all=8, n_test=4, nf=6, nc=3,
                     seed=0):
    """Tiny raw Planetoid fixture: allx (n_all rows) + tx (n_test rows),
    test.index SHUFFLED to exercise the re-seating logic."""
    rng = np.random.default_rng(seed)
    n = n_all + n_test
    allx = rng.random((n_all, nf)).astype(np.float32)
    tx = rng.random((n_test, nf)).astype(np.float32)
    ally = np.eye(nc, dtype=np.float32)[rng.integers(0, nc, n_all)]
    ty = np.eye(nc, dtype=np.float32)[rng.integers(0, nc, n_test)]
    x = allx[:3]
    y = ally[:3]
    test_idx = rng.permutation(np.arange(n_all, n))  # shuffled!
    adj = {i: [int(j) for j in rng.choice(n, 2, replace=False) if j != i]
           for i in range(n)}
    for suffix, obj in [("x", x), ("tx", tx), ("allx", allx), ("y", y),
                        ("ty", ty), ("ally", ally), ("graph", adj)]:
        with open(os.path.join(d, f"ind.{name}.{suffix}"), "wb") as f:
            pickle.dump(obj, f)
    np.savetxt(os.path.join(d, f"ind.{name}.test.index"), test_idx,
               fmt="%d")
    return allx, tx, ally, ty, test_idx


def test_planetoid_from_raw(tmp_path):
    allx, tx, ally, ty, test_idx = _write_planetoid(str(tmp_path))
    data = planetoid_from_raw(str(tmp_path), "cora")
    n = allx.shape[0] + tx.shape[0]
    g = data.graph
    assert int(g.num_nodes) == n
    # features re-seated: node test_idx[i] must hold tx row i (row-normalized)
    feats = np.asarray(g.nodes["x"])
    for i, node in enumerate(test_idx):
        expect = tx[i] / max(tx[i].sum(), 1e-12)
        np.testing.assert_allclose(feats[node], expect, rtol=1e-5)
    labels = np.asarray(g.nodes["y"])
    for i, node in enumerate(test_idx):
        assert labels[node] == ty[i].argmax()
    # splits: Planetoid protocol
    assert data.train_mask[:3].all() and not data.train_mask[3:].any()
    assert data.test_mask[test_idx].all()
    assert int(data.test_mask.sum()) == len(test_idx)
    # edges symmetric, no self loops
    ne = int(g.num_edges)
    s = np.asarray(g.senders)[:ne]
    r = np.asarray(g.receivers)[:ne]
    es = set(zip(s.tolist(), r.tolist()))
    assert all((b, a) in es for a, b in es)
    assert np.all(s != r)


def test_load_cora_uses_real_when_present(tmp_path, monkeypatch):
    _write_planetoid(str(tmp_path))
    monkeypatch.setenv("GNN_CORA_DIR", str(tmp_path))
    data, is_real = load_cora()
    assert is_real
    assert int(data.graph.num_nodes) == 12
    monkeypatch.setenv("GNN_CORA_DIR", str(tmp_path / "missing"))
    data, is_real = load_cora()
    assert not is_real
    assert int(data.graph.num_nodes) == 2708


# ---- OGB-format loader (BASELINE.md north-star dataset layout) -------------

def _write_ogbn_raw(d):
    os.makedirs(os.path.join(d, "raw"))
    os.makedirs(os.path.join(d, "split", "sales_ranking"))
    import gzip
    # 6 nodes, 8 directed edges
    edges = [(0, 1), (1, 0), (2, 1), (3, 4), (4, 5), (5, 3), (0, 5), (2, 4)]
    with gzip.open(os.path.join(d, "raw", "edge.csv.gz"), "wt") as f:
        f.writelines(f"{a},{b}\n" for a, b in edges)
    with gzip.open(os.path.join(d, "raw", "node-feat.csv.gz"), "wt") as f:
        f.writelines(f"{i * 0.5},{i * 1.5},{-i * 1.0}\n" for i in range(6))
    with gzip.open(os.path.join(d, "raw", "node-label.csv.gz"), "wt") as f:
        f.write("0\n1\n2\n1\n0\n2\n")
    sp = os.path.join(d, "split", "sales_ranking")
    with gzip.open(os.path.join(sp, "train.csv.gz"), "wt") as f:
        f.write("0\n1\n2\n3\n")
    with gzip.open(os.path.join(sp, "valid.csv.gz"), "wt") as f:
        f.write("4\n")
    with gzip.open(os.path.join(sp, "test.csv.gz"), "wt") as f:
        f.write("5\n")


def test_ogbn_from_files_raw_csv(tmp_path):
    from graphneuralnetworks_tpu.data.datasets import ogbn_from_files
    _write_ogbn_raw(str(tmp_path))
    d = ogbn_from_files(str(tmp_path))
    assert d.num_nodes == 6 and len(d.senders) == 8
    np.testing.assert_array_equal(d.senders[:3], [0, 1, 2])
    np.testing.assert_array_equal(d.receivers[:3], [1, 0, 1])
    assert d.x.shape == (6, 3)
    np.testing.assert_allclose(d.x[2], [1.0, 3.0, -2.0])
    np.testing.assert_array_equal(d.y, [0, 1, 2, 1, 0, 2])
    np.testing.assert_array_equal(d.splits["train"], [0, 1, 2, 3])
    np.testing.assert_array_equal(d.splits["test"], [5])


def test_ogbn_from_files_npz_roundtrip(tmp_path):
    from graphneuralnetworks_tpu.data.datasets import ogbn_from_files
    _write_ogbn_raw(str(tmp_path))
    ref = ogbn_from_files(str(tmp_path))
    np.savez(tmp_path / "ogbn.npz",
             edge_index=np.stack([ref.senders, ref.receivers]),
             node_feat=ref.x, node_label=ref.y,
             train_idx=ref.splits["train"], valid_idx=ref.splits["valid"],
             test_idx=ref.splits["test"])
    d = ogbn_from_files(str(tmp_path))   # npz now preferred
    np.testing.assert_array_equal(d.senders, ref.senders)
    np.testing.assert_allclose(d.x, ref.x)
    np.testing.assert_array_equal(d.splits["valid"], [4])


def test_ogbn_feeds_neighbor_loader(tmp_path):
    from types import SimpleNamespace
    from graphneuralnetworks_tpu.data.datasets import ogbn_from_files
    from graphneuralnetworks_tpu.sampling import NeighborLoader
    _write_ogbn_raw(str(tmp_path))
    d = ogbn_from_files(str(tmp_path))
    shim = SimpleNamespace(num_nodes=d.num_nodes, num_edges=len(d.senders),
                           senders=d.senders, receivers=d.receivers,
                           nodes={}, edges={}, edge_weight=None)
    loader = NeighborLoader(shim, num_neighbors=[2], batch_size=2,
                            input_nodes=d.splits["train"], seed=0)
    batches = list(loader)
    assert len(batches) == 2
    for gb in batches:
        nid = np.asarray(gb.nodes["NID"])[:int(gb.num_nodes)]
        assert nid.max() < d.num_nodes


def test_load_ogbn_products_absent_is_graceful(monkeypatch, tmp_path):
    from graphneuralnetworks_tpu.data.datasets import load_ogbn_products
    monkeypatch.setenv("GNN_OGBN_PRODUCTS_DIR", str(tmp_path / "nope"))
    monkeypatch.chdir(tmp_path)
    data, is_real = load_ogbn_products()
    assert data is None and is_real is False


# ---- METRLA-format loader (traffic_prediction_metrla.jl dataset) -----------

def _write_metrla_h5(d, T=12, N=5):
    import h5py
    rng = np.random.default_rng(0)
    sig = rng.standard_normal((T, N)).astype(np.float32) * 10 + 60
    # pandas fixed-format layout: df/axis0 (columns), axis1 (index),
    # block0_values
    with h5py.File(os.path.join(d, "metr-la.h5"), "w") as f:
        g = f.create_group("df")
        g.create_dataset("axis0", data=np.arange(N))
        g.create_dataset("axis1", data=np.arange(T) * 300)
        g.create_dataset("block0_values", data=sig)
    adj = np.zeros((N, N), np.float32)
    ring = np.arange(N)
    adj[ring, (ring + 1) % N] = 0.8
    adj[ring, ring] = 1.0
    with open(os.path.join(d, "adj_mx.pkl"), "wb") as f:
        pickle.dump((list(range(N)), {i: i for i in range(N)}, adj), f)
    return sig, adj


def test_metrla_from_files_h5(tmp_path):
    from graphneuralnetworks_tpu.data.datasets import metrla_from_files
    sig, adj = _write_metrla_h5(str(tmp_path))
    d = metrla_from_files(str(tmp_path))
    assert d.num_nodes == 5
    assert d.signal.shape == (12, 5, 1)
    np.testing.assert_allclose(d.signal[:, :, 0], sig)
    assert len(d.senders) == int((adj != 0).sum())
    # edge weights carry the adjacency values
    w = dict(zip(zip(d.senders.tolist(), d.receivers.tolist()),
                 d.edge_weight.tolist()))
    assert abs(w[(0, 1)] - 0.8) < 1e-6 and abs(w[(0, 0)] - 1.0) < 1e-6
    assert d.timestamps is not None and len(d.timestamps) == 12


def test_metrla_from_files_npz(tmp_path):
    from graphneuralnetworks_tpu.data.datasets import metrla_from_files
    rng = np.random.default_rng(1)
    sig = rng.standard_normal((8, 4, 2)).astype(np.float32)
    adj = np.eye(4, dtype=np.float32)
    np.savez(tmp_path / "metrla.npz", signal=sig, adj=adj)
    d = metrla_from_files(str(tmp_path))
    assert d.signal.shape == (8, 4, 2) and d.num_nodes == 4
    np.testing.assert_array_equal(d.senders, d.receivers)


def test_metrla_builds_temporal_graph(tmp_path):
    # the loader output feeds the temporal layer family end to end
    import jax
    import graphneuralnetworks_tpu as gnn
    from flax import nnx
    from graphneuralnetworks_tpu import models as M
    from graphneuralnetworks_tpu.data.datasets import metrla_from_files
    _write_metrla_h5(str(tmp_path))
    d = metrla_from_files(str(tmp_path))
    g = gnn.graph(d.senders, d.receivers, num_nodes=d.num_nodes,
                  edge_weight=d.edge_weight)
    cell = M.TGCNCell(1, 4, rngs=nnx.Rngs(0))
    sig = np.pad(d.signal, ((0, 0), (0, g.n_pad - d.num_nodes), (0, 0)))
    h = None
    for t in range(3):
        h, out = cell(g, jax.numpy.asarray(sig[t]), h)
    assert out.shape == (g.n_pad, 4)


def test_temporalbrains_from_files(tmp_path):
    """Round-trip the TemporalBrains format loader on a synthetic fixture
    (reference consumer: examples/graph_classification_temporalbrains.jl
    via MLDatasets.TemporalBrains)."""
    import numpy as np
    from graphneuralnetworks_tpu.data import temporalbrains_from_files

    rng = np.random.default_rng(0)
    S, T, N = 4, 3, 10
    activity = rng.standard_normal((S, T, N)).astype(np.float32)
    labels = np.array(["F", "M", "M", "F"])
    ptr = [0]
    ss, rr = [], []
    for _ in range(S * T):
        e = int(rng.integers(4, 12))
        ss += list(rng.integers(0, N, e))
        rr += list(rng.integers(0, N, e))
        ptr.append(len(ss))
    np.savez(tmp_path / "temporalbrains.npz",
             activity=activity, labels=labels,
             edge_ptr=np.asarray(ptr, np.int64),
             senders=np.asarray(ss, np.int32),
             receivers=np.asarray(rr, np.int32))
    data = temporalbrains_from_files(str(tmp_path))
    assert data.num_subjects == S and data.num_snapshots == T
    assert list(data.labels) == [0, 1, 1, 0]

    tg = data.subject(1)
    assert tg.num_snapshots == T
    assert int(tg.tgdata["y"]) == 1
    g0 = tg.snapshots[0]
    # reference feature construction: x = [I(N) | activity]
    assert g0.nodes["x"].shape[1] == N + 1
    np.testing.assert_allclose(np.asarray(g0.nodes["x"][:N, :N]), np.eye(N))
    np.testing.assert_allclose(np.asarray(g0.nodes["x"][:N, N]),
                               activity[1, 0], rtol=1e-6)
    lo, hi = ptr[T], ptr[T + 1]
    ne = int(g0.num_edges)
    assert ne == hi - lo
    got = sorted(zip(np.asarray(g0.senders)[:ne].tolist(),
                     np.asarray(g0.receivers)[:ne].tolist()))
    want = sorted(zip(ss[lo:hi], rr[lo:hi]))
    assert got == want

    # split-file layout
    np.save(tmp_path / "activity.npy", activity)
    np.save(tmp_path / "labels.npy", np.asarray([0, 1, 1, 0], np.int32))
    np.savez(tmp_path / "edges.npz", edge_ptr=np.asarray(ptr, np.int64),
             senders=np.asarray(ss, np.int32),
             receivers=np.asarray(rr, np.int32))
    (tmp_path / "temporalbrains.npz").unlink()
    data2 = temporalbrains_from_files(str(tmp_path))
    np.testing.assert_array_equal(data2.labels, data.labels)
