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
