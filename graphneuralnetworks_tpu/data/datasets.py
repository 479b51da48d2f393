"""Dataset glue and built-in synthetic benchmark datasets.

Reference parity: GNNGraphs/src/mldatasets.jl:25-41 (`mldataset2gnngraph`, a
duck-typed adapter from MLDatasets-style objects) and the Cora / TUDataset
training examples (GraphNeuralNetworks/examples/node_classification_cora.jl,
graph_classification_tudataset.jl).

This build environment has no network egress, so the integration-test datasets
are *seeded synthetic analogs* with the same shapes, sparsity, and split
protocol as the originals:

- :func:`synthetic_cora` — a 2708-node, 7-class stochastic block model with
  class-correlated sparse binary bag-of-words features (1433 dims) and
  Planetoid-style splits (140 train / 500 val / 1000 test). A well-built GCN
  reaches >>69% test accuracy on it (the reference CI bar,
  test/examples/node_classification_cora.jl:100-101); an untrained or broken
  model sits at ~14%.
- :func:`synthetic_tudataset` — MUTAG-like small molecular graphs whose
  binary label depends on a structural motif + feature signal.

:func:`planetoid_from_files` loads real Planetoid .npz dumps if the user
provides them on disk (same arrays; no download).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..graph import GraphTuple, graph

__all__ = ["synthetic_cora", "synthetic_tudataset", "mldataset_to_graph",
           "planetoid_from_files"]


@dataclasses.dataclass
class NodeClassificationData:
    graph: GraphTuple
    num_classes: int
    train_mask: np.ndarray
    val_mask: np.ndarray
    test_mask: np.ndarray


def synthetic_cora(*, seed: int = 0, num_nodes: int = 2708,
                   num_classes: int = 7, num_features: int = 1433,
                   avg_degree: float = 3.9, homophily: float = 0.81,
                   n_pad: int | None = None,
                   e_pad: int | None = None) -> NodeClassificationData:
    """Cora-analog citation graph (see module docstring).

    Matches Cora's headline stats: 2708 nodes, ~10.5k directed edges after
    symmetrization, 1433 binary features, 7 classes, strong homophily.
    """
    rng = np.random.default_rng(seed)
    y = rng.integers(0, num_classes, num_nodes)

    # --- edges: homophilous configuration-ish model --------------------------
    m = int(avg_degree * num_nodes / 2)
    src = rng.integers(0, num_nodes, 4 * m)
    dst = rng.integers(0, num_nodes, 4 * m)
    same = y[src] == y[dst]
    keep_p = np.where(same, 1.0, (1 - homophily) / max(homophily, 1e-9)
                      / (num_classes - 1))
    keep = rng.random(4 * m) < keep_p
    src, dst = src[keep], dst[keep]
    order = rng.permutation(len(src))[:m]
    src, dst = src[order], dst[order]
    ok = src != dst
    src, dst = src[ok], dst[ok]
    s = np.concatenate([src, dst])
    r = np.concatenate([dst, src])

    # --- features: class-prototype sparse bag-of-words ----------------------
    words_per_class = num_features // num_classes
    x = np.zeros((num_nodes, num_features), np.float32)
    n_words = 18  # ~Cora's avg nonzeros per row
    for i in range(num_nodes):
        # 70% of words from the class vocabulary block, 30% anywhere
        k_cls = int(n_words * 0.7)
        lo = y[i] * words_per_class
        wc = rng.integers(lo, lo + words_per_class, k_cls)
        wr = rng.integers(0, num_features, n_words - k_cls)
        x[i, np.concatenate([wc, wr])] = 1.0
    # row-normalize like the Planetoid preprocessing
    x /= np.maximum(x.sum(1, keepdims=True), 1)

    # --- Planetoid splits ----------------------------------------------------
    train_mask = np.zeros(num_nodes, bool)
    val_mask = np.zeros(num_nodes, bool)
    test_mask = np.zeros(num_nodes, bool)
    perm = rng.permutation(num_nodes)
    per_class = 20
    count = {c: 0 for c in range(num_classes)}
    for i in perm:
        c = int(y[i])
        if count[c] < per_class:
            train_mask[i] = True
            count[c] = count[c] + 1
    rest = perm[~train_mask[perm]]
    val_mask[rest[:500]] = True
    test_mask[rest[500:1500]] = True

    g = graph(s, r, num_nodes=num_nodes,
              nodes={"x": x, "y": y.astype(np.int32)},
              n_pad=n_pad, e_pad=e_pad)
    npad = g.n_pad

    def padm(mk):
        return np.pad(mk, (0, npad - num_nodes))

    return NodeClassificationData(g, num_classes, padm(train_mask),
                                  padm(val_mask), padm(test_mask))


def synthetic_tudataset(num_graphs: int = 188, *, seed: int = 0,
                        min_nodes: int = 10, max_nodes: int = 28,
                        num_features: int = 7) -> tuple[list, np.ndarray]:
    """MUTAG-analog binary graph classification set.

    Returns (list_of_GraphTuple_with_onehot_ndata, labels). Positive graphs
    contain a ring motif plus a feature shift; negatives are trees/sparse.
    """
    rng = np.random.default_rng(seed)
    graphs, labels = [], []
    for i in range(num_graphs):
        n = int(rng.integers(min_nodes, max_nodes + 1))
        label = int(rng.random() < 0.66)  # MUTAG is ~2:1
        # random spanning tree
        s_list, r_list = [], []
        for v in range(1, n):
            u = int(rng.integers(0, v))
            s_list += [u, v]
            r_list += [v, u]
        if label:
            # add a ring over a random subset (the "motif")
            k = min(6, n)
            ring = rng.choice(n, k, replace=False)
            for a, b in zip(ring, np.roll(ring, 1)):
                s_list += [int(a), int(b)]
                r_list += [int(b), int(a)]
        # one-hot "atom types", class-dependent distribution
        probs = np.full(num_features, 1.0 / num_features)
        if label:
            probs = np.array([0.3, 0.3, 0.1, 0.1, 0.1, 0.05, 0.05])
            probs = probs[:num_features] / probs[:num_features].sum()
        types = rng.choice(num_features, n, p=probs)
        x = np.eye(num_features, dtype=np.float32)[types]
        graphs.append(graph(s_list, r_list, num_nodes=n, nodes={"x": x},
                            globals_={"y": np.asarray([label], np.int32)}))
        labels.append(label)
    return graphs, np.asarray(labels, np.int32)


def mldataset_to_graph(dataset) -> GraphTuple:
    """Duck-typed adapter from MLDatasets/PyG-style graph objects.

    Reference: GNNGraphs/src/mldatasets.jl:25-41 — reads ``num_nodes``,
    ``edge_index`` (pair of index arrays), ``node_data``/``edge_data`` dicts
    (or ``x``/``y``/``edge_attr`` attributes).
    """
    obj = dataset
    if hasattr(obj, "graphs") and len(getattr(obj, "graphs")) == 1:
        obj = obj.graphs[0]
    ei = getattr(obj, "edge_index")
    s, r = np.asarray(ei[0]), np.asarray(ei[1])
    num_nodes = int(getattr(obj, "num_nodes"))
    nodes, edges = {}, {}
    nd = getattr(obj, "node_data", None)
    if nd is not None:
        nodes = {k: np.asarray(v) for k, v in dict(nd).items()}
    else:
        for k in ("x", "y"):
            v = getattr(obj, k, None)
            if v is not None:
                nodes[k] = np.asarray(v)
    ed = getattr(obj, "edge_data", None)
    if ed is not None:
        edges = {k: np.asarray(v) for k, v in dict(ed).items()}
    elif getattr(obj, "edge_attr", None) is not None:
        edges["e"] = np.asarray(obj.edge_attr)
    return graph(s, r, num_nodes=num_nodes, nodes=nodes or None,
                 edges=edges or None)


def planetoid_from_files(path: str) -> NodeClassificationData:
    """Load a Planetoid-style .npz (x, y, edge_index, masks) from disk."""
    z = np.load(path)
    s, r = z["edge_index"]
    g = graph(s, r, num_nodes=z["x"].shape[0],
              nodes={"x": z["x"].astype(np.float32),
                     "y": z["y"].astype(np.int32)})
    pad = g.n_pad - z["x"].shape[0]

    def padm(mk):
        return np.pad(mk.astype(bool), (0, pad))

    return NodeClassificationData(g, int(z["y"].max()) + 1,
                                  padm(z["train_mask"]), padm(z["val_mask"]),
                                  padm(z["test_mask"]))
