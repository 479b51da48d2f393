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
           "planetoid_from_files", "planetoid_from_raw",
           "tudataset_from_files", "load_cora",
           "LargeGraphData", "ogbn_from_files", "load_ogbn_products",
           "TemporalSignalData", "metrla_from_files", "load_metrla",
           "TemporalBrainsData", "temporalbrains_from_files",
           "load_temporalbrains"]


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


def tudataset_from_files(directory: str, name: str
                         ) -> tuple[list, np.ndarray]:
    """Parse the raw TUDataset format (``{name}_A.txt`` etc.) from disk.

    Reference consumer: TUDataset usage in
    examples/graph_classification_tudataset.jl:30-39 (via MLDatasets). Files
    (https://chrsmrrs.github.io/datasets format):

    - ``{name}_A.txt``: edge list ``i, j`` (1-based global node ids)
    - ``{name}_graph_indicator.txt``: graph id per node (1-based)
    - ``{name}_graph_labels.txt``: label per graph
    - optional ``{name}_node_labels.txt`` (one-hot encoded into ``x``),
      ``{name}_node_attributes.txt`` (concatenated into ``x``),
      ``{name}_edge_labels.txt`` / ``{name}_edge_attributes.txt`` (-> edata).

    Returns ``(graphs, labels)`` like :func:`synthetic_tudataset`.
    """
    import os

    def _p(suffix):
        return os.path.join(directory, f"{name}_{suffix}.txt")

    def _opt(suffix):
        p = _p(suffix)
        return np.loadtxt(p, delimiter=",", ndmin=2) \
            if os.path.exists(p) else None

    A = np.loadtxt(_p("A"), delimiter=",", dtype=np.int64, ndmin=2)
    gi = np.loadtxt(_p("graph_indicator"), dtype=np.int64) - 1
    glabels = np.loadtxt(_p("graph_labels"))
    # labels may be arbitrary ints (e.g. -1/1): densify to 0..C-1
    uniq = np.unique(glabels)
    y = np.searchsorted(uniq, glabels).astype(np.int32)

    nlab = _opt("node_labels")
    nattr = _opt("node_attributes")
    elab = _opt("edge_labels")
    eattr = _opt("edge_attributes")

    parts = []
    if nlab is not None:
        lab = nlab[:, 0].astype(np.int64)
        lab -= lab.min()
        parts.append(np.eye(int(lab.max()) + 1, dtype=np.float32)[lab])
    if nattr is not None:
        parts.append(nattr.astype(np.float32))
    x = np.concatenate(parts, axis=1) if parts else None

    eparts = []
    if elab is not None:
        lab = elab[:, 0].astype(np.int64)
        lab -= lab.min()
        eparts.append(np.eye(int(lab.max()) + 1, dtype=np.float32)[lab])
    if eattr is not None:
        eparts.append(eattr.astype(np.float32))
    efeat = np.concatenate(eparts, axis=1) if eparts else None

    s_all = A[:, 0] - 1
    r_all = A[:, 1] - 1
    num_graphs = int(gi.max()) + 1
    node_off = np.zeros(num_graphs + 1, np.int64)
    np.add.at(node_off, gi + 1, 1)
    node_off = np.cumsum(node_off)
    e_graph = gi[s_all]

    graphs = []
    for k in range(num_graphs):
        nsel = slice(node_off[k], node_off[k + 1])
        esel = e_graph == k
        nk = node_off[k + 1] - node_off[k]
        nodes = {"x": x[nsel]} if x is not None else None
        edges = {"e": efeat[esel]} if efeat is not None else None
        graphs.append(graph(s_all[esel] - node_off[k],
                            r_all[esel] - node_off[k],
                            num_nodes=int(nk), nodes=nodes, edges=edges,
                            globals_={"y": np.asarray([y[k]], np.int32)}))
    return graphs, y


def planetoid_from_raw(directory: str, name: str = "cora"
                       ) -> NodeClassificationData:
    """Load the REAL Planetoid raw pickles (``ind.cora.x`` ... ``ind.cora.
    test.index``) — the exact dataset behind the reference's Cora bar
    (test/examples/node_classification_cora.jl:100-101; loaded there via
    MLDatasets.Cora from the same files).

    Assembly follows the canonical Planetoid recipe: features =
    [allx; tx] with the test block re-ordered by ``test.index``; labels
    likewise; edges from the adjacency dict (both directions); splits =
    Planetoid standard (train = first len(y) nodes, val = next 500,
    test = test.index).
    """
    import os
    import pickle

    def _load(suffix):
        with open(os.path.join(directory, f"ind.{name}.{suffix}"),
                  "rb") as f:
            return pickle.load(f, encoding="latin1")

    x, tx, allx = _load("x"), _load("tx"), _load("allx")
    y, ty, ally = _load("y"), _load("ty"), _load("ally")
    graph_dict = _load("graph")
    test_idx = np.loadtxt(
        os.path.join(directory, f"ind.{name}.test.index"),
        dtype=np.int64)

    def _dense(a):
        return np.asarray(a.todense() if hasattr(a, "todense") else a,
                          np.float32)

    allx, tx = _dense(allx), _dense(tx)
    ty = np.asarray(ty, np.float32)
    test_sorted = np.sort(test_idx)
    if name == "citeseer":
        # citeseer has gaps in the test index range: re-seat into the full
        # contiguous range with zero rows for the isolated nodes
        full = np.arange(test_sorted.min(), test_sorted.max() + 1)
        tx_full = np.zeros((len(full), tx.shape[1]), np.float32)
        tx_full[test_sorted - test_sorted.min()] = tx
        ty_full = np.zeros((len(full), ty.shape[1]), np.float32)
        ty_full[test_sorted - test_sorted.min()] = ty
        tx, ty = tx_full, ty_full

    # canonical Planetoid assembly: the tx block sits at rows len(allx)..N in
    # FILE order; re-seat those rows at their true node ids (test_idx holds
    # the file order, its sort the on-graph order)
    feats = np.vstack([allx, tx])
    labels_oh = np.vstack([np.asarray(ally, np.float32), ty])
    feats[test_idx] = feats[test_sorted]
    labels_oh[test_idx] = labels_oh[test_sorted]

    labels = labels_oh.argmax(1).astype(np.int32)
    num_nodes = feats.shape[0]

    s_list, r_list = [], []
    for u, nbrs in graph_dict.items():
        for v in nbrs:
            if u < num_nodes and v < num_nodes:
                s_list.append(u)
                r_list.append(v)
    s = np.asarray(s_list, np.int64)
    r = np.asarray(r_list, np.int64)
    # symmetrize + dedup + drop self loops (Planetoid adjacency lists both
    # directions inconsistently)
    key = np.unique(np.concatenate([s * num_nodes + r, r * num_nodes + s]))
    s2, r2 = key // num_nodes, key % num_nodes
    keep = s2 != r2
    s2, r2 = s2[keep], r2[keep]

    # row-normalize features (Planetoid preprocessing)
    feats /= np.maximum(feats.sum(1, keepdims=True), 1)

    train_mask = np.zeros(num_nodes, bool)
    val_mask = np.zeros(num_nodes, bool)
    test_mask = np.zeros(num_nodes, bool)
    ntrain = np.asarray(y).shape[0]
    train_mask[:ntrain] = True
    val_mask[ntrain:ntrain + 500] = True
    test_mask[test_idx] = True

    g = graph(s2, r2, num_nodes=num_nodes,
              nodes={"x": feats, "y": labels})
    pad = g.n_pad - num_nodes

    def padm(mk):
        return np.pad(mk, (0, pad))

    return NodeClassificationData(g, int(labels.max()) + 1,
                                  padm(train_mask), padm(val_mask),
                                  padm(test_mask))


def load_cora(*, seed: int = 0) -> tuple[NodeClassificationData, bool]:
    """The real Cora when its files are on disk, else the synthetic analog.

    Search order: ``$GNN_CORA_DIR``, ``./data/cora``, ``~/.datasets/cora``
    (raw Planetoid pickles ``ind.cora.*``), then any ``cora.npz``
    (:func:`planetoid_from_files`). Returns ``(data, is_real)``.
    """
    import os

    candidates = [os.environ.get("GNN_CORA_DIR"), "data/cora",
                  os.path.expanduser("~/.datasets/cora")]
    for c in candidates:
        if c and os.path.exists(os.path.join(c, "ind.cora.graph")):
            return planetoid_from_raw(c, "cora"), True
        if c and os.path.exists(os.path.join(c, "cora.npz")):
            return planetoid_from_files(os.path.join(c, "cora.npz")), True
    return synthetic_cora(seed=seed), False


@dataclasses.dataclass
class LargeGraphData:
    """A sampling-scale graph kept as raw host arrays (NOT a padded
    GraphTuple — at ogbn scale the COO alone is ~1GB; the minibatch pipeline
    ships only per-batch index arrays, see sampling.NeighborLoader)."""

    senders: np.ndarray      # int32[E]
    receivers: np.ndarray    # int32[E]
    num_nodes: int
    x: np.ndarray | None     # float32[N, D] node features
    y: np.ndarray | None     # int32[N] labels
    splits: dict             # name -> int64 node-index array


def _open_maybe_gz(path):
    import gzip
    return gzip.open(path, "rt") if path.endswith(".gz") else open(path)


def _find(directory, *names):
    import os
    for n in names:
        for cand in (n, n + ".gz"):
            p = os.path.join(directory, cand)
            if os.path.exists(p):
                return p
    return None


def ogbn_from_files(directory: str) -> LargeGraphData:
    """Load an OGB node-property dataset (ogbn-products layout) from disk.

    Reference consumer: the BASELINE.md north-star metric (GraphSAGE epoch
    time on ogbn-products); the reference itself reaches OGB via MLDatasets
    (GNNGraphs/src/mldatasets.jl:25-41). No network egress here — the user
    drops the standard OGB directory (or a preprocessed ``ogbn.npz``) on
    disk. Accepted layouts, in preference order:

    1. ``{dir}/ogbn.npz`` with arrays ``edge_index`` [2, E], ``node_feat``
       [N, D], ``node_label`` [N], ``train_idx``/``valid_idx``/``test_idx``.
    2. The standard OGB download tree: ``raw/edge.csv[.gz]`` ("src,dst"
       lines), ``raw/node-feat.csv[.gz]``, ``raw/node-label.csv[.gz]``, and
       ``split/*/{train,valid,test}.csv[.gz]``.
    """
    import glob
    import os

    npz = os.path.join(directory, "ogbn.npz")
    if os.path.exists(npz):
        z = np.load(npz)
        ei = np.asarray(z["edge_index"], np.int32)
        splits = {k: np.asarray(z[f"{k}_idx"], np.int64)
                  for k in ("train", "valid", "test") if f"{k}_idx" in z}
        x = np.asarray(z["node_feat"], np.float32) \
            if "node_feat" in z else None
        y = np.asarray(z["node_label"], np.int32).reshape(-1) \
            if "node_label" in z else None
        n = int(z["num_nodes"]) if "num_nodes" in z else (
            x.shape[0] if x is not None else int(ei.max()) + 1)
        return LargeGraphData(ei[0], ei[1], n, x, y, splits)

    raw = os.path.join(directory, "raw")
    edge_p = _find(raw, "edge.csv") or _find(directory, "edge.csv")
    if edge_p is None:
        raise FileNotFoundError(
            f"no ogbn.npz and no raw/edge.csv under {directory}")
    base = os.path.dirname(edge_p)
    with _open_maybe_gz(edge_p) as f:
        ei = np.loadtxt(f, delimiter=",", dtype=np.int64, ndmin=2)
    s, r = ei[:, 0].astype(np.int32), ei[:, 1].astype(np.int32)

    x = y = None
    p = _find(base, "node-feat.csv")
    if p:
        with _open_maybe_gz(p) as f:
            x = np.loadtxt(f, delimiter=",", dtype=np.float32, ndmin=2)
    p = _find(base, "node-label.csv")
    if p:
        with _open_maybe_gz(p) as f:
            y = np.loadtxt(f, delimiter=",", dtype=np.int64).reshape(-1) \
                .astype(np.int32)
    n = (x.shape[0] if x is not None
         else (y.shape[0] if y is not None
               else int(max(s.max(), r.max())) + 1))

    splits = {}
    for sp in glob.glob(os.path.join(directory, "split", "*")):
        for name in ("train", "valid", "test"):
            p = _find(sp, f"{name}.csv")
            if p:
                with _open_maybe_gz(p) as f:
                    splits[name] = np.loadtxt(f, dtype=np.int64).reshape(-1)
        if splits:
            break
    return LargeGraphData(s, r, n, x, y, splits)


def load_ogbn_products() -> tuple[LargeGraphData | None, bool]:
    """The real ogbn-products when its files are on disk, else ``None``.

    Search order: ``$GNN_OGBN_PRODUCTS_DIR``, ``./data/ogbn-products``,
    ``~/.datasets/ogbn-products``. Returns ``(data_or_None, is_real)`` —
    callers (bench.py's north-star phase) substitute a synthetic
    degree-skewed analog and record ``real_data: false`` when absent.
    """
    import os

    for c in (os.environ.get("GNN_OGBN_PRODUCTS_DIR"), "data/ogbn-products",
              os.path.expanduser("~/.datasets/ogbn-products")):
        if not c or not os.path.isdir(c):
            continue
        try:
            return ogbn_from_files(c), True
        except FileNotFoundError:
            continue
    return None, False


@dataclasses.dataclass
class TemporalSignalData:
    """A traffic-forecasting style dataset: one static sensor graph plus a
    [T, N, C] signal tensor (reference consumer:
    examples/traffic_prediction_metrla.jl)."""

    senders: np.ndarray
    receivers: np.ndarray
    edge_weight: np.ndarray | None
    num_nodes: int
    signal: np.ndarray        # float32[T, N, C]
    timestamps: np.ndarray | None = None


def metrla_from_files(directory: str) -> TemporalSignalData:
    """Load METR-LA (or any same-layout traffic dataset) from disk.

    Reference consumer: examples/traffic_prediction_metrla.jl (loaded there
    via MLDatasets.METRLA). Accepted layouts, in preference order:

    1. ``{dir}/metrla.npz`` with ``signal`` [T, N] or [T, N, C], ``adj``
       [N, N] (dense weighted adjacency), optional ``timestamps``.
    2. The standard distribution: ``metr-la.h5`` (pandas fixed-format HDF5,
       read directly via h5py: ``df/block0_values`` [T, N] +
       ``df/axis1`` timestamps) and ``adj_mx.pkl`` (3-tuple pickle whose
       last element is the [N, N] adjacency).
    """
    import os
    import pickle

    npz = os.path.join(directory, "metrla.npz")
    if os.path.exists(npz):
        z = np.load(npz)
        sig = np.asarray(z["signal"], np.float32)
        adj = np.asarray(z["adj"], np.float32)
        ts = np.asarray(z["timestamps"]) if "timestamps" in z else None
    else:
        h5 = _find(directory, "metr-la.h5", "metr_la.h5", "pems-bay.h5")
        pkl = _find(directory, "adj_mx.pkl", "adj_mx_bay.pkl")
        if h5 is None or pkl is None:
            raise FileNotFoundError(
                f"no metrla.npz and no (metr-la.h5, adj_mx.pkl) under "
                f"{directory}")
        import h5py
        with h5py.File(h5, "r") as f:
            key = next(iter(f.keys()))          # pandas stores under 'df'
            grp = f[key]
            if hasattr(grp, "keys") and "block0_values" in grp:
                sig = np.asarray(grp["block0_values"], np.float32)
                ts = (np.asarray(grp["axis1"])
                      if "axis1" in grp else None)
            else:                                # plain dataset layout
                sig = np.asarray(grp, np.float32)
                ts = None
        with open(pkl, "rb") as f:
            obj = pickle.load(f, encoding="latin1")
        adj = np.asarray(obj[-1] if isinstance(obj, (tuple, list)) else obj,
                         np.float32)
    if sig.ndim == 2:
        sig = sig[:, :, None]
    n = adj.shape[0]
    if sig.shape[1] != n:
        raise ValueError(f"signal has {sig.shape[1]} sensors, adjacency "
                         f"has {n}")
    s, r = np.nonzero(adj)
    return TemporalSignalData(s.astype(np.int32), r.astype(np.int32),
                              adj[s, r].astype(np.float32), n, sig, ts)


def load_metrla() -> tuple[TemporalSignalData | None, bool]:
    """The real METR-LA when its files are on disk, else ``None``.

    Search order: ``$GNN_METRLA_DIR``, ``./data/metr-la``,
    ``~/.datasets/metr-la``. Returns ``(data_or_None, is_real)``.
    """
    import os

    for c in (os.environ.get("GNN_METRLA_DIR"), "data/metr-la",
              os.path.expanduser("~/.datasets/metr-la")):
        if not c or not os.path.isdir(c):
            continue
        try:
            return metrla_from_files(c), True
        except FileNotFoundError:
            continue
    return None, False


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


@dataclasses.dataclass
class TemporalBrainsData:
    """The TemporalBrains corpus (fMRI temporal brain graphs; reference
    consumer: examples/graph_classification_temporalbrains.jl via
    MLDatasets.TemporalBrains): S subjects x T snapshots over the same N
    brain regions, per-snapshot node activity, and a binary gender label.

    Stored as raw host arrays; :meth:`subject` materializes one subject as
    a padded :class:`~graphneuralnetworks_tpu.temporal.TemporalGraph` with
    the reference's feature construction ``x_t = [I(N) | activity_t]``
    (temporalbrains.jl:28-30, 103 features for N=102)."""

    activity: np.ndarray        # float32 [S, T, N]
    labels: np.ndarray          # int32 [S] (0 = F, 1 = M)
    edge_ptr: np.ndarray        # int64 [S*T + 1] into senders/receivers
    senders: np.ndarray         # int32 [total_edges]
    receivers: np.ndarray       # int32 [total_edges]

    @property
    def num_subjects(self) -> int:
        return self.activity.shape[0]

    @property
    def num_snapshots(self) -> int:
        return self.activity.shape[1]

    def subject(self, i: int, *, e_pad: int | None = None,
                identity_features: bool = True):
        """Subject ``i`` as a TemporalGraph (uniform snapshots for scan)."""
        from ..temporal import TemporalGraph

        s0, t_dim, n = self.activity.shape
        if e_pad is None:
            counts = np.diff(self.edge_ptr)
            e_pad = int(counts.max())
        eye = np.eye(n, dtype=np.float32)
        snaps = []
        for t in range(t_dim):
            lo, hi = self.edge_ptr[i * t_dim + t], self.edge_ptr[i * t_dim
                                                                + t + 1]
            sig = self.activity[i, t].astype(np.float32)[:, None]
            x = (np.concatenate([eye, sig], axis=1)
                 if identity_features else sig)
            snaps.append(graph(self.senders[lo:hi], self.receivers[lo:hi],
                               num_nodes=n, nodes={"x": x}, e_pad=e_pad))
        return TemporalGraph.from_snapshots(
            snaps, uniform=True,
            tgdata={"y": np.int32(self.labels[i])})


def temporalbrains_from_files(directory: str) -> TemporalBrainsData:
    """Load a TemporalBrains-format dump from disk.

    Accepted layouts, in preference order:

    1. ``{dir}/temporalbrains.npz`` with ``activity`` [S, T, N],
       ``labels`` [S] (ints, or 'F'/'M' strings), ``edge_ptr`` [S*T+1],
       ``senders``/``receivers`` [total].
    2. Split files: ``activity.npy``, ``labels.npy`` + ``edges.npz``
       (holding ``edge_ptr``/``senders``/``receivers``).
    """
    import os

    npz = os.path.join(directory, "temporalbrains.npz")
    if os.path.exists(npz):
        z = np.load(npz, allow_pickle=False)
        act, lab = z["activity"], z["labels"]
        ptr, s, r = z["edge_ptr"], z["senders"], z["receivers"]
    else:
        a_p = os.path.join(directory, "activity.npy")
        l_p = os.path.join(directory, "labels.npy")
        e_p = os.path.join(directory, "edges.npz")
        if not (os.path.exists(a_p) and os.path.exists(l_p)
                and os.path.exists(e_p)):
            raise FileNotFoundError(
                f"no temporalbrains.npz and no (activity.npy, labels.npy, "
                f"edges.npz) under {directory}")
        act, lab = np.load(a_p), np.load(l_p)
        z = np.load(e_p)
        ptr, s, r = z["edge_ptr"], z["senders"], z["receivers"]
    if lab.dtype.kind in "US":        # 'F'/'M' strings -> 0/1
        lab = (np.char.upper(lab.astype(str)) == "M").astype(np.int32)
    st = act.shape[0] * act.shape[1]
    if ptr.shape[0] != st + 1:
        raise ValueError(f"edge_ptr has {ptr.shape[0]} entries, expected "
                         f"S*T+1 = {st + 1}")
    return TemporalBrainsData(
        activity=np.asarray(act, np.float32),
        labels=np.asarray(lab, np.int32).reshape(-1),
        edge_ptr=np.asarray(ptr, np.int64),
        senders=np.asarray(s, np.int32),
        receivers=np.asarray(r, np.int32))


def load_temporalbrains() -> tuple[TemporalBrainsData | None, bool]:
    """The real TemporalBrains when its files are on disk, else ``None``.

    Search order: ``$GNN_TEMPORALBRAINS_DIR``, ``./data/temporalbrains``,
    ``~/.datasets/temporalbrains``. Returns ``(data_or_None, is_real)``.
    """
    import os

    for c in (os.environ.get("GNN_TEMPORALBRAINS_DIR"),
              "data/temporalbrains",
              os.path.expanduser("~/.datasets/temporalbrains")):
        if not c or not os.path.isdir(c):
            continue
        try:
            return temporalbrains_from_files(c), True
        except FileNotFoundError:
            continue
    return None, False
