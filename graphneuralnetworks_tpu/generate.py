"""Random/structured graph generators (host-side numpy).

Reference parity: GNNGraphs/src/generate.jl — ``rand_graph`` (Erdős–Rényi via
unique edge-id sampling, bidirected by default, generate.jl:41-65),
``knn_graph`` (112-145), ``radius_graph`` (196-222),
``rand_temporal_radius_graph`` (265-284), ``rand_temporal_hyperbolic_graph``
(340-380). These are data-prep utilities and stay on host, feeding padded
GraphTuples to the device.
"""

from __future__ import annotations

import numpy as np

from .graph import GraphTuple, graph
from .utils import edge_decoding

__all__ = [
    "rand_graph",
    "knn_graph",
    "radius_graph",
    "rand_temporal_radius_graph",
    "rand_temporal_hyperbolic_graph",
]


def rand_graph(num_nodes: int, num_edges: int, *, bidirected: bool = True,
               seed: int | None = None, nodes=None, edges=None,
               edge_weight=None, n_pad=None, e_pad=None,
               rng: np.random.Generator | None = None,
               **graph_kw) -> GraphTuple:
    """Erdős–Rényi G(n, m) via sampling unique edge ids (generate.jl:41-65).

    ``bidirected=True`` (the reference default) samples ``num_edges / 2``
    undirected pairs and materializes both directions adjacently.
    """
    rng = rng or np.random.default_rng(seed)
    n = int(num_nodes)
    if bidirected:
        if num_edges % 2:
            raise ValueError("bidirected rand_graph needs even num_edges")
        m = num_edges // 2
        maxid = n * (n - 1) // 2
    else:
        m = num_edges
        maxid = n * (n - 1)
    if m > maxid:
        raise ValueError("too many edges requested")
    ids = rng.choice(maxid, size=m, replace=False)
    s, r = edge_decoding(ids, n, directed=not bidirected,
                         self_loops=False)
    if bidirected:
        s, r = np.concatenate([s, r]), np.concatenate([r, s])
        # features given once per undirected pair are duplicated for both
        # directions (normalize_graphdata's duplicate_if_needed semantics,
        # GNNGraphs/src/utils.jl:152-161)
        from .utils import normalize_graphdata
        edges = normalize_graphdata(edges, default_name="e", n=len(s),
                                    duplicate_if_needed=True) or None
        if edge_weight is not None and len(np.asarray(edge_weight)) == m:
            edge_weight = np.concatenate([edge_weight, edge_weight])
    return graph(s, r, num_nodes=n, nodes=nodes, edges=edges,
                 edge_weight=edge_weight, n_pad=n_pad, e_pad=e_pad,
                 **graph_kw)


def _pairwise_sq_dists(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    # points are column-major in the reference (dims, n); we take (n, dims)
    aa = (a * a).sum(-1)[:, None]
    bb = (b * b).sum(-1)[None, :]
    return np.maximum(aa + bb - 2.0 * (a @ b.T), 0.0)


def knn_graph(points, k: int, *, graph_indicator=None, self_loops: bool = False,
              dir: str = "in", nodes=None, **kw) -> GraphTuple:
    """k-nearest-neighbor graph (generate.jl:112-145).

    ``points``: [N, D]. Each node connects to its k nearest neighbors; with a
    ``graph_indicator`` neighbors are restricted per graph (the reference's
    per-graph offset trick). ``dir="in"`` means edges point neighbor->node.
    """
    pts = np.asarray(points, dtype=np.float64)
    n = pts.shape[0]
    gi = (np.zeros(n, np.int64) if graph_indicator is None
          else np.asarray(graph_indicator, np.int64))
    D = _pairwise_sq_dists(pts, pts)
    D[gi[:, None] != gi[None, :]] = np.inf
    if not self_loops:
        np.fill_diagonal(D, np.inf)
    nbr = np.argsort(D, axis=1)[:, :k]  # [n, k] neighbors of each node
    tgt = np.repeat(np.arange(n), k)
    src = nbr.reshape(-1)
    valid = ~np.isinf(D[tgt, src])
    src, tgt = src[valid], tgt[valid]
    s, r = (src, tgt) if dir == "in" else (tgt, src)
    ng = int(gi.max()) + 1
    return graph(s, r, num_nodes=n, nodes=nodes,
                 node_graph_id=gi.astype(np.int32), num_graphs=ng, **kw)


def radius_graph(points, radius: float, *, graph_indicator=None,
                 self_loops: bool = False, dir: str = "in", nodes=None,
                 **kw) -> GraphTuple:
    """Connect all pairs within ``radius`` (generate.jl:196-222)."""
    pts = np.asarray(points, dtype=np.float64)
    n = pts.shape[0]
    gi = (np.zeros(n, np.int64) if graph_indicator is None
          else np.asarray(graph_indicator, np.int64))
    D = _pairwise_sq_dists(pts, pts)
    mask = D <= radius * radius
    mask &= gi[:, None] == gi[None, :]
    if not self_loops:
        np.fill_diagonal(mask, False)
    src, tgt = np.nonzero(mask)
    s, r = (src, tgt) if dir == "in" else (tgt, src)
    ng = int(gi.max()) + 1
    return graph(s, r, num_nodes=n, nodes=nodes,
                 node_graph_id=gi.astype(np.int32), num_graphs=ng, **kw)


def rand_temporal_radius_graph(number_nodes: int, number_snapshots: int,
                               speed: float, radius: float, *,
                               self_loops: bool = False,
                               rng: np.random.Generator | None = None):
    """Random-walking points, radius graph per snapshot (generate.jl:265-284).
    Returns a TemporalGraph (see temporal.py)."""
    from .temporal import TemporalGraph
    rng = rng or np.random.default_rng()
    pos = rng.random((number_nodes, 2))
    snaps = []
    for _ in range(number_snapshots):
        snaps.append(radius_graph(pos, radius, self_loops=self_loops))
        pos = np.clip(pos + speed * rng.standard_normal(pos.shape), 0, 1)
    return TemporalGraph.from_snapshots(snaps)


def rand_temporal_hyperbolic_graph(number_nodes: int, number_snapshots: int, *,
                                   alpha: float, R: float, speed: float,
                                   zeta: float = 1.0,
                                   self_loops: bool = False,
                                   rng: np.random.Generator | None = None):
    """Hyperbolic-plane moving points, connect within hyperbolic distance R
    (generate.jl:340-380)."""
    from .temporal import TemporalGraph
    rng = rng or np.random.default_rng()
    # radial density ~ alpha*sinh(alpha r)/(cosh(alpha R)-1) sampled by inverse cdf
    u = rng.random(number_nodes)
    rr = np.arccosh(1 + u * (np.cosh(alpha * R) - 1)) / alpha
    theta = rng.random(number_nodes) * 2 * np.pi
    snaps = []
    for _ in range(number_snapshots):
        dt = np.abs(theta[:, None] - theta[None, :])
        dt = np.pi - np.abs(np.pi - dt)
        ch = (np.cosh(zeta * rr)[:, None] * np.cosh(zeta * rr)[None, :]
              - np.sinh(zeta * rr)[:, None] * np.sinh(zeta * rr)[None, :]
              * np.cos(dt))
        d = np.arccosh(np.maximum(ch, 1.0)) / zeta
        mask = d <= R
        if not self_loops:
            np.fill_diagonal(mask, False)
        s, t = np.nonzero(mask)
        snaps.append(graph(s, t, num_nodes=number_nodes))
        theta = (theta + speed * rng.standard_normal(number_nodes)) % (2 * np.pi)
        rr = np.clip(rr + speed * rng.standard_normal(number_nodes), 0, R)
    return TemporalGraph.from_snapshots(snaps)
