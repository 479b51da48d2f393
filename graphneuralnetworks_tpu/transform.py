"""Graph transforms: self-loops, edge/node surgery, batching, sampling splits.

Reference parity: GNNGraphs/src/transform.jl (1052 LoC) — ``add_self_loops``,
``remove_self_loops``, ``add_edges``, ``remove_edges``, ``remove_multi_edges``,
``remove_nodes``, ``add_nodes``, ``set_edge_weight``, ``to_bidirected``,
``to_unidirected``, ``blockdiag``, ``batch``/``unbatch``/``getgraph``,
``negative_sample``, ``rand_edge_split``, ``perturb_edges``,
``random_walk_pe``, ``ppr_diffusion``.

TPU-first design: transforms that change the edge/node *count* are host-side
(numpy) graph surgery producing a fresh padded ``GraphTuple`` — under jit the
graph structure is frozen, exactly like the reference keeps `GNNGraph`
immutable. The layers never call these inside the compiled step; e.g. GCN's
self-loop handling is folded into the layer math (models/conv.py) instead of
materializing edges per step. ``batch`` pads to shared static capacities so a
whole epoch of batches hits one compiled executable (the single biggest
semantic change vs the reference's dynamic collation, SURVEY §3.4).

The reference keeps ``negative_sample`` on host even on GPU
(transform.jl:890-929) — same here, and it stays out of jit.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .graph import GraphTuple, graph

__all__ = [
    "add_self_loops",
    "remove_self_loops",
    "remove_edges",
    "remove_multi_edges",
    "remove_nodes",
    "add_edges",
    "add_nodes",
    "perturb_edges",
    "set_edge_weight",
    "to_bidirected",
    "to_unidirected",
    "blockdiag",
    "batch",
    "unbatch",
    "getgraph",
    "negative_sample",
    "rand_edge_split",
    "random_walk_pe",
    "ppr_diffusion",
    "sort_edge_index",
]


# ---------------------------------------------------------------------------
# host-side unpacking
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class _Host:
    s: np.ndarray
    r: np.ndarray
    w: np.ndarray | None
    nn: int
    ne: int
    ng: int
    nodes: dict
    edges: dict
    globals_: dict
    gid: np.ndarray


def _unpack(g: GraphTuple) -> _Host:
    if g.edge_valid is not None:
        # device-sampled graphs (device_sampler.DeviceSampler) scatter their
        # invalid edges inside the real-edge prefix; prefix-based host
        # surgery would silently treat them as real
        raise ValueError(
            "host transforms do not support graphs with edge_valid "
            "(device-sampled batches); transform the source graph instead")
    nn, ne, ng = int(g.num_nodes), int(g.num_edges), int(g.num_graphs)
    return _Host(
        s=np.asarray(g.senders)[:ne].copy(),
        r=np.asarray(g.receivers)[:ne].copy(),
        w=None if g.edge_weight is None else np.asarray(g.edge_weight)[:ne].copy(),
        nn=nn, ne=ne, ng=ng,
        nodes={k: np.asarray(v)[:nn] for k, v in g.nodes.items()},
        edges={k: np.asarray(v)[:ne] for k, v in g.edges.items()},
        globals_={k: np.asarray(v)[:ng] for k, v in g.globals_.items()},
        gid=np.asarray(g.node_graph_id)[:nn].copy(),
    )


def _repack(h: _Host, *, n_pad=None, e_pad=None, sort=True) -> GraphTuple:
    return graph(h.s, h.r, num_nodes=h.nn, nodes=h.nodes or None,
                 edges=h.edges or None, globals_=h.globals_ or None,
                 edge_weight=h.w, n_pad=n_pad, e_pad=e_pad, sort=sort,
                 node_graph_id=h.gid, num_graphs=h.ng)


def _select_edges(h: _Host, keep: np.ndarray) -> _Host:
    h.s, h.r = h.s[keep], h.r[keep]
    if h.w is not None:
        h.w = h.w[keep]
    h.edges = {k: v[keep] for k, v in h.edges.items()}
    h.ne = int(h.s.shape[0])
    return h


# ---------------------------------------------------------------------------
# edge surgery (transform.jl)
# ---------------------------------------------------------------------------

def add_self_loops(g: GraphTuple, *, fill_weight: float = 1.0) -> GraphTuple:
    """Add i->i for every real node (transform.jl:12-39).

    Follows the reference: existing self-loops are kept (so nodes that already
    have one get two); if the graph has edge weights the new loops get
    ``fill_weight``; edge *features* must be absent (the reference drops to an
    error there — we raise).
    """
    h = _unpack(g)
    if h.edges:
        raise ValueError("add_self_loops on a graph with edge features "
                         "(reference semantics: unsupported)")
    loops = np.arange(h.nn, dtype=np.int32)
    h.s = np.concatenate([h.s, loops])
    h.r = np.concatenate([h.r, loops])
    if h.w is not None:
        h.w = np.concatenate([h.w, np.full(h.nn, fill_weight, h.w.dtype)])
    h.ne += h.nn
    return _repack(h)


def remove_self_loops(g: GraphTuple) -> GraphTuple:
    """transform.jl:49-78."""
    h = _unpack(g)
    return _repack(_select_edges(h, h.s != h.r))


def remove_edges(g: GraphTuple, edges_to_remove=None, *, p: float | None = None,
                 rng: np.random.Generator | None = None) -> GraphTuple:
    """Remove edges by index list or independently with prob ``p``
    (transform.jl:121-146)."""
    h = _unpack(g)
    if p is not None:
        rng = rng or np.random.default_rng()
        keep = rng.random(h.ne) >= p
    else:
        keep = np.ones(h.ne, dtype=bool)
        keep[np.asarray(edges_to_remove, dtype=np.int64)] = False
    return _repack(_select_edges(h, keep))


def remove_multi_edges(g: GraphTuple, *, aggr: str = "sum") -> GraphTuple:
    """Deduplicate parallel edges, aggregating weights/features
    (transform.jl:157-185). ``aggr`` in {sum, mean, max, min, first}."""
    h = _unpack(g)
    key = h.s.astype(np.int64) * h.nn + h.r
    uniq, first_idx, inv = np.unique(key, return_index=True,
                                     return_inverse=True)

    def _agg(v):
        if aggr == "first":
            return v[first_idx]
        if aggr in ("max", "min"):
            # Seed with the first occurrence per unique edge instead of
            # +-inf fill: keeps integer/bool dtypes exact (inf -> int cast
            # is undefined) and never leaves a fill value behind.
            out = v[first_idx].copy()
            (np.maximum if aggr == "max" else np.minimum).at(out, inv, v)
            return out
        if aggr not in ("sum", "mean"):
            raise ValueError(f"unknown aggr {aggr!r}")
        is_int = v.dtype == np.bool_ or np.issubdtype(v.dtype, np.integer)
        acc = np.zeros((len(uniq),) + v.shape[1:],
                       dtype=np.int64 if is_int else np.float64)
        np.add.at(acc, inv, v)
        if aggr == "mean":
            cnt = np.bincount(inv, minlength=len(uniq))
            accf = acc / cnt.reshape((-1,) + (1,) * (v.ndim - 1))
            # integer features: round-to-nearest, keep the dtype
            return (np.rint(accf) if is_int else accf).astype(v.dtype)
        return acc.astype(v.dtype)

    h.edges = {k: _agg(v) for k, v in h.edges.items()}
    if h.w is not None:
        h.w = _agg(h.w)
    h.s, h.r = h.s[first_idx], h.r[first_idx]
    h.ne = len(uniq)
    return _repack(h)


def remove_nodes(g: GraphTuple, nodes_to_remove) -> GraphTuple:
    """Drop nodes, their incident edges, and reindex (transform.jl:212-276)."""
    h = _unpack(g)
    drop = np.zeros(h.nn, dtype=bool)
    drop[np.asarray(nodes_to_remove, dtype=np.int64)] = True
    keep_nodes = ~drop
    remap = np.cumsum(keep_nodes) - 1  # old id -> new id
    keep_e = keep_nodes[h.s] & keep_nodes[h.r]
    _select_edges(h, keep_e)
    h.s = remap[h.s].astype(np.int32)
    h.r = remap[h.r].astype(np.int32)
    h.nodes = {k: v[keep_nodes] for k, v in h.nodes.items()}
    h.gid = h.gid[keep_nodes]
    h.nn = int(keep_nodes.sum())
    return _repack(h)


def add_edges(g: GraphTuple, senders, receivers, *, edges=None,
              edge_weight=None) -> GraphTuple:
    """Append edges (+features/weights) (transform.jl:319-353).

    Weight padding rule matches the reference: if exactly one side has
    weights, the other side is padded with ones (utils.jl:48-122
    ``cat_features``)."""
    h = _unpack(g)
    s2 = np.asarray(senders, dtype=np.int32).reshape(-1)
    r2 = np.asarray(receivers, dtype=np.int32).reshape(-1)
    ne2 = len(s2)
    h.nn = max(h.nn, int(max(s2.max(initial=-1), r2.max(initial=-1))) + 1)
    if len(h.gid) < h.nn:
        h.gid = np.pad(h.gid, (0, h.nn - len(h.gid)),
                       constant_values=h.ng - 1)
    h.s = np.concatenate([h.s, s2])
    h.r = np.concatenate([h.r, r2])
    w2 = (np.asarray(edge_weight).reshape(-1)
          if edge_weight is not None else None)
    if h.w is not None or w2 is not None:
        a = h.w if h.w is not None else np.ones(h.ne, np.float32)
        b = w2 if w2 is not None else np.ones(ne2, np.float32)
        h.w = np.concatenate([a, b])
    if edges is not None or h.edges:
        newe = dict(edges or {})
        if not isinstance(newe, dict):
            newe = {"e": newe}
        if set(newe) != set(h.edges) and h.ne and ne2:
            raise ValueError("edge feature keys mismatch in add_edges")
        h.edges = {k: np.concatenate([h.edges[k], np.asarray(newe[k])])
                   if h.ne else np.asarray(newe[k])
                   for k in (newe or h.edges)}
    h.ne += ne2
    return _repack(h)


def add_nodes(g: GraphTuple, n: int, *, nodes=None) -> GraphTuple:
    """Append ``n`` isolated nodes (transform.jl:553-561)."""
    h = _unpack(g)
    newf = dict(nodes or {})
    if newf and not isinstance(newf, dict):
        newf = {"x": newf}
    for k in h.nodes:
        if k in newf:
            h.nodes[k] = np.concatenate([h.nodes[k], np.asarray(newf[k])])
        else:
            pad = np.zeros((n,) + h.nodes[k].shape[1:], h.nodes[k].dtype)
            h.nodes[k] = np.concatenate([h.nodes[k], pad])
    for k in newf:
        if k not in h.nodes:
            raise ValueError(f"new node feature {k!r} absent on old nodes")
    h.gid = np.concatenate(
        [h.gid, np.full(n, h.ng - 1, np.int32)])
    h.nn += n
    return _repack(h)


def perturb_edges(g: GraphTuple, perturb_ratio: float, *,
                  rng: np.random.Generator | None = None) -> GraphTuple:
    """Add ceil(ratio * E) random edges (transform.jl:385-420)."""
    rng = rng or np.random.default_rng()
    h = _unpack(g)
    n_new = int(np.ceil(perturb_ratio * h.ne))
    s2 = rng.integers(0, h.nn, n_new).astype(np.int32)
    r2 = rng.integers(0, h.nn, n_new).astype(np.int32)
    return add_edges(g, s2, r2)


def set_edge_weight(g: GraphTuple, w) -> GraphTuple:
    """transform.jl:568-577."""
    h = _unpack(g)
    w = np.asarray(w).reshape(-1)
    if w.shape[0] != h.ne:
        raise ValueError("edge weight length mismatch")
    h.w = w
    return _repack(h)


def to_bidirected(g: GraphTuple) -> GraphTuple:
    """Add reverse edges then dedup (transform.jl:495-520)."""
    h = _unpack(g)
    g2 = add_edges(g, h.r, h.s,
                   edges={k: v for k, v in h.edges.items()} or None,
                   edge_weight=h.w)
    return remove_multi_edges(g2, aggr="first")


def to_unidirected(g: GraphTuple) -> GraphTuple:
    """Canonicalize edge direction s<=r then dedup (transform.jl:522-529)."""
    h = _unpack(g)
    lo = np.minimum(h.s, h.r)
    hi = np.maximum(h.s, h.r)
    h.s, h.r = lo, hi
    return remove_multi_edges(_repack(h), aggr="first")


def sort_edge_index(g: GraphTuple) -> GraphTuple:
    """Lexicographic edge sort (utils.jl:41-45); our builder re-sorts by
    receiver for segment ops, so this canonicalizes then rebuilds."""
    h = _unpack(g)
    order = np.lexsort((h.r, h.s))
    _select_edges(h, order)
    return _repack(h)


# ---------------------------------------------------------------------------
# batching (transform.jl:579-876)
# ---------------------------------------------------------------------------

def blockdiag(*graphs: GraphTuple, n_pad=None, e_pad=None) -> GraphTuple:
    """Disjoint union of graphs = batch (transform.jl:579-628)."""
    return batch(list(graphs), n_pad=n_pad, e_pad=e_pad)


def batch(graphs: Sequence[GraphTuple], *, n_pad: int | None = None,
          e_pad: int | None = None) -> GraphTuple:
    """Batch graphs into one block-diagonal padded graph.

    Reference `MLUtils.batch(::Vector{GNNGraph})` (transform.jl:671-713):
    offsets COO by cumulative node counts, concatenates features, and builds
    the graph indicator. Here the result is padded to ``n_pad``/``e_pad`` so
    that every batch of a fixed bucket shape reuses one compiled executable.
    """
    hs = [_unpack(g) for g in graphs]
    node_off = np.cumsum([0] + [h.nn for h in hs])
    s = np.concatenate([h.s + node_off[i] for i, h in enumerate(hs)])
    r = np.concatenate([h.r + node_off[i] for i, h in enumerate(hs)])
    nn = int(node_off[-1])
    ne = int(s.shape[0])
    ng = len(hs)
    gid = np.concatenate([np.full(h.nn, i, np.int32)
                          for i, h in enumerate(hs)])

    any_w = any(h.w is not None for h in hs)
    w = (np.concatenate([h.w if h.w is not None
                         else np.ones(h.ne, np.float32) for h in hs])
         if any_w else None)

    def _cat(dicts, sizes):
        keys = set().union(*[set(d) for d in dicts]) if dicts else set()
        out = {}
        for k in keys:
            parts = []
            for d, sz in zip(dicts, sizes):
                if k in d:
                    parts.append(d[k])
                else:
                    proto = next(v for dd in dicts if k in dd
                                 for v in [dd[k]])
                    parts.append(np.zeros((sz,) + proto.shape[1:],
                                          proto.dtype))
            out[k] = np.concatenate(parts)
        return out

    nodes = _cat([h.nodes for h in hs], [h.nn for h in hs])
    edges = _cat([h.edges for h in hs], [h.ne for h in hs])
    globals_ = _cat([h.globals_ for h in hs], [h.ng for h in hs])

    return graph(s, r, num_nodes=nn, nodes=nodes or None, edges=edges or None,
                 globals_=globals_ or None, edge_weight=w, n_pad=n_pad,
                 e_pad=e_pad, node_graph_id=gid, num_graphs=ng)


def unbatch(g: GraphTuple) -> list[GraphTuple]:
    """Split a batched graph back into components (transform.jl:741-782)."""
    return [getgraph(g, i) for i in range(int(g.num_graphs))]


def getgraph(g: GraphTuple, i: int | Sequence[int], *, n_pad=None,
             e_pad=None) -> GraphTuple:
    """Extract subgraph(s) by graph id with node remapping
    (transform.jl:825-876)."""
    ids = np.atleast_1d(np.asarray(i, dtype=np.int64))
    h = _unpack(g)
    keep_nodes = np.isin(h.gid, ids)
    node_ids = np.nonzero(keep_nodes)[0]
    remap = -np.ones(h.nn, np.int64)
    remap[node_ids] = np.arange(len(node_ids))
    keep_e = keep_nodes[h.s] & keep_nodes[h.r]
    _select_edges(h, keep_e)
    h.s = remap[h.s].astype(np.int32)
    h.r = remap[h.r].astype(np.int32)
    h.nodes = {k: v[keep_nodes] for k, v in h.nodes.items()}
    old_gid = h.gid[keep_nodes]
    gid_remap = -np.ones(int(h.ng), np.int64)
    gid_remap[ids] = np.arange(len(ids))
    h.gid = gid_remap[old_gid].astype(np.int32)
    h.globals_ = {k: v[ids] for k, v in h.globals_.items()}
    h.nn = len(node_ids)
    h.ng = len(ids)
    return _repack(h, n_pad=n_pad, e_pad=e_pad)


# ---------------------------------------------------------------------------
# sampling-flavored transforms (host-side like the reference)
# ---------------------------------------------------------------------------

def negative_sample(g: GraphTuple, *, num_neg_edges: int | None = None,
                    bidirected: bool | None = None,
                    rng: np.random.Generator | None = None) -> GraphTuple:
    """Sample non-edges (transform.jl:891-929): rejection-sample candidate
    pairs against the positive-edge set until satisfied. Host-side, as in the
    reference (which round-trips GPU->CPU for this).

    Bidirected semantics follow the reference: the request is halved, that
    many *unordered* negative pairs are drawn, then mirrored ``[s;t],[t;s]``
    — so reverse pairs always stay together and there is no leakage in
    either direction. If the graph has fewer non-edges than requested, all
    of them are returned and a warning is emitted (instead of a silent
    shortfall)."""
    import warnings

    rng = rng or np.random.default_rng()
    h = _unpack(g)
    n = h.nn
    want = num_neg_edges if num_neg_edges is not None else h.ne
    if bidirected is None:
        bidirected = bool(np.asarray(_is_bidirected_np(h)))
    pos = set((h.s.astype(np.int64) * n + h.r).tolist())
    pos |= {i * n + i for i in range(n)}  # exclude self-loops

    if bidirected:
        # canonical (a<b) pairs blocked if EITHER direction is positive
        blocked = {min(k // n, k % n) * n + max(k // n, k % n) for k in pos}
        avail = n * (n - 1) // 2 - sum(1 for k in blocked
                                       if k // n != k % n)
        n_pairs = want // 2
        target = min(n_pairs, avail)
    else:
        avail = n * n - len(pos)
        target = min(want, avail)
    if target < (want // 2 if bidirected else want):
        warnings.warn(
            f"negative_sample: only {target * (2 if bidirected else 1)} "
            f"non-edges exist; requested {want}", stacklevel=2)

    out_s, out_r = [], []
    seen: set[int] = set()
    while len(out_s) < target:
        need = target - len(out_s)
        cand = rng.integers(0, n, (2, max(2 * need, 32)))
        for a, b in zip(cand[0].tolist(), cand[1].tolist()):
            if len(out_s) >= target:
                break
            if bidirected:
                if a == b:
                    continue
                lo, hi = (a, b) if a < b else (b, a)
                key = lo * n + hi
                if key in seen or key in blocked:
                    continue
                seen.add(key)
                out_s.append(lo)
                out_r.append(hi)
            else:
                key = a * n + b
                if key in seen or key in pos:
                    continue
                seen.add(key)
                out_s.append(a)
                out_r.append(b)
    s = np.asarray(out_s, np.int64)
    r = np.asarray(out_r, np.int64)
    if bidirected:  # mirror: [s;t], [t;s] (transform.jl:925-927)
        s, r = np.concatenate([s, r]), np.concatenate([r, s])
    return graph(s.astype(np.int32), r.astype(np.int32), num_nodes=n)


def _is_bidirected_np(h: _Host) -> bool:
    fwd = set(zip(h.s.tolist(), h.r.tolist()))
    return all((b, a) in fwd for a, b in fwd)


def rand_edge_split(g: GraphTuple, frac: float, *,
                    bidirected: bool | None = None,
                    rng: np.random.Generator | None = None
                    ) -> tuple[GraphTuple, GraphTuple]:
    """Split edges into two graphs, keeping reverse pairs together when
    bidirected (transform.jl:945-968)."""
    rng = rng or np.random.default_rng()
    h = _unpack(g)
    if bidirected is None:
        bidirected = _is_bidirected_np(h)
    if bidirected:
        canon = h.s <= h.r
        idx = np.nonzero(canon)[0]
        perm = rng.permutation(len(idx))
        n1 = int(round(frac * len(idx)))
        pick1 = np.zeros(h.ne, bool)
        pick1[idx[perm[:n1]]] = True
        # include reverses
        pair = {(a, b): i for i, (a, b) in
                enumerate(zip(h.s.tolist(), h.r.tolist()))}
        for i in idx[perm[:n1]]:
            j = pair.get((int(h.r[i]), int(h.s[i])))
            if j is not None:
                pick1[j] = True
        keep1 = pick1
    else:
        perm = rng.permutation(h.ne)
        n1 = int(round(frac * h.ne))
        keep1 = np.zeros(h.ne, bool)
        keep1[perm[:n1]] = True
    import copy
    h1 = _select_edges(copy.deepcopy(h), keep1)
    h2 = _select_edges(copy.deepcopy(h), ~keep1)
    return _repack(h1), _repack(h2)


# ---------------------------------------------------------------------------
# positional encodings / diffusion (transform.jl:975-1051)
# ---------------------------------------------------------------------------

def random_walk_pe(g: GraphTuple, walk_length: int) -> jax.Array:
    """Random-walk positional encoding: diag(P^k) for k=1..K with
    P = D_out^-1 A (transform.jl:975-990). Returns [N_pad, K] on device."""
    from .query import adjacency_matrix, degree
    A = adjacency_matrix(g, weighted=True)
    d = jnp.maximum(degree(g, dir="out"), 1e-12)
    P = A / d[:, None]
    out = []
    M = P
    for _ in range(walk_length):
        out.append(jnp.diagonal(M))
        M = M @ P
    return jnp.stack(out, axis=-1)


def ppr_diffusion(g: GraphTuple, *, alpha: float = 0.85) -> GraphTuple:
    """Personalized-PageRank edge reweighting via dense inverse
    (transform.jl:1026-1051): w' from alpha * (I - (1-alpha) A)^-1, keeping
    the existing edge support."""
    from .query import adjacency_matrix
    h = _unpack(g)
    A = np.asarray(adjacency_matrix(g, weighted=True))[:h.nn, :h.nn]
    ppr = alpha * np.linalg.inv(np.eye(h.nn) - (1 - alpha) * A)
    h.w = ppr[h.s, h.r].astype(np.float32)
    return _repack(h)
