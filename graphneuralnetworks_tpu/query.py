"""Graph queries: degree, adjacency, Laplacians, neighborhood structure.

Reference parity: GNNGraphs/src/query.jl. Gradient boundary matches the
reference's custom rrules: gradients flow to *edge weights* through
``adjacency_matrix``/``degree`` (query.jl:244-278, 381-412) and never to the
integer index structure (ints are non-differentiable in JAX by construction,
replicating the ``@non_differentiable`` fences at query.jl:612-621).

Dense adjacency is only sensible for small padded graphs (the reference's
:dense representation); large-graph code should stay on the COO/segment path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .graph import GraphTuple
from .ops.segment import gather, segment_sum

__all__ = [
    "degree",
    "adjacency_matrix",
    "laplacian_matrix",
    "normalized_adjacency",
    "normalized_laplacian",
    "scaled_laplacian",
    "laplacian_lambda_max",
    "graph_indicator",
    "has_self_loops",
    "has_multi_edges",
    "is_bidirected",
    "has_edge",
    "has_isolated_nodes",
    "is_directed",
    "get_graph_type",
    "khop_adj",
    "node_features",
    "edge_features",
    "graph_features",
    "adjacency_list",
    "inneighbors",
    "outneighbors",
]


def degree(g: GraphTuple, *, dir: str = "out", edge_weight=None,
           dtype=jnp.float32) -> jax.Array:
    """Weighted/unweighted degree vector [N_pad].

    Reference: GNNGraphs/src/query.jl:314-369 — a scatter-add of edge weights
    (or ones). ``edge_weight=None`` uses ``g.edge_weight`` if present;
    ``edge_weight=False`` forces unweighted. ``dir`` in {"out", "in", "both"}.
    """
    if edge_weight is None:
        ew = g.edge_weight
    elif edge_weight is False:
        ew = None
    else:
        ew = edge_weight
    w = jnp.ones((g.e_pad,), dtype) if ew is None else ew.astype(dtype)
    mask = g.edge_mask
    out = 0
    if dir in ("out", "both"):
        if hasattr(g, "src_space"):
            # mesh-sharded view: senders index the halo buffer, so a direct
            # segment-sum lands in the wrong space. Out-degree of owned
            # nodes == in-degree on the REVERSED partition, which is
            # receiver-keyed and therefore local math (shardgraph.py).
            if edge_weight is not None and edge_weight is not False:
                raise ValueError(
                    "out-degree on a mesh-sharded view cannot take explicit "
                    "edge weights (edge order differs on the reverse "
                    "partition); use the graph's own edge_weight")
            gr = g.reverse()
            wr = (jnp.ones((gr.e_pad,), dtype) if gr.edge_weight is None
                  or ew is None else gr.edge_weight.astype(dtype))
            out = out + segment_sum(wr, gr.receivers, gr.n_pad,
                                    mask=gr.edge_mask,
                                    sorted=gr.sorted_by_receivers)
        else:
            out = out + segment_sum(w, g.senders, g.n_pad, mask=mask)
    if dir in ("in", "both"):
        out = out + segment_sum(w, g.receivers, g.n_pad, mask=mask,
                                sorted=g.sorted_by_receivers)
    if dir not in ("out", "in", "both"):
        raise ValueError(f"dir must be out/in/both, got {dir!r}")
    return out


def adjacency_matrix(g: GraphTuple, *, dtype=jnp.float32,
                     weighted: bool = True) -> jax.Array:
    """Dense [N_pad, N_pad] adjacency, A[s, r] = w (or edge multiplicity).

    Convention matches the reference (`adjacency_matrix(g)[i, j] != 0` iff
    edge i->j; query.jl:220-243). Built by scatter-add so multi-edges
    accumulate (convert.jl:165-189 semantics); differentiable w.r.t. edge
    weights only.
    """
    if g.n_pad > 46341:   # floor(sqrt(2^31 - 1))
        # the linearized scatter index below would overflow int32 (and
        # int64 silently downcasts without jax_enable_x64); a dense [N, N]
        # at this size is >8GB anyway — callers must use the sparse path
        raise ValueError(
            f"adjacency_matrix: n_pad={g.n_pad} > 46341 would overflow the "
            "int32 linear index (and the dense matrix itself would be "
            ">8GB); dense queries are small-graph-only")
    w = (g.edge_weight.astype(dtype)
         if (weighted and g.edge_weight is not None)
         else jnp.ones((g.e_pad,), dtype))
    w = jnp.where(g.edge_mask, w, 0)
    lin = g.senders.astype(jnp.int32) * g.n_pad + g.receivers.astype(jnp.int32)
    flat = segment_sum(w, lin, g.n_pad * g.n_pad)
    return flat.reshape(g.n_pad, g.n_pad)


def laplacian_matrix(g: GraphTuple, *, dtype=jnp.float32,
                     dir: str = "out") -> jax.Array:
    """L = D - A (query.jl:424-428)."""
    A = adjacency_matrix(g, dtype=dtype)
    d = degree(g, dir=dir, dtype=dtype)
    return jnp.diag(d) - A


def normalized_adjacency(g: GraphTuple, *, dtype=jnp.float32,
                         add_self_loops: bool = False) -> jax.Array:
    """D^-1/2 (A [+ I]) D^-1/2 (query.jl:442-454). Self-loops added only on
    real nodes."""
    A = adjacency_matrix(g, dtype=dtype)
    if add_self_loops:
        A = A + jnp.diag(g.node_mask.astype(dtype))
    d = jnp.sum(A, axis=1)
    inv_sqrt = jnp.where(d > 0, jax.lax.rsqrt(jnp.maximum(d, 1e-12)), 0)
    return inv_sqrt[:, None] * A * inv_sqrt[None, :]


def normalized_laplacian(g: GraphTuple, *, dtype=jnp.float32,
                         add_self_loops: bool = False) -> jax.Array:
    """I - D^-1/2 A D^-1/2 on real nodes (query.jl:456-460)."""
    A = normalized_adjacency(g, dtype=dtype, add_self_loops=add_self_loops)
    eye = jnp.diag(g.node_mask.astype(dtype))
    return eye - A


def _power_iteration_eigmax(M: jax.Array, iters: int = 50) -> jax.Array:
    """Largest-|λ| eigenvalue via power iteration (reference uses KrylovKit
    ``eigmax``, query.jl:474-487). Jit-friendly fori_loop.

    The start vector is deterministic but pseudo-random: structured starts
    (e.g. all-ones) can be exactly orthogonal to the dominant eigenvector —
    the all-ones vector IS the λ=0 eigenvector of a regular graph's
    normalized Laplacian — which would silently converge to 0.
    """
    n = M.shape[0]
    v0 = jax.random.normal(jax.random.key(20240607), (n,), M.dtype)
    v0 = v0 / jnp.linalg.norm(v0)

    def body(_, v):
        w = M @ v
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-12)

    v = jax.lax.fori_loop(0, iters, body, v0)
    return v @ (M @ v)


def _per_graph_eigmax(g: GraphTuple, L: jax.Array,
                      iters: int = 100) -> jax.Array:
    """Per-graph λ_max of a block-diagonal matrix via blocked power iteration.

    One power-iteration vector per graph in the batch, each masked to its own
    node block, all advanced with a single dense matmul per step. Replaces
    the reference's per-graph KrylovKit loop (query.jl:598-610) with a
    jit-friendly batched formulation. Returns float[G_pad].
    """
    ng = g.g_pad
    sel = ((g.node_graph_id[:, None] == jnp.arange(ng, dtype=jnp.int32)[None])
           & g.node_mask[:, None]).astype(L.dtype)       # [N_pad, G]
    v0 = jax.random.normal(jax.random.key(20240607), (g.n_pad, ng), L.dtype)
    v0 = v0 * sel
    v0 = v0 / jnp.maximum(jnp.linalg.norm(v0, axis=0, keepdims=True), 1e-12)

    def body(_, v):
        w = (L @ v) * sel
        return w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True),
                               1e-12)

    v = jax.lax.fori_loop(0, iters, body, v0)
    return jnp.sum(v * (L @ v), axis=0)


def laplacian_lambda_max(g: GraphTuple, *, dtype=jnp.float32,
                         add_self_loops: bool = False,
                         iters: int = 100) -> jax.Array:
    """λ_max of the normalized Laplacian (query.jl:598-610).

    Returns a scalar for a single graph; for a batched graph returns the
    per-graph values float[G_pad] (the reference loops `getgraph(g, i)` and
    computes each block's eigmax — here the block-diagonal structure lets all
    blocks power-iterate together with masked columns)."""
    L = normalized_laplacian(g, dtype=dtype, add_self_loops=add_self_loops)
    if g.g_pad == 1:
        return _power_iteration_eigmax(L, iters)
    return _per_graph_eigmax(g, L, iters)


def scaled_laplacian(g: GraphTuple, *, dtype=jnp.float32,
                     iters: int = 100) -> jax.Array:
    """2L/λ_max - I (query.jl:474-487), for Chebyshev layers.

    On a batched graph each block is scaled by its *own* λ_max (per-graph
    eigmax, matching the reference's per-graph `laplacian_lambda_max`):
    row-scaling by the node's graph value is exact because L is
    block-diagonal across graphs."""
    L = normalized_laplacian(g, dtype=dtype)
    n_mask = g.node_mask.astype(dtype)
    eye = jnp.diag(n_mask)
    if g.g_pad == 1:
        lam = _power_iteration_eigmax(L, iters)
        return 2.0 * L / jnp.maximum(lam, 1e-12) - eye
    lam = _per_graph_eigmax(g, L, iters)            # [G_pad]
    lam_node = lam[g.node_graph_id]                 # [N_pad]
    return 2.0 * L / jnp.maximum(lam_node, 1e-12)[:, None] - eye


def graph_indicator(g: GraphTuple, *, edges: bool = False) -> jax.Array:
    """Graph id per node (or per edge) — query.jl:500-512."""
    if edges:
        return gather(g.node_graph_id, g.receivers)
    return g.node_graph_id


def has_self_loops(g: GraphTuple) -> jax.Array:
    """Any real edge with s == r (query.jl:553-560)."""
    return jnp.any((g.senders == g.receivers) & g.edge_mask)


def has_multi_edges(g: GraphTuple) -> jax.Array:
    """Any duplicated (s, r) pair among real edges (query.jl:562-568)."""
    # Lexicographic sort of (s, r) pairs; padded edges get unique sentinels so
    # they can never collide. Avoids int32 overflow of s * n_pad + r.
    s = jnp.where(g.edge_mask, g.senders, -1 - jnp.arange(g.e_pad))
    r = jnp.where(g.edge_mask, g.receivers, 0)
    order = jnp.lexsort((r, s))
    ss, rs = s[order], r[order]
    dup = (ss[1:] == ss[:-1]) & (rs[1:] == rs[:-1]) & (ss[1:] >= 0)
    return jnp.any(dup)


def is_bidirected(g: GraphTuple) -> jax.Array:
    """Every edge has its reverse (query.jl:570-579) — via dense adjacency
    support symmetry (suitable for padded sizes where dense fits)."""
    A = adjacency_matrix(g, weighted=False)
    return jnp.all((A > 0) == (A.T > 0))


def has_edge(g: GraphTuple, i: int, j: int) -> jax.Array:
    """Whether edge i->j exists (Graphs.has_edge parity)."""
    return jnp.any((g.senders == i) & (g.receivers == j) & g.edge_mask)


def has_isolated_nodes(g: GraphTuple, *, dir: str = "out") -> jax.Array:
    """Any real node with zero degree (Graphs.has_isolated_nodes parity)."""
    d = degree(g, dir=dir, edge_weight=False)
    return jnp.any((d == 0) & g.node_mask)


def is_directed(g: GraphTuple) -> bool:
    """Edges are always directed in this framework (undirected inputs are
    materialized with reverse edges, like the reference's COO path)."""
    return True


def get_graph_type(g: GraphTuple) -> str:
    """The canonical representation — always padded COO (the reference's
    :coo; :dense/:sparse live behind the converters in convert.py)."""
    return "coo"


def khop_adj(g: GraphTuple, k: int, *, dtype=jnp.float32) -> jax.Array:
    """A^k (query.jl:587-589)."""
    A = adjacency_matrix(g, dtype=dtype)
    out = A
    for _ in range(k - 1):
        out = out @ A
    return out


def node_features(g: GraphTuple):
    """query.jl:516-528 — the single node feature array (or None/dict)."""
    if len(g.nodes) == 1:
        return next(iter(g.nodes.values()))
    return g.nodes or None


def edge_features(g: GraphTuple):
    if len(g.edges) == 1:
        return next(iter(g.edges.values()))
    return g.edges or None


def graph_features(g: GraphTuple):
    if len(g.globals_) == 1:
        return next(iter(g.globals_.values()))
    return g.globals_ or None


# ---- host-side (concrete) neighborhood queries -----------------------------

def adjacency_list(g: GraphTuple, *, dir: str = "out") -> list[list[int]]:
    """Concrete adjacency list (query.jl:176-206). Host-side only."""
    import numpy as np
    s = np.asarray(g.senders)[: int(g.num_edges)]
    r = np.asarray(g.receivers)[: int(g.num_edges)]
    n = int(g.num_nodes)
    out: list[list[int]] = [[] for _ in range(n)]
    a, b = (s, r) if dir == "out" else (r, s)
    for i, j in zip(a.tolist(), b.tolist()):
        out[i].append(j)
    return out


def outneighbors(g: GraphTuple, i: int) -> list[int]:
    """query.jl:116-136. Host-side only."""
    return adjacency_list(g, dir="out")[i]


def inneighbors(g: GraphTuple, i: int) -> list[int]:
    """query.jl:138-157. Host-side only."""
    return adjacency_list(g, dir="in")[i]
