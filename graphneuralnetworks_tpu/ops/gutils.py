"""Graph-wise reductions and broadcasts over batched graphs.

Reference parity: GNNlib/src/utils.jl:1-133 — ``reduce_nodes``,
``reduce_edges``, ``softmax_nodes``, ``softmax_edges``,
``softmax_edge_neighbors``, ``broadcast_nodes``, ``broadcast_edges``. All are
segment ops keyed by the graph indicator (for graph-wise) or the receiver (for
neighbor-wise), with padding masked out.
"""

from __future__ import annotations

import jax

from ..graph import GraphTuple
from .segment import (gather, segment_reduce, segment_softmax)

__all__ = [
    "reduce_nodes",
    "reduce_edges",
    "softmax_nodes",
    "softmax_edges",
    "softmax_edge_neighbors",
    "broadcast_nodes",
    "broadcast_edges",
    "edge_graph_id",
]


def edge_graph_id(g: GraphTuple) -> jax.Array:
    """int32[E_pad] graph indicator for edges (via the receiver's graph)."""
    return gather(g.node_graph_id, g.receivers)


def reduce_nodes(aggr, g: GraphTuple, x: jax.Array) -> jax.Array:
    """Per-graph reduction of node features -> [G_pad, ...].

    Reference: GNNlib/src/utils.jl:12-26 (scatter by graph_indicator).
    """
    return segment_reduce(aggr, x, g.node_graph_id, g.g_pad,
                          mask=g.node_mask, sorted=True)


def reduce_edges(aggr, g: GraphTuple, e: jax.Array) -> jax.Array:
    """Per-graph reduction of edge features (utils.jl:33-42)."""
    return segment_reduce(aggr, e, edge_graph_id(g), g.g_pad,
                          mask=g.edge_mask, sorted=g.sorted_by_receivers)


def softmax_nodes(g: GraphTuple, x: jax.Array) -> jax.Array:
    """Graph-wise softmax over nodes (utils.jl:49-59)."""
    return segment_softmax(x, g.node_graph_id, g.g_pad, mask=g.node_mask,
                           sorted=True)


def softmax_edges(g: GraphTuple, e: jax.Array) -> jax.Array:
    """Graph-wise softmax over edges (utils.jl:63-72)."""
    return segment_softmax(e, edge_graph_id(g), g.g_pad, mask=g.edge_mask)


def softmax_edge_neighbors(g: GraphTuple, e: jax.Array) -> jax.Array:
    """Softmax over each node's incoming edges — the attention primitive.

    Reference: GNNlib/src/utils.jl:84-97. Max-subtracted for stability;
    padded edges contribute 0.
    """
    return segment_softmax(e, g.receivers, g.n_pad, mask=g.edge_mask,
                           sorted=g.sorted_by_receivers)


def broadcast_nodes(g: GraphTuple, u: jax.Array) -> jax.Array:
    """Expand a per-graph array [G_pad, ...] to nodes [N_pad, ...]
    (utils.jl:105-112)."""
    return gather(u, g.node_graph_id)


def broadcast_edges(g: GraphTuple, u: jax.Array) -> jax.Array:
    """Expand a per-graph array to edges (utils.jl:116-121)."""
    return gather(u, edge_graph_id(g))
