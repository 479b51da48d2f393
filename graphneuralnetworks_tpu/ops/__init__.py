"""Functional op layer: gather/segment kernels, message passing, graph-wise ops."""

from .segment import (gather, segment_sum, segment_mean, segment_max,
                      segment_min, segment_prod, segment_reduce,
                      segment_softmax, AGGREGATIONS)
from .msgpass import (apply_edges, aggregate_neighbors, propagate, copy_xi,
                      copy_xj, xi_dot_xj, xi_sub_xj, xj_sub_xi, e_mul_xj,
                      w_mul_xj, to_src_space)
from .gutils import (reduce_nodes, reduce_edges, softmax_nodes, softmax_edges,
                     softmax_edge_neighbors, broadcast_nodes, broadcast_edges,
                     edge_graph_id)

__all__ = [
    "gather", "segment_sum", "segment_mean", "segment_max", "segment_min",
    "segment_prod", "segment_reduce", "segment_softmax", "AGGREGATIONS",
    "apply_edges", "aggregate_neighbors", "propagate", "copy_xi", "copy_xj",
    "xi_dot_xj", "xi_sub_xj", "xj_sub_xi", "e_mul_xj", "w_mul_xj",
    "to_src_space",
    "reduce_nodes", "reduce_edges", "softmax_nodes", "softmax_edges",
    "softmax_edge_neighbors", "broadcast_nodes", "broadcast_edges",
    "edge_graph_id",
]
