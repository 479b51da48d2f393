"""Graph set operators.

Reference parity: GNNGraphs/src/operators.jl:7-18 — ``intersect`` of two
graphs = edges present in both (on the union node count).
"""

from __future__ import annotations

import numpy as np

from .graph import GraphTuple, graph

__all__ = ["intersect_graphs"]


def intersect_graphs(g1: GraphTuple, g2: GraphTuple) -> GraphTuple:
    """Edges present in both graphs (operators.jl:7-18)."""
    n = max(int(g1.num_nodes), int(g2.num_nodes))

    def eset(g):
        ne = int(g.num_edges)
        s = np.asarray(g.senders)[:ne]
        r = np.asarray(g.receivers)[:ne]
        return set(zip(s.tolist(), r.tolist()))

    common = sorted(eset(g1) & eset(g2))
    s = np.asarray([a for a, _ in common], np.int32)
    r = np.asarray([b for _, b in common], np.int32)
    return graph(s, r, num_nodes=n)
