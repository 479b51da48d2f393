"""Representation converters: adjacency list / scipy sparse / dense.

Reference parity: GNNGraphs/src/convert.jl — ``to_coo`` from adjacency
list/dense/sparse (:3-100), ``to_dense`` (:165-189), ``to_sparse``
(:221-237). The canonical on-device representation here is the padded COO
`GraphTuple`; dense adjacency lives in query.adjacency_matrix; these helpers
cover host-side interop.
"""

from __future__ import annotations

import numpy as np

from .graph import GraphTuple, graph, from_dense_adjacency

__all__ = ["from_adjacency_list", "to_scipy_sparse", "from_scipy_sparse",
           "to_dense_adjacency", "from_dense_adjacency"]


def from_adjacency_list(adj_list, **kw) -> GraphTuple:
    """Build from ``adj_list[i] = [out-neighbors of i]`` (convert.jl:3-27)."""
    s, r = [], []
    for i, nbrs in enumerate(adj_list):
        for j in nbrs:
            s.append(i)
            r.append(int(j))
    kw.setdefault("num_nodes", len(adj_list))
    return graph(np.asarray(s, np.int32), np.asarray(r, np.int32), **kw)


def to_scipy_sparse(g: GraphTuple):
    """CSR adjacency (A[s, r] = w) — convert.jl ``to_sparse`` analog."""
    import scipy.sparse as sp
    ne = int(g.num_edges)
    nn = int(g.num_nodes)
    s = np.asarray(g.senders)[:ne]
    r = np.asarray(g.receivers)[:ne]
    w = (np.asarray(g.edge_weight)[:ne] if g.edge_weight is not None
         else np.ones(ne, np.float32))
    return sp.csr_matrix((w, (s, r)), shape=(nn, nn))


def from_scipy_sparse(A, **kw) -> GraphTuple:
    """Build from any scipy sparse matrix."""
    coo = A.tocoo()
    w = coo.data
    kw.setdefault("num_nodes", A.shape[0])
    if not np.all(w == 1):
        kw.setdefault("edge_weight", w.astype(np.float32))
    return graph(coo.row.astype(np.int32), coo.col.astype(np.int32), **kw)


def to_dense_adjacency(g: GraphTuple, *, trim: bool = True) -> np.ndarray:
    """Host-side dense adjacency on true node count (convert.jl:165-189)."""
    from .query import adjacency_matrix
    A = np.asarray(adjacency_matrix(g))
    if trim:
        nn = int(g.num_nodes)
        A = A[:nn, :nn]
    return A
