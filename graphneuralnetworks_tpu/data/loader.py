"""Host-side minibatch loader producing fixed-shape padded graph batches.

Reference parity: the reference trains graph-level tasks with Flux's
`DataLoader(...; batchsize, shuffle, collate=true)` whose collate calls
`MLUtils.batch` (examples/graph_classification_tudataset.jl:71-72, collation
at GNNGraphs/src/transform.jl:671-713). The TPU version must emit *statically
shaped* batches: graphs are assigned to ``num_buckets`` size-quantile
buckets, every batch draws from ONE bucket and is padded to that bucket's
worst-case capacity, so the whole epoch reuses ``num_buckets`` compiled
executables (SURVEY §3.4 — "padded size-bucketed batching is the single
biggest semantic change"). On size-skewed sets (TUDataset-like) a handful of
buckets cuts the padded volume several-fold vs one global capacity.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..graph import GraphTuple, round_up
from ..transform import batch as batch_graphs

__all__ = ["DataLoader"]


class DataLoader:
    """Iterate padded `GraphTuple` batches over a list of graphs.

    Graphs are sorted by size (nodes + edges) and split into ``num_buckets``
    equal-count buckets; each bucket gets ONE (n_pad, e_pad) capacity pair
    computed from its own worst-case batch, and every emitted batch —
    including a short final one, which is padded with empty graphs — has
    exactly its bucket's shapes. ``num_buckets=1`` (the default) reproduces
    the single global capacity. With ``shuffle=True`` graphs shuffle within
    their bucket and the batch order interleaves across buckets.
    """

    def __init__(self, graphs: Sequence[GraphTuple], *, batch_size: int = 32,
                 shuffle: bool = False, seed: int = 0,
                 node_multiple: int = 8, edge_multiple: int = 128,
                 num_buckets: int = 1):
        self.graphs = list(graphs)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        if num_buckets < 1:
            raise ValueError("num_buckets must be >= 1")

        nsz = np.array([int(g.num_nodes) for g in self.graphs])
        esz = np.array([int(g.num_edges) for g in self.graphs])
        order = np.argsort(nsz + esz, kind="stable")
        self._buckets = [b for b in np.array_split(order, num_buckets)
                         if len(b)]

        self.bucket_caps: list[tuple[int, int]] = []
        for idxs in self._buckets:
            bn = np.sort(nsz[idxs])[::-1]
            be = np.sort(esz[idxs])[::-1]
            worst_n = int(bn[: self.batch_size].sum())
            worst_e = int(be[: self.batch_size].sum())
            self.bucket_caps.append(
                (round_up(worst_n + 1, node_multiple),
                 round_up(max(worst_e, 1), edge_multiple)))
        # back-compat worst-case attrs (== the largest bucket's capacities)
        self.n_pad = max(c[0] for c in self.bucket_caps)
        self.e_pad = max(c[1] for c in self.bucket_caps)

    def __len__(self):
        bs = self.batch_size
        return sum((len(b) + bs - 1) // bs for b in self._buckets)

    def padding_stats(self) -> dict:
        """Static padding-efficiency accounting (capacities are per-bucket
        constants, so the padded volume doesn't depend on the shuffle).
        ``node_util``/``edge_util`` = real volume / padded volume."""
        bs = self.batch_size
        nsz = np.array([int(g.num_nodes) for g in self.graphs])
        esz = np.array([int(g.num_edges) for g in self.graphs])
        pad_n = pad_e = 0
        for idxs, (npad, epad) in zip(self._buckets, self.bucket_caps):
            nb = (len(idxs) + bs - 1) // bs
            pad_n += nb * npad
            pad_e += nb * epad
        return {"node_util": float(nsz.sum() / pad_n),
                "edge_util": float(esz.sum() / pad_e),
                "padded_nodes": int(pad_n), "padded_edges": int(pad_e),
                "buckets": list(self.bucket_caps)}

    def __iter__(self):
        bs = self.batch_size
        plan: list[tuple[int, np.ndarray]] = []
        for bi, idxs in enumerate(self._buckets):
            idxs = idxs.copy()
            if self.shuffle:
                self._rng.shuffle(idxs)
            for i in range(0, len(idxs), bs):
                plan.append((bi, idxs[i:i + bs]))
        if self.shuffle:
            self._rng.shuffle(plan)
        for bi, chunk_idx in plan:
            chunk = [self.graphs[j] for j in chunk_idx]
            while len(chunk) < bs:  # pad short batch with empty graphs
                chunk.append(_empty_like(chunk[0]))
            npad, epad = self.bucket_caps[bi]
            yield batch_graphs(chunk, n_pad=npad, e_pad=epad)


def _empty_like(g: GraphTuple) -> GraphTuple:
    """A 0-node, 0-edge graph with the same feature schema as ``g``."""
    from ..graph import graph
    import numpy as np
    nodes = {k: np.zeros((0,) + v.shape[1:], np.asarray(v).dtype)
             for k, v in g.nodes.items()}
    edges = {k: np.zeros((0,) + v.shape[1:], np.asarray(v).dtype)
             for k, v in g.edges.items()}
    globals_ = {k: np.zeros((1,) + v.shape[1:], np.asarray(v).dtype)
                for k, v in g.globals_.items()}
    return graph(np.zeros(0, np.int32), np.zeros(0, np.int32), num_nodes=0,
                 nodes=nodes or None, edges=edges or None,
                 globals_=globals_ or None)
