"""Host-side minibatch loader producing fixed-shape padded graph batches.

Reference parity: the reference trains graph-level tasks with Flux's
`DataLoader(...; batchsize, shuffle, collate=true)` whose collate calls
`MLUtils.batch` (examples/graph_classification_tudataset.jl:71-72, collation
at GNNGraphs/src/transform.jl:671-713). The TPU version must emit *statically
shaped* batches: every batch is padded to shared (n_pad, e_pad) bucket
capacities so the whole epoch reuses one compiled executable (SURVEY §3.4 —
"padded size-bucketed batching is the single biggest semantic change").
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..graph import GraphTuple, round_up
from ..transform import batch as batch_graphs

__all__ = ["DataLoader"]


class DataLoader:
    """Iterate padded `GraphTuple` batches over a list of graphs.

    Capacities are computed once from the worst-case batch (max total nodes /
    edges over any `batch_size` graphs, rounded up), so every batch —
    including a short final one — has identical shapes. The final short batch
    is padded with empty graphs up to ``batch_size`` graphs so the
    per-graph axis is static too.
    """

    def __init__(self, graphs: Sequence[GraphTuple], *, batch_size: int = 32,
                 shuffle: bool = False, seed: int = 0,
                 node_multiple: int = 8, edge_multiple: int = 128):
        self.graphs = list(graphs)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)

        sizes = sorted((int(g.num_nodes) for g in self.graphs), reverse=True)
        esizes = sorted((int(g.num_edges) for g in self.graphs), reverse=True)
        worst_n = sum(sizes[: self.batch_size])
        worst_e = sum(esizes[: self.batch_size])
        self.n_pad = round_up(worst_n + 1, node_multiple)
        self.e_pad = round_up(max(worst_e, 1), edge_multiple)

    def __len__(self):
        return (len(self.graphs) + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.graphs))
        if self.shuffle:
            self._rng.shuffle(order)
        bs = self.batch_size
        for i in range(0, len(order), bs):
            chunk = [self.graphs[j] for j in order[i:i + bs]]
            while len(chunk) < bs:  # pad short batch with empty graphs
                chunk.append(_empty_like(chunk[0]))
            yield batch_graphs(chunk, n_pad=self.n_pad, e_pad=self.e_pad)


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
