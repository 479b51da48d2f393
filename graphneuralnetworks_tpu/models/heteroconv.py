"""HeteroGraphConv: per-relation convolution with destination-type merge.

Reference parity: GraphNeuralNetworks/src/layers/heteroconv.jl:40-86 —
dispatches one homogeneous layer per relation on the relation subgraph with a
``(x_src, x_dst)`` bipartite input, then reduces multi-relation outputs per
destination node type with ``aggr``.

TPU-first: the relation dict is static, so the loop unrolls under jit into
independent per-relation kernels (SURVEY §3.5).
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
from flax import nnx

from ..heterograph import EType, HeteroGraphTuple
from .basic import GNNLayer

__all__ = ["HeteroGraphConv"]


class HeteroGraphConv(GNNLayer):
    """``HeteroGraphConv({etype: layer, ...}; aggr="sum")``.

    Call with a hetero graph and ``{ntype: features}``; returns updated
    ``{ntype: features}`` for every destination type covered by a relation.
    Layers must support bipartite ``(x_src, x_dst)`` inputs (GraphConv,
    SAGEConv, GATConv, GATv2Conv (self-loops off), GINConv, EdgeConv,
    ResGatedGraphConv, CGConv, ...).
    """

    def __init__(self, layers: Mapping[EType, GNNLayer] | list, *,
                 aggr: str = "sum"):
        if isinstance(layers, Mapping):
            items = list(layers.items())
        else:
            items = list(layers)
        self.etypes = [tuple(et) for et, _ in items]
        self.convs = nnx.List([l for _, l in items])
        self.aggr = aggr

    def __call__(self, g: HeteroGraphTuple, x: Mapping[str, jnp.ndarray],
                 **kw):
        outs: dict[str, list] = {}
        for et, layer in zip(self.etypes, self.convs):
            src_t, _, dst_t = et
            sub = g.relation_graph(et)
            y = layer(sub, (x[src_t], x[dst_t]), **kw)
            outs.setdefault(dst_t, []).append(y)
        # reduce multi-relation outputs per destination type
        # (heteroconv.jl:68-86, `_reduceby_node_t`)
        merged = {}
        for t, ys in outs.items():
            if len(ys) == 1:
                merged[t] = ys[0]
            elif self.aggr in ("sum", "+", "add"):
                merged[t] = sum(ys[1:], ys[0])
            elif self.aggr == "mean":
                merged[t] = sum(ys[1:], ys[0]) / len(ys)
            elif self.aggr == "max":
                m = ys[0]
                for y in ys[1:]:
                    m = jnp.maximum(m, y)
                merged[t] = m
            elif self.aggr == "min":
                m = ys[0]
                for y in ys[1:]:
                    m = jnp.minimum(m, y)
                merged[t] = m
            else:
                raise ValueError(f"unknown aggr {self.aggr!r}")
        return merged
