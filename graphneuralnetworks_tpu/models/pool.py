"""Graph pooling layers: GlobalPool, GlobalAttentionPool, TopKPool, Set2Set.

Reference parity: GraphNeuralNetworks/src/layers/pool.jl:35-162 (surfaces)
and GNNlib/src/layers/pool.jl:1-43 (math). All are segment reductions keyed
by the graph indicator, so they work on padded batched graphs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..graph import GraphTuple
from ..ops import (broadcast_nodes, reduce_nodes, softmax_nodes)
from .basic import GNNLayer, glorot_uniform

__all__ = ["GlobalPool", "GlobalAttentionPool", "TopKPool", "Set2Set",
           "topk_index"]


def topk_index(y, k: int, *, g: GraphTuple | None = None):
    """Indices of the ``k`` largest entries of the score vector ``y``.

    Reference parity: ``topk_index`` (GNNlib/src/layers/pool.jl:22-27,
    exported at GNNlib/src/GNNlib.jl:71). The reference returns every index
    whose score ties the k-th largest (possibly more than ``k``); this
    jit-friendly version returns exactly ``k`` indices (``jax.lax.top_k``
    tie-break: lowest index wins), sorted by descending score.

    Without ``g``: ``y`` is ``[N]`` and the result is ``(values [k],
    indices [k])`` over the whole vector.

    With a (possibly batched, padded) graph ``g``: returns per-graph top-k —
    ``(values [G_pad, k], indices [G_pad, k])`` where ``indices[b]`` are
    GLOBAL node indices of graph ``b``'s top-k nodes. Padding nodes (and
    nodes of other graphs) score ``-inf``; graphs with fewer than ``k``
    valid nodes pad the tail with ``-inf`` values (their indices point at
    arbitrary masked nodes — check ``values`` for finiteness).
    """
    y = jnp.asarray(y)
    if y.ndim != 1:
        raise ValueError(f"topk_index expects a score vector, got {y.shape}")
    if g is None:
        return jax.lax.top_k(y, k)
    mask = (g.node_graph_id[None, :] == jnp.arange(g.g_pad)[:, None])
    mask = mask & g.node_mask[None, :]
    per_graph = jnp.where(mask, y[None, :], -jnp.inf)     # [G_pad, N_pad]
    return jax.lax.top_k(per_graph, k)


class GlobalPool(GNNLayer):
    """Per-graph reduction of node features -> [G_pad, D].

    Reference: pool.jl:35-41 (`GlobalPool(aggr)`); math = `reduce_nodes`.
    """

    def __init__(self, aggr="sum"):
        self.aggr = aggr

    def __call__(self, g: GraphTuple, x=None):
        if x is None:
            x = g.x
        return reduce_nodes(self.aggr, g, x)


class GlobalAttentionPool(GNNLayer):
    """Gated attention pooling (Li et al.).

    Reference: pool.jl:88-99; math GNNlib pool.jl:7-12:
    ``u = Σ_i softmax_nodes(fgate(x))_i ⊙ ffeat(x)_i``.
    """

    def __init__(self, fgate, ffeat=None):
        self.fgate = fgate
        self.ffeat = ffeat

    def __call__(self, g: GraphTuple, x=None):
        if x is None:
            x = g.x
        alpha = softmax_nodes(g, self.fgate(x))
        feats = alpha * (self.ffeat(x) if self.ffeat is not None else x)
        return reduce_nodes("sum", g, feats)


class TopKPool(GNNLayer):
    """Top-k node pooling (Gao & Ji).

    Reference: pool.jl:112-123; math GNNlib pool.jl:14-27: score
    ``y = p^T X / |p|``, keep top-k nodes, features scaled by ``sigmoid(y)``.
    Returns (x_pooled [k, D], idx [k]) for a single (non-batched) graph;
    jit-friendly via ``jax.lax.top_k``.
    """

    def __init__(self, in_features: int, k: int, *, rngs: nnx.Rngs):
        self.p = nnx.Param(glorot_uniform()(rngs.params(), (in_features, 1), jnp.float32))
        self.k = k

    def __call__(self, g: GraphTuple, x=None):
        if x is None:
            x = g.x
        p = self.p[...][:, 0]
        y = x @ p / jnp.maximum(jnp.linalg.norm(p), 1e-12)     # [N_pad]
        y = jnp.where(g.node_mask, y, -jnp.inf)
        topv, topi = topk_index(y, self.k)
        xk = x[topi] * jax.nn.sigmoid(topv)[:, None]
        return xk, topi


class Set2Set(GNNLayer):
    """Set2Set pooling (Vinyals et al.) -> [G_pad, 2*D].

    Reference: pool.jl:144-162; math GNNlib pool.jl:29-43 — ``n_iters`` LSTM
    query/attend/readout rounds.
    """

    def __init__(self, in_features: int, n_iters: int, *, rngs: nnx.Rngs):
        self.lstm = nnx.OptimizedLSTMCell(2 * in_features, in_features,
                                          rngs=rngs)
        self.n_iters = n_iters
        self.in_features = in_features

    def __call__(self, g: GraphTuple, x=None):
        if x is None:
            x = g.x
        G = g.g_pad
        D = self.in_features
        qstar = jnp.zeros((G, 2 * D), x.dtype)
        z = jnp.zeros((G, D), x.dtype)
        carry = (z, z)  # (c, h) zeros, like the reference (pool.jl:32-34)
        for _ in range(self.n_iters):
            carry, q = self.lstm(carry, qstar)          # q: [G, D]
            qn = broadcast_nodes(g, q)                  # [N, D]
            alpha = softmax_nodes(g, jnp.sum(qn * x, -1, keepdims=True))
            r = reduce_nodes("sum", g, x * alpha)       # [G, D]
            qstar = jnp.concatenate([q, r], -1)
        return qstar
