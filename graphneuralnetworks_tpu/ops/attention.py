"""Fused attention-aggregation over incoming edges with virtual self-loops.

This is the TPU-first replacement for the reference's pattern of
``add_self_loops(g)`` + ``softmax_edge_neighbors`` + weighted segment-sum
(GNNlib/src/layers/conv.jl:112-150 and GNNlib/src/utils.jl:84-97): instead of
materializing self-loop edges (which would change the static edge capacity
under jit), the self term enters the softmax analytically. The math is
identical to softmaxing over the union {in-edges} ∪ {self}.

Attention dropout is expressed as precomputed multiplicative masks
(0 or 1/(1-p)) on the normalized alphas — the reference's ``dropout(α)``
(conv.jl:139) — which keeps both the XLA path and the fused Pallas kernel
path (ops/pallas/edge_softmax.py) usable during training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..graph import GraphTuple
from .msgpass import to_src_space
from .segment import gather, segment_sum, segment_max

__all__ = ["attention_aggregate", "gat_attention", "gatv2_attention",
           "dot_attention", "dot_attention_logits"]


def gatv2_attention(g: GraphTuple, q: jax.Array, k: jax.Array,
                    a: jax.Array, slope: float, *,
                    self_logits: jax.Array | None = None,
                    self_values: jax.Array | None = None,
                    dropout_masks=None,
                    num_segments: int | None = None) -> jax.Array:
    """GATv2 attention: logits ``<a_h, leaky_relu(q[r] + k[s])>``, values=k.

    On the fused path the whole layer pays ONE grouped gather
    (ops/pallas/edge_softmax.py:gatv2_attention_nodes). Falls back to
    gathered logits + :func:`attention_aggregate` when dropout masks are
    present or shapes don't fit.

    Args:
      q/k: [N_dst, H, O] / [N_src, H, O] (Wi x / Wj x; k is also the value).
      a: [O, H] attention vector.
    """
    n = num_segments if num_segments is not None else g.n_pad
    k = to_src_space(g, k)   # identity unless g is a mesh-sharded view
    if (g.spmm_aux is not None and n == g.n_pad and dropout_masks is None
            and q.ndim == 3 and q.shape[0] == n):
        from .pallas.edge_softmax import gatv2_attention_nodes
        from .pallas.spmm import BD
        if q.shape[-1] <= BD:
            return gatv2_attention_nodes(
                q, k, a, g.spmm_aux,
                (g.receivers, g.senders, g.edge_mask),
                (n, k.shape[0], float(slope)),
                self_logits, self_values)
    wx = gather(q, g.receivers) + gather(k, g.senders)
    logits = jnp.einsum("ehf,fh->eh",
                        jax.nn.leaky_relu(wx, slope), a)
    return attention_aggregate(g, logits, k, self_logits=self_logits,
                               self_values=self_values,
                               dropout_masks=dropout_masks,
                               num_segments=num_segments, node_values=True)


def dot_attention(g: GraphTuple, q: jax.Array, k: jax.Array,
                  values: jax.Array, scale: float = 1.0, *,
                  self_logits: jax.Array | None = None,
                  self_values: jax.Array | None = None,
                  num_segments: int | None = None) -> jax.Array:
    """Attention with logits ``scale * <q[r_e], k[s_e]>`` (transformer/AGNN).

    On the fused path the logits are computed IN-kernel
    (ops/pallas/edge_softmax.py:dot_attention_nodes): no edge-space array is
    ever materialized, and K/V ride one fused grouped gather. Falls back to
    SDDMM logits + :func:`attention_aggregate` otherwise.

    Args:
      q/k: [N_dst, H, O] / [N_src, H, O] projections.
      values: [N_src, H, D] sender-side node values.
      scale: static logit scale (e.g. 1/sqrt(O)).
      self_logits: optional [N, H] virtual self-loop logits, ALREADY scaled.
    """
    n = num_segments if num_segments is not None else g.n_pad
    k = to_src_space(g, k)
    values = to_src_space(g, values)
    if (g.spmm_aux is not None and n == g.n_pad and q.ndim == 3
            and values.ndim == 3 and q.shape[0] == n
            and k.shape[0] == values.shape[0]):
        from .pallas.edge_softmax import dot_attention_nodes
        from .pallas.spmm import BD
        if q.shape[-1] <= BD and values.shape[-1] <= BD:
            return dot_attention_nodes(
                q, k, values, g.spmm_aux,
                (g.receivers, g.senders, g.edge_mask),
                (n, values.shape[0], float(scale), None),
                self_logits, self_values)
    logits = dot_attention_logits(g, q, k) * scale
    return attention_aggregate(g, logits, values, self_logits=self_logits,
                               self_values=self_values,
                               num_segments=num_segments, node_values=True)


def dot_attention_logits(g: GraphTuple, qi: jax.Array,
                         kj: jax.Array) -> jax.Array:
    """Per-edge per-head endpoint dots ``<qi[r_e], kj[s_e]>`` -> [E, H].

    Dispatches to the grouped SDDMM kernel (ops/pallas/sddmm.py) per head —
    receiver rows ride the output block so only the sender side pays a
    gather; falls back to two gathers + reduce otherwise. ``qi``/``kj``:
    [N, H, O] (or [N, O] for a single implicit head -> returns [E]).
    """
    kj = to_src_space(g, kj)
    if (g.spmm_aux is not None and qi.shape[0] == g.n_pad
            and kj.shape[0] == g.n_pad and qi.shape[-1] > 256):
        # kernel wins only at wide features (see ops/msgpass.py dispatch)
        from .pallas.sddmm import sddmm
        if qi.ndim == 2:
            return sddmm(qi, kj, g.spmm_aux, (g.e_pad,))
        if qi.ndim == 3:
            return jnp.stack(
                [sddmm(qi[:, h, :], kj[:, h, :], g.spmm_aux, (g.e_pad,))
                 for h in range(qi.shape[1])], axis=1)
    return jnp.sum(gather(qi, g.receivers) * gather(kj, g.senders), -1)


def gat_attention(g: GraphTuple, pi: jax.Array, pj: jax.Array,
                  values: jax.Array, slope: float, *,
                  self_logits: jax.Array | None = None,
                  self_values: jax.Array | None = None,
                  dropout_masks=None,
                  num_segments: int | None = None,
                  pj_weight: jax.Array | None = None) -> jax.Array:
    """GAT-family attention with affine logits ``leaky_relu(pi[r]+pj[s])``.

    On the fused path the logits are computed IN-kernel from node-level
    projections (ops/pallas/edge_softmax.py:gat_attention_nodes): no
    edge-space [E, H] logit array is ever materialized, and the value
    sender-gather fuses into the scatter-matmul. Falls back to gathered
    logits + :func:`attention_aggregate` when dropout masks are present
    (the affine kernel has no mask input) or shapes don't fit.

    Args:
      pi/pj: [N_dst, H] / [N_src, H] receiver/sender logit projections.
      values: [N_src, H, D] sender-side node values.
      slope: leaky_relu negative slope (static).
      pj_weight: optional [D, H] such that ``pj == <values, pj_weight>``
        per head — lets the fused kernel regenerate grouped pj from the
        gathered value rows and skip the second grouped gather (GATConv's
        no-edge-feature case; see gat_attention_nodes).
      self_logits/self_values/dropout_masks/num_segments: as
        :func:`attention_aggregate`.
    """
    n = num_segments if num_segments is not None else g.n_pad
    pj = to_src_space(g, pj)
    values = to_src_space(g, values)
    if (g.spmm_aux is not None and n == g.n_pad and dropout_masks is None
            and pi.ndim == 2 and values.ndim == 3
            and pi.shape[0] == n and values.shape[0] == pj.shape[0]):
        from .pallas.edge_softmax import gat_attention_nodes
        from .pallas.spmm import BD
        if values.shape[-1] <= BD:
            # affine logits in-kernel; the sender side pays two 1-chunk
            # node-table gathers (pj scalars + value rows) — the cheapest
            # layout on the descriptor-rate-bound gather engine (the old
            # rank-2 [k_pad128 | v] fused gather cost 2 chunks/row)
            return gat_attention_nodes(
                pi, pj, values, g.spmm_aux,
                (g.receivers, g.senders, g.edge_mask),
                (n, values.shape[0], float(slope)),
                self_logits, self_values, pj_weight)
    logits = jax.nn.leaky_relu(
        gather(pi, g.receivers) + gather(pj, g.senders), slope)
    return attention_aggregate(g, logits, values, self_logits=self_logits,
                               self_values=self_values,
                               dropout_masks=dropout_masks,
                               num_segments=num_segments, node_values=True)


def attention_aggregate(g: GraphTuple, logits: jax.Array, values: jax.Array,
                        *, self_logits: jax.Array | None = None,
                        self_values: jax.Array | None = None,
                        dropout_masks=None,
                        num_segments: int | None = None,
                        node_values: bool = False) -> jax.Array:
    """Softmax ``logits`` per receiving node and aggregate ``values``.

    Args:
      logits: [E_pad, *H] unnormalized attention scores per edge.
      values: [E_pad, *H, D] messages — or, with ``node_values=True``,
        [N_src_pad, *H, D] sender-side NODE values (edge e contributes
        ``values[sender_e]``). Node-level values skip the [E, H, D]
        materialization entirely on the fused path: the sender-gather is
        fused into the scatter-matmul kernel, the single biggest HBM saving
        on the attention stack (GAT-family layers' values are always W x_j).
      self_logits/self_values: optional [N, *H] / [N, *H, D] virtual
        self-loop terms entering each node's softmax (the analytic
        ``add_self_loops`` — see module docstring).
      dropout_masks: optional (mask_e, mask_self-or-None) multiplicative
        dropout scales applied to the normalized attention coefficients.
      num_segments: destination node count (defaults to ``g.n_pad``; pass the
        destination-side padded count for bipartite/hetero relations).

    Returns: [N, *H, D] aggregated destination-node features.
    """
    r = g.receivers
    n = num_segments if num_segments is not None else g.n_pad
    mask = g.edge_mask
    if node_values:
        values = to_src_space(g, values)

    # Fused Pallas path: segment-max kernel + denominator-fused weighted
    # scatter-matmul (ops/pallas/edge_softmax.py). Engaged when the graph
    # carries SpMM grouping metadata and the aggregation targets its own
    # padded node set.
    if (g.spmm_aux is not None and n == g.n_pad and logits.ndim in (1, 2)
            and values.ndim == logits.ndim + 1
            and (not node_values or values.shape[0] == g.src_pad)):
        from .pallas.edge_softmax import (edge_softmax_aggregate,
                                          edge_softmax_aggregate_nodes)
        squeeze = logits.ndim == 1
        lg = logits[:, None] if squeeze else logits
        vals = values[:, None, :] if squeeze else values
        sl, sv = self_logits, self_values
        dm = dropout_masks
        if squeeze:
            if sl is not None:
                sl = sl[:, None]
                sv = sv[:, None, :]
            if dm is not None:
                dm = (dm[0][:, None],
                      dm[1][:, None] if dm[1] is not None else None)
        if node_values:
            out = edge_softmax_aggregate_nodes(
                lg, vals, g.spmm_aux, (r, g.senders, mask),
                (n, vals.shape[0]), sl, sv, dm)
        else:
            out = edge_softmax_aggregate(lg, vals, (g.spmm_aux[0], r, mask),
                                         (n,), sl, sv, dm)
        return out[:, 0, :] if squeeze else out

    if node_values:
        values = gather(values, g.senders)

    mx = segment_max(logits, r, n, mask=mask, sorted=g.sorted_by_receivers,
                     empty_value=None)  # [N, *H], -inf where no in-edges
    if self_logits is not None:
        mx = jnp.maximum(mx, self_logits)
    # Nodes with no edges at all: keep max finite to avoid nan from inf-inf.
    mx = jnp.where(jnp.isneginf(mx), 0.0, mx)

    ex = jnp.exp(logits - gather(mx, r))
    ex = jnp.where(mask.reshape((-1,) + (1,) * (ex.ndim - 1)), ex, 0)
    denom = segment_sum(ex, r, n, sorted=g.sorted_by_receivers)
    if self_logits is not None:
        ex_self = jnp.exp(self_logits - mx)
        denom = denom + ex_self
    denom = jnp.maximum(denom, jnp.finfo(ex.dtype).tiny)

    alpha = ex / gather(denom, r)                        # [E, *H]
    if dropout_masks is not None:
        alpha = alpha * dropout_masks[0]

    out = segment_sum(alpha[..., None] * values, r, n,
                      sorted=g.sorted_by_receivers)
    if self_logits is not None:
        alpha_self = ex_self / denom                     # [N, *H]
        if dropout_masks is not None and dropout_masks[1] is not None:
            alpha_self = alpha_self * dropout_masks[1]
        out = out + alpha_self[..., None] * self_values
    return out
