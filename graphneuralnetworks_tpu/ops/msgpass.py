"""Functional message-passing core: propagate / apply_edges / aggregate_neighbors.

Reference parity: GNNlib/src/msgpass.jl:69-238. Semantics:

- ``apply_edges(f, g; xi, xj, e)`` gathers ``xi`` on receivers (targets) and
  ``xj`` on senders (sources), then maps ``f(xi, xj, e)`` over the edge batch
  (msgpass.jl:115-129). Dict (NamedTuple-in-reference) inputs/outputs pass
  through transparently.
- ``aggregate_neighbors(g, aggr, m)`` segment-reduces edge messages onto the
  receiving node (msgpass.jl:145-149), masking padded edges.
- ``propagate(f, g, aggr; ...)`` composes the two (msgpass.jl:71-79).

The reference's fused fast path ``propagate(copy_xj, g, +) == xj * A`` (sparse
matmul, msgpass.jl:215-238) maps here to a receiver-sorted gather +
``segment_sum`` that XLA fuses, or — on TPU — the Pallas scatter-matmul SpMM
kernel in ops/pallas/spmm.py, selected automatically for the hot aggregations.

TPU-first design notes: everything is static-shape; the edge mask derived from
``g.num_edges`` keeps padding out of sums/means/maxes; gradients flow through
gather/segment ops by JAX AD (gather^T = segment-sum and vice versa — the same
pullback pairing Zygote uses in the reference).
"""

from __future__ import annotations

from typing import Callable, Mapping

import jax.numpy as jnp

from ..graph import GraphTuple
from .segment import gather, segment_reduce

# kernel-mean dispatch threshold (see the mean branch in propagate)
_MEAN_KERNEL_MIN_EDGES = 500_000

__all__ = [
    "apply_edges",
    "aggregate_neighbors",
    "propagate",
    "to_src_space",
    "copy_xi",
    "copy_xj",
    "xi_dot_xj",
    "xi_sub_xj",
    "xj_sub_xi",
    "e_mul_xj",
    "w_mul_xj",
]


def _map_leaves(fn, x):
    """Apply fn to an array or to each value of a (nested-one-level) dict."""
    if x is None:
        return None
    if isinstance(x, Mapping):
        return {k: fn(v) for k, v in x.items()}
    return fn(x)


def to_src_space(g, v):
    """Convert a sender-side NODE array into the graph's sender index space.

    Identity for a plain :class:`GraphTuple`. For a mesh-sharded view
    (parallel.shardgraph.ShardGraph) this is the halo ``all_to_all`` that
    ships owned boundary rows into every consumer shard's buffer — the one
    cross-chip exchange per sender-side operand. Leaves already in src space
    (leading dim == ``g.src_pad``) pass through.
    """
    convert = getattr(g, "src_space", None)
    if convert is None or v is None:
        return v
    return _map_leaves(
        lambda a: convert(a) if a.shape[0] == g.n_pad else a, v)


def apply_edges(f: Callable, g: GraphTuple, xi=None, xj=None, e=None):
    """Gather endpoint features and apply ``f`` over edges.

    ``xi``/``xj`` are node arrays ([N_pad, ...]) or dicts thereof; ``e`` is an
    edge array ([E_pad, ...]) or dict. Returns whatever ``f`` returns,
    evaluated on edge-shaped inputs. Reference: GNNlib/src/msgpass.jl:115-129.

    When the graph carries SpMM grouping metadata, the gathers' *backward*
    pass (a scatter-add, slow in XLA on TPU) runs through the Pallas
    scatter-matmul kernel (ops/pallas/gather.py).
    """
    s, r = g.senders, g.receivers
    xj = to_src_space(g, xj)   # identity unless g is a mesh-sharded view
    if (f is xi_dot_xj and g.spmm_aux is not None and e is None
            and xi is not None and xj is not None
            and not isinstance(xi, Mapping) and not isinstance(xj, Mapping)
            and xi.ndim == 2 and xj.ndim == 2 and xi.shape[1] > 256
            and xi.shape[0] == g.n_pad and xj.shape[0] == g.n_pad):
        # SDDMM kernel: receiver rows ride the output block (no gather),
        # only the sender side pays a grouped gather (ops/pallas/sddmm.py).
        # The ungrouping gather is D-independent, so the kernel wins only at
        # wide features (measured crossover ~256 lanes on v5e at 2M edges);
        # below that the two plain endpoint gathers are faster.
        from .pallas.sddmm import sddmm
        return sddmm(xi, xj, g.spmm_aux, (g.e_pad,))[:, None]
    off = getattr(g, "senders_iota_offset", None)

    def take_iota(v):
        # device-sampled slot layout: senders[t] == off + t, so the sender
        # gather is a row SLICE (fwd and VJP both transaction-free); rows
        # past the real edges belong to padded edges, masked by consumers
        sl = v[off:off + g.e_pad]
        if sl.shape[0] < g.e_pad:
            sl = jnp.pad(sl, ((0, g.e_pad - sl.shape[0]),)
                         + ((0, 0),) * (v.ndim - 1))
        return sl

    if g.spmm_aux is not None:
        from .pallas.gather import fast_gather
        aux_fwd, aux_rev = g.spmm_aux

        def take_r(v):
            if v.ndim == 2 and v.shape[0] == g.n_pad:
                return fast_gather(v, r, aux_fwd, g.n_pad)
            return gather(v, r)

        def take_s(v):
            if off is not None and v.shape[0] == g.n_pad:
                return take_iota(v)
            if v.ndim == 2 and v.shape[0] == g.n_pad:
                return fast_gather(v, s, aux_rev, g.n_pad)
            return gather(v, s)

        xi_e = _map_leaves(take_r, xi)
        xj_e = _map_leaves(take_s, xj)
    else:
        def take_s_slow(v):
            if off is not None and v.shape[0] == g.n_pad:
                return take_iota(v)
            return gather(v, s)

        xi_e = _map_leaves(lambda v: gather(v, r), xi)
        xj_e = _map_leaves(take_s_slow, xj)
    return f(xi_e, xj_e, e)


def aggregate_neighbors(g: GraphTuple, aggr, m, *, num_segments=None):
    """Segment-reduce edge messages onto receiving nodes.

    Reference: GNNlib/src/msgpass.jl:145-156. ``m`` may be an array or a dict
    of arrays. Padded edges are masked out; ``mean`` divides by true degree.
    """
    if m is None:
        return None
    n = num_segments if num_segments is not None else g.n_pad
    mask = g.edge_mask

    def red(v):
        return segment_reduce(aggr, v, g.receivers, n, mask=mask,
                              sorted=g.sorted_by_receivers)
    return _map_leaves(red, m)


def propagate(f: Callable, g: GraphTuple, aggr, *, xi=None, xj=None, e=None):
    """``aggregate_neighbors(g, aggr, apply_edges(f, g, xi, xj, e))``.

    Reference: GNNlib/src/msgpass.jl:71-79, including the fused fast paths
    (msgpass.jl:210-238): ``propagate(copy_xj, g, +)`` and the weighted
    variants dispatch to the Pallas scatter-matmul SpMM kernel when the graph
    carries its grouping metadata (``graph(..., build_spmm_aux=True)``);
    otherwise they lower to a receiver-sorted gather + segment_sum that XLA
    fuses.
    """
    if (g.spmm_aux is not None and aggr == "mean"
            and g.e_pad >= _MEAN_KERNEL_MIN_EDGES
            and xj is not None and not isinstance(xj, Mapping)
            and xj.ndim == 2 and f in (copy_xj, w_mul_xj, e_mul_xj)
            and (e is None or getattr(e, "ndim", None) == 1)):
        # mean rides the same Pallas sum kernel: sum / true valid-edge
        # count (aggregate_neighbors' mean divides by segment SIZE, not
        # weight mass — GNNlib msgpass.jl:145-149 / NNlib scatter mean).
        # Without this, SAGEConv's mean fell back to the XLA gather path:
        # 42.4 -> ~9.8 ms fwd at 2M edges (ZOO_SWEEP_r5). Size-gated: at
        # minibatch scale (~170k edges, device-sampled SAGE) the extra
        # degree pass costs more than the kernel saves (12.5 -> 16.7
        # ms/batch measured), so small graphs keep the XLA path.
        y = propagate(f, g, "sum", xi=xi, xj=xj, e=e)
        from .segment import segment_sum as _ssum
        deg = _ssum(g.edge_mask.astype(y.dtype)[:, None], g.receivers,
                    g.n_pad)[:, 0]
        return y / jnp.maximum(deg, 1)[:, None]
    if (g.spmm_aux is not None and aggr in ("sum", "add", "+")
            and xj is not None and not isinstance(xj, Mapping)
            and xj.ndim == 2):
        if hasattr(g, "src_space"):
            # mesh-sharded view: halo exchange + local Pallas scatter-matmul
            # (the whole shard step = one all_to_all + one kernel)
            w = None
            ok = f is copy_xj and e is None
            if f is w_mul_xj and e is None:
                w, ok = g.edge_weight, True
            elif f in (w_mul_xj, e_mul_xj) and e is not None and e.ndim == 1:
                w, ok = e, True
            if ok:
                from .pallas.spmm import spmm_gather_scatter
                buf = g.src_space(xj)
                w_ext = None
                if w is not None:
                    w_ext = jnp.concatenate(
                        [jnp.where(g.edge_mask, w, 0).astype(buf.dtype),
                         jnp.zeros((1,), buf.dtype)])
                return spmm_gather_scatter(buf, w_ext, g.spmm_aux,
                                           (g.n_pad, buf.shape[0]))
        else:
            from .pallas.spmm import spmm
            if f is copy_xj:
                return spmm(g, xj)
            if f is w_mul_xj and e is None:
                if g.edge_weight is None:
                    return spmm(g, xj)
                return spmm(g, xj, weighted=True)
            if f in (w_mul_xj, e_mul_xj) and e is not None and e.ndim == 1:
                return spmm(g, xj, edge_weight=e, weighted=True)
    if f is w_mul_xj and e is None:
        # the reference's fused path reads the graph's stored weights
        # (msgpass.jl:223-238 via get_edge_weight); keep the generic
        # lowering consistent with it and with the Pallas dispatch above
        e = g.edge_weight
    m = apply_edges(f, g, xi=xi, xj=xj, e=e)
    return aggregate_neighbors(g, aggr, m)


# ---- built-in message vocabulary (GNNlib/src/msgpass.jl:159-208) -----------

def copy_xj(xi, xj, e):
    """m = xj (the neighbor/source feature)."""
    return xj


def copy_xi(xi, xj, e):
    """m = xi (the target feature)."""
    return xi


def xi_dot_xj(xi, xj, e):
    """Row-wise dot product over the feature axis -> [E, 1]."""
    return jnp.sum(xi * xj, axis=-1, keepdims=True)


def xi_sub_xj(xi, xj, e):
    return xi - xj


def xj_sub_xi(xi, xj, e):
    return xj - xi


def e_mul_xj(xi, xj, e):
    """Broadcast-multiply edge features against source features.

    Reference reshapes e to broadcast over xj's feature dims
    (msgpass.jl:189-195); here features are trailing so we unsqueeze e on the
    right when needed.
    """
    if e.ndim < xj.ndim:
        e = e.reshape(e.shape + (1,) * (xj.ndim - e.ndim))
    return e * xj


def w_mul_xj(xi, xj, w):
    """Scalar edge weights times source features (msgpass.jl:199-208)."""
    if w is None:
        return xj
    if w.ndim < xj.ndim:
        w = w.reshape(w.shape + (1,) * (xj.ndim - w.ndim))
    return w * xj
