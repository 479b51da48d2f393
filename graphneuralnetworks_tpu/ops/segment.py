"""Gather / segment-reduce primitives — the framework's kernel surface.

Reference parity: GNNGraphs/src/gatherscatter.jl:1-18 (`_gather`, `_scatter`
over NNlib) and the scatter semantics tested at GNNlib/test/msgpass.jl:21-26
(untouched destinations are zero for ``+``). On TPU the scatter becomes a
segment-reduce over receiver-sorted edges: XLA lowers sorted segment ops far
better than random scatter-add, and the Pallas SpMM kernel
(ops/pallas/spmm.py) replaces the hottest case entirely.

All functions are shape-static and mask-aware: padded edges/nodes are excluded
from the math (mean divides by the true segment size, max ignores padding).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = [
    "gather",
    "gather_1d",
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_min",
    "segment_prod",
    "segment_reduce",
    "segment_softmax",
    "AGGREGATIONS",
]


def gather(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Row-gather ``x[idx]`` (reference `_gather` = NNlib.gather).

    ``x``: [N, ...], ``idx``: int[E] -> [E, ...]. Under jit this is an XLA
    gather; indices are assumed in range (padded edges point at a dummy row).

    Width-1 rows are widened to 2 lanes first: XLA lowers 4-byte-row gathers
    to pathological per-element loads on TPU (~4x slower, measured on v5e at
    2M edges), while any row >= 8 bytes takes the vectorized DMA path.
    """
    if x.ndim == 1:
        w = jnp.broadcast_to(x[:, None], x.shape + (2,))
        return w.at[idx].get(mode="promise_in_bounds")[..., 0]
    if x.ndim == 2 and x.shape[1] == 1:
        w = jnp.broadcast_to(x, (x.shape[0], 2))
        return w.at[idx].get(mode="promise_in_bounds")[..., :1]
    return x.at[idx].get(mode="promise_in_bounds")


# The TPU gather engine's per-row rate cliffs ~2.5x once the TABLE exceeds
# ~131k rows (2.7 -> 6.6 ns/row measured at 2M indices on v5e; independent of
# row WIDTH up to 128 lanes — see benchmarks/GATHER_STUDY.md, round-4
# addendum). Edge-space scalar permutations (regroup w by edge_perm, ungroup
# dots by edge_slot) read from E-row tables and pay the slow rate; folding
# the table to [T/K, K] and selecting the lane with an in-register one-hot
# restores the fast rate (~13 -> ~7 ms at 2M edges).
_FOLD_K = 32
_FOLD_MIN_ROWS = 200_000


def gather_1d(flat: jax.Array, idx: jax.Array) -> jax.Array:
    """Scalar gather ``flat[idx]`` tuned for BIG (edge-space) tables.

    Identical semantics to :func:`gather` on 1-D ``flat``; use for
    regroup/ungroup permutations whose table is edge-sized. Indices are
    assumed in range (promise_in_bounds).
    """
    t = flat.shape[0]
    if t < _FOLD_MIN_ROWS:
        return gather(flat, idx)
    k = _FOLD_K
    tp = -(-t // k) * k
    tbl = jnp.pad(flat, (0, tp - t)).reshape(-1, k)
    rows = tbl.at[idx // k].get(mode="promise_in_bounds")
    oh = (idx % k)[..., None] == jnp.arange(k, dtype=jnp.int32)
    return jnp.sum(jnp.where(oh, rows, 0), axis=-1).astype(flat.dtype)


def _expand_mask(mask: jax.Array | None, data: jax.Array) -> jax.Array | None:
    if mask is None:
        return None
    return mask.reshape(mask.shape + (1,) * (data.ndim - 1))


def _widen1(data):
    """[E] -> [E, 2]: width-1 segment ops hit the same pathological
    per-element lowering as width-1 gathers (see :func:`gather`)."""
    if data.ndim == 1:
        return jnp.broadcast_to(data[:, None], data.shape + (2,)), True
    return data, False


def segment_sum(data, segment_ids, num_segments, *, mask=None, sorted=False):
    """Masked segment sum; empty segments get 0 (NNlib ``+`` semantics)."""
    m = _expand_mask(mask, data)
    if m is not None:
        data = jnp.where(m, data, 0)
    data, squeezed = _widen1(data)
    out = jax.ops.segment_sum(data, segment_ids, num_segments,
                              indices_are_sorted=sorted)
    return out[..., 0] if squeezed else out


def segment_mean(data, segment_ids, num_segments, *, mask=None, sorted=False):
    """Masked segment mean dividing by the *true* segment size.

    Empty segments return 0 (matches NNlib scatter-mean's 0/eps guard).
    """
    s = segment_sum(data, segment_ids, num_segments, mask=mask, sorted=sorted)
    ones = jnp.ones(data.shape[:1], dtype=s.dtype)
    cnt = segment_sum(ones, segment_ids, num_segments, mask=mask,
                      sorted=sorted)
    cnt = jnp.maximum(cnt, 1)
    return s / cnt.reshape(cnt.shape + (1,) * (s.ndim - 1))


def _segment_extreme(op_min: bool, data, segment_ids, num_segments, *,
                     mask=None, sorted=False, empty_value=0.0):
    fill = jnp.array(jnp.inf if op_min else -jnp.inf, dtype=data.dtype)
    m = _expand_mask(mask, data)
    if m is not None:
        data = jnp.where(m, data, fill)
    data, squeezed = _widen1(data)
    fn = jax.ops.segment_min if op_min else jax.ops.segment_max
    out = fn(data, segment_ids, num_segments, indices_are_sorted=sorted)
    if squeezed:
        out = out[..., 0]
    if empty_value is not None:
        # Untouched/fully-masked segments come back as +-inf; replace.
        bad = jnp.isinf(out) & (jnp.sign(out) == (1.0 if op_min else -1.0))
        out = jnp.where(bad, jnp.asarray(empty_value, out.dtype), out)
    return out


def segment_max(data, segment_ids, num_segments, *, mask=None, sorted=False,
                empty_value=0.0):
    return _segment_extreme(False, data, segment_ids, num_segments, mask=mask,
                            sorted=sorted, empty_value=empty_value)


def segment_min(data, segment_ids, num_segments, *, mask=None, sorted=False,
                empty_value=0.0):
    return _segment_extreme(True, data, segment_ids, num_segments, mask=mask,
                            sorted=sorted, empty_value=empty_value)


def segment_prod(data, segment_ids, num_segments, *, mask=None, sorted=False):
    m = _expand_mask(mask, data)
    if m is not None:
        data = jnp.where(m, data, 1)
    data, squeezed = _widen1(data)
    out = jax.ops.segment_prod(data, segment_ids, num_segments,
                               indices_are_sorted=sorted)
    return out[..., 0] if squeezed else out


AGGREGATIONS: dict[str, Callable] = {
    "sum": segment_sum,
    "add": segment_sum,
    "+": segment_sum,
    "mean": segment_mean,
    "max": segment_max,
    "min": segment_min,
    "prod": segment_prod,
    "*": segment_prod,
}


def segment_reduce(aggr, data, segment_ids, num_segments, *, mask=None,
                   sorted=False):
    """Dispatch on ``aggr`` in {sum, mean, max, min, prod} (+ aliases).

    Reference `_scatter(aggr, src, idx, n)` with aggr in (+, mean, max, min)
    (GNNlib/src/msgpass.jl:145-149).
    """
    if callable(aggr):
        aggr = getattr(aggr, "__name__", str(aggr))
    try:
        fn = AGGREGATIONS[str(aggr)]
    except KeyError:
        # NB: the builtin `sorted` is shadowed by the kwarg here.
        raise ValueError(f"unknown aggregation {aggr!r}; "
                         f"expected one of {list(AGGREGATIONS)}") from None
    return fn(data, segment_ids, num_segments, mask=mask, sorted=sorted)


def segment_softmax(data, segment_ids, num_segments, *, mask=None,
                    sorted=False):
    """Numerically-stable per-segment softmax over the leading axis.

    The core of attention layers — reference ``softmax_edge_neighbors``
    (GNNlib/src/utils.jl:84-97): scatter(max) -> gather -> exp -> scatter(+)
    -> gather -> normalize, with max-subtraction stability. Masked entries
    return 0.
    """
    mx = segment_max(data, segment_ids, num_segments, mask=mask, sorted=sorted,
                     empty_value=0.0)
    shifted = data - gather(mx, segment_ids)
    ex = jnp.exp(shifted)
    m = _expand_mask(mask, data)
    if m is not None:
        ex = jnp.where(m, ex, 0)
    denom = segment_sum(ex, segment_ids, num_segments, sorted=sorted)
    denom = jnp.maximum(denom, jnp.finfo(ex.dtype).tiny)
    return ex / gather(denom, segment_ids)
