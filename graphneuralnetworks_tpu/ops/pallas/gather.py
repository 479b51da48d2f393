"""Kernel-backed endpoint gather: XLA forward, scatter-matmul backward.

The transpose of a row-gather is a scatter-add — exactly the operation XLA
lowers poorly on TPU (SURVEY §7.3 "scatter performance"). Every layer's
backward pass hits it through ``apply_edges``'s ``x[senders]`` /
``x[receivers]`` gathers (pullback pair gather<->scatter, SURVEY §3.3).

``fast_gather`` keeps the forward as the plain XLA gather but routes the
backward through the Pallas scatter-matmul over the appropriate edge
grouping: edge-gradients grouped by **sender** (the reverse grouping) for
``x[senders]``, by **receiver** (the forward grouping) for ``x[receivers]``.
apply_edges engages it automatically when the graph carries ``spmm_aux``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .spmm import SpmmAux, _scatter_grouped, _use_interpret

__all__ = ["fast_gather"]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fast_gather(x, idx, aux, n_pad: int):
    """``x[idx]`` whose VJP is the Pallas scatter kernel.

    Args:
      x: [N_pad, D] node rows.
      idx: int32[E_pad] row per edge (senders or receivers).
      aux: SpmmAux grouping edges by ``idx`` (aux_rev for senders, aux_fwd
        for receivers).
      n_pad: static row count of ``x`` (the scatter target size).

    Contract: cotangents arriving on PADDED edge rows (>= num_edges) are
    dropped — padded-edge outputs are garbage by definition and every
    aggregation in this framework masks them. (The plain XLA gather would
    instead accumulate them onto the dummy node row.)
    """
    return x[idx]


def _fg_fwd(x, idx, aux, n_pad):
    return x[idx], aux


def _fg_bwd(n_pad, aux: SpmmAux, dy):
    # dy: [E_pad, D] edge-gradients in original edge order; dummy grouped
    # slots carry id E_pad -> the appended zero row.
    from ..segment import gather as _gather
    zero = jnp.zeros((1,) + dy.shape[1:], dy.dtype)
    dy_ext = jnp.concatenate([dy, zero])
    vals_grp = _gather(dy_ext, aux.edge_perm)         # [n_eblk, BE, D]
    dx = _scatter_grouped(vals_grp, aux, n_pad,
                          interpret=_use_interpret())
    return dx, None, None


fast_gather.defvjp(_fg_fwd, _fg_bwd)
