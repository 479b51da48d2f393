"""Pallas TPU fused edge-softmax + aggregation (the attention hot path).

Reference semantics: ``softmax_edge_neighbors`` + weighted ``+`` aggregation
(GNNlib/src/utils.jl:84-97 and the GAT stack, SURVEY §3.2): per destination
node, softmax the incoming-edge logits and sum attention-weighted messages.

TPU-first decomposition over the same receiver-block grouping as the SpMM
kernel (ops/pallas/spmm.py):

1. ``segment_max_grouped`` — running-max accumulation per output row block
   (VPU ``where`` + row-max, revisiting output blocks like the SpMM kernel).
2. exp(logit - max) per edge (XLA elementwise on the tiny [E, H] array).
3. one weighted scatter-matmul whose values get a **ones column appended**:
   the denominator Z_n comes out as the extra feature column of the same
   kernel invocation — no separate segment-sum pass over the big value
   array.

Backward is analytic (dv_e = α_e dY_[r_e]; dl_e = α_e(<v_e, dY_{r_e}> -
<out_n, dY_n>)) and stays edge-parallel; a ``custom_vjp`` wires it up so jit
training works end to end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spmm import BN, SpmmAux, _scatter_grouped, _use_interpret

__all__ = ["segment_max_grouped", "edge_softmax_aggregate"]


def _segmax_kernel(block_rows_ref, recv_ref, lg_ref, out_ref):
    """Running per-row max of logits. lg_ref: [1, H, BE]; out: [BN, H]."""
    k = pl.program_id(0)
    b = block_rows_ref[k]
    prev = block_rows_ref[jnp.maximum(k - 1, 0)]
    is_first = jnp.logical_or(k == 0, b != prev)

    @pl.when(is_first)
    def _():
        out_ref[:] = jnp.full_like(out_ref, -jnp.inf)

    recv = recv_ref[0]                                   # [1, BE]
    rows = jax.lax.broadcasted_iota(jnp.int32,
                                    (out_ref.shape[0], recv.shape[1]), 0)
    hit = rows == recv                                   # [BN, BE]
    lg = lg_ref[0]                                       # [H, BE]
    h_dim = lg.shape[0]
    neg = jnp.asarray(-jnp.inf, out_ref.dtype)
    for h in range(h_dim):                               # H is small, static
        vals = jnp.where(hit, lg[h][None, :], neg)       # [BN, BE]
        out_ref[:, h] = jnp.maximum(out_ref[:, h], jnp.max(vals, axis=1))


def segment_max_grouped(logits: jax.Array, aux: SpmmAux, n_pad: int,
                        *, interpret: bool | None = None) -> jax.Array:
    """Per-receiver max of [E_pad(+1), H] logits -> [n_pad, H].

    ``logits`` must carry one trailing dummy row (index E_pad) holding -inf
    so grouped padding slots never win. Rows of nodes without in-edges come
    back as -inf (callers replace before exp).
    """
    if interpret is None:
        interpret = _use_interpret()
    n_eblk = aux.n_eblk
    be = aux.senders_grp.shape[1]
    h_dim = logits.shape[1]
    n_nblk = -(-n_pad // BN)
    lg_grp = logits[aux.edge_perm]                       # [n_eblk, BE, H]
    lg_grp = jnp.swapaxes(lg_grp, 1, 2)                  # [n_eblk, H, BE]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_eblk,),
        in_specs=[
            pl.BlockSpec((1, 1, be), lambda k, br: (k, 0, 0)),
            pl.BlockSpec((1, h_dim, be), lambda k, br: (k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((BN, h_dim), lambda k, br: (br[k], 0)),
    )
    out = pl.pallas_call(
        _segmax_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_nblk * BN, h_dim), logits.dtype),
        interpret=interpret,
    )(aux.block_rows, aux.recv_local[:, None, :], lg_grp)
    return out[:n_pad]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def edge_softmax_aggregate(logits, values, aux_receivers, static_args,
                           self_logits=None, self_values=None,
                           dropout_masks=None):
    """Fused softmax-over-in-edges + weighted aggregation.

    Args:
      logits: [E_pad, H] attention logits (padded edges may hold anything).
      values: [E_pad, H, D] messages.
      aux_receivers: (aux: SpmmAux, receivers: int32[E_pad],
        edge_mask: bool[E_pad]) — graph indexing (non-differentiable ints).
      static_args: (n_pad,) static.
      self_logits/self_values: optional [N, H] / [N, H, D] virtual self-loop.
      dropout_masks: optional (mask_e [E_pad, H], mask_self [N, H] or None) —
        attention-coefficient dropout scales (0 or 1/(1-p)), applied to the
        normalized alphas like the reference's `dropout(α)` (the softmax
        denominator is NOT dropped).

    Returns [N_pad, H, D].
    """
    out, _, _, _ = _fused_forward(logits, values, aux_receivers,
                                  static_args, self_logits, self_values,
                                  dropout_masks)
    return out


def _fused_forward(logits, values, aux_receivers, static_args, self_logits,
                   self_values, dropout_masks=None):
    aux, receivers, edge_mask = aux_receivers
    mask_e = mask_self = None
    if dropout_masks is not None:
        mask_e, mask_self = dropout_masks
    (n_pad,) = static_args
    e_pad, h_dim = logits.shape
    d = values.shape[-1]
    neg = jnp.asarray(-jnp.inf, logits.dtype)

    # mask padded edges in the logit domain, add dummy -inf row for grouping
    lg = jnp.where(edge_mask[:, None], logits, neg)
    lg_ext = jnp.concatenate([lg, jnp.full((1, h_dim), neg, lg.dtype)])
    mx = segment_max_grouped(lg_ext, aux, n_pad)          # [N, H]
    if self_logits is not None:
        mx = jnp.maximum(mx, self_logits)
    mx = jnp.where(jnp.isneginf(mx), 0.0, mx)

    ex = jnp.exp(lg - mx[receivers])                      # [E, H], 0 at pads
    ex = jnp.where(edge_mask[:, None], ex, 0.0)

    # weighted scatter with the ones-column trick for the denominator.
    # Dropout (if any) multiplies the VALUES, so the numerator sees
    # mask*ex*v while the ones column still accumulates plain ex.
    v_num = values if mask_e is None else values * mask_e[..., None]
    ones = jnp.ones(values.shape[:-1] + (1,), values.dtype)
    v_ext = jnp.concatenate([v_num, ones], -1)            # [E, H, D+1]
    num_den = _headwise_weighted_scatter(v_ext, ex, aux, n_pad)
    num = num_den[..., :d]                                # [N, H, D]
    den = num_den[..., d]                                 # [N, H]
    if self_logits is not None:
        ex_self = jnp.exp(self_logits - mx)               # [N, H]
        den = den + ex_self
        sv = (self_values if mask_self is None
              else self_values * mask_self[..., None])
        num = num + ex_self[..., None] * sv
    den = jnp.maximum(den, jnp.finfo(num.dtype).tiny)
    out = num / den[..., None]
    return out, mx, den, ex


def _headwise_weighted_scatter(v, w, aux: SpmmAux, n_pad: int):
    """Σ_e w[e,h] * v[e,h,:] per receiver: loops heads over the SpMM kernel.

    v: [E_pad, H, D']; w: [E_pad, H] -> [N, H, D'].
    """
    e_pad, h_dim, d = v.shape
    outs = []
    w_ext = jnp.concatenate([w, jnp.zeros((1, h_dim), w.dtype)])
    # values are edge-level: grouped slots index by edge_perm (dummy slots
    # carry id e_pad — clipped to a valid row, then killed by w_grp == 0 and
    # recv_local == -1).
    perm_clipped = jnp.minimum(aux.edge_perm, e_pad - 1)
    for h in range(h_dim):
        vals_grp = v[:, h, :][perm_clipped]
        w_grp = w_ext[:, h][aux.edge_perm]
        outs.append(_scatter_grouped(vals_grp, aux, n_pad, w_grp=w_grp,
                                     interpret=_use_interpret()))
    return jnp.stack(outs, axis=1)                        # [N, H, D']


def _fused_fwd(logits, values, aux_receivers, static_args, self_logits,
               self_values, dropout_masks=None):
    out, mx, den, ex = _fused_forward(logits, values, aux_receivers,
                                      static_args, self_logits, self_values,
                                      dropout_masks)
    res = (logits, values, aux_receivers, self_logits, self_values, out, mx,
           den, dropout_masks)
    return out, res


def _fused_bwd(static_args, res, dy):
    (logits, values, aux_receivers, self_logits, self_values, out, mx,
     den, dropout_masks) = res
    aux, receivers, edge_mask = aux_receivers
    mask_e = mask_self = None
    if dropout_masks is not None:
        mask_e, mask_self = dropout_masks
    alpha_e = jnp.where(
        edge_mask[:, None],
        jnp.exp(jnp.where(edge_mask[:, None], logits, -jnp.inf)
                - mx[receivers]) / den[receivers], 0.0)   # [E, H]
    m_alpha_e = alpha_e if mask_e is None else alpha_e * mask_e
    dy_e = dy[receivers]                                  # [E, H, D]
    dv = m_alpha_e[..., None] * dy_e
    # S_n = <out_n, dy_n> per head (out already includes dropout scaling)
    s_n = jnp.sum(out * dy, -1)                           # [N, H]
    dl = (m_alpha_e * jnp.sum(values * dy_e, -1)
          - alpha_e * s_n[receivers])
    if self_logits is not None:
        alpha_self = jnp.exp(self_logits - mx) / den      # [N, H]
        m_alpha_self = (alpha_self if mask_self is None
                        else alpha_self * mask_self)
        dsl = (m_alpha_self * jnp.sum(self_values * dy, -1)
               - alpha_self * s_n)
        dsv = m_alpha_self[..., None] * dy
    else:
        dsl = dsv = None
    return dl, dv, None, dsl, dsv, None


edge_softmax_aggregate.defvjp(_fused_fwd, _fused_bwd)
