"""Pallas TPU fused edge-softmax + aggregation (the attention hot path).

Reference semantics: ``softmax_edge_neighbors`` + weighted ``+`` aggregation
(GNNlib/src/utils.jl:84-97 and the GAT stack, SURVEY §3.2): per destination
node, softmax the incoming-edge logits and sum attention-weighted messages.

TPU-first design over the same receiver-block grouping as the SpMM kernel
(ops/pallas/spmm.py): a SINGLE flash-attention-style pass (``_flash_kernel``)
keeps a running per-row max m, denominator s, and numerator Y in VMEM while
streaming edge blocks; each step rescales the accumulators by
exp(m_old - m_new) and adds ``(one_hot * exp(lg - m_new)) @ V`` on the MXU.
m and s come out as tiny per-node arrays so virtual self-loop terms fold in
afterwards, overflow-safe (``_finalize_softmax``).

Two entry points share the kernel: :func:`edge_softmax_aggregate` for
edge-level values and :func:`edge_softmax_aggregate_nodes` for NODE-level
values (the GAT-family fast path — the sender-gather fuses into the kernel's
grouped input, never materializing [E, H, D]).

Backward is analytic (dv_e = α_e dY_[r_e]; dl_e = α_e(<v_e, dY_{r_e}> -
<out_n, dY_n>)) and stays edge-parallel; a ``custom_vjp`` wires it up so jit
training works end to end. ``segment_max_grouped`` (a standalone running-max
kernel over the same grouping) remains exported for segment-max uses.

TPU numerics note: in-kernel dots run at the MXU's DEFAULT precision
(bf16-truncated inputs, f32 accumulation) — the same default every jnp
matmul in a user model gets. Fused-path gradients therefore differ from the
XLA fallback (which reduces on the VPU in full f32) by up to ~1e-2 relative
on worst entries at D=64-128 — training-grade, and 3x cheaper than
Precision.HIGHEST. The CPU interpret path is exact f32 and is what the
oracle tests pin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..segment import gather, gather_1d
from .spmm import BN, SpmmAux, _scatter_grouped, _use_interpret

__all__ = ["segment_max_grouped", "edge_softmax_aggregate",
           "edge_softmax_aggregate_nodes", "dot_attention_nodes",
           "gat_attention_nodes", "gatv2_attention_nodes"]


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
    lg_grp = gather(logits, aux.edge_perm)               # [n_eblk, BE, H]
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
    out, _, _ = _fused_forward(logits, values, aux_receivers,
                               static_args, self_logits, self_values,
                               dropout_masks)
    return out


def _fused_forward(logits, values, aux_receivers, static_args, self_logits,
                   self_values, dropout_masks=None):
    aux, receivers, edge_mask = aux_receivers
    mask_e = mask_self = None
    if dropout_masks is not None:
        mask_e, mask_self = dropout_masks
    n_pad = static_args[0]
    e_pad, h_dim = logits.shape
    logits = logits.astype(jnp.float32)     # f32 softmax state (see
    neg = jnp.asarray(-jnp.inf, logits.dtype)   # _dot_forward note)

    # mask padded edges in the logit domain, add dummy -inf row for grouping
    lg = jnp.where(edge_mask[:, None], logits, neg)
    lg_ext = jnp.concatenate([lg, jnp.full((1, h_dim), neg, lg.dtype)])
    if mask_e is not None:
        msk_ext = jnp.concatenate(
            [mask_e, jnp.zeros((1, h_dim), mask_e.dtype)])
    # edge-level values: grouped slots index by edge_perm (dummy slots carry
    # id e_pad — clipped to a valid row, then killed by the -inf logit).
    perm_clipped = jnp.minimum(aux.edge_perm, e_pad - 1)
    ys, ms, ss = [], [], []
    for h in range(h_dim):
        lg_grp = gather_1d(lg_ext[:, h], aux.edge_perm)
        msk_grp = (gather_1d(msk_ext[:, h], aux.edge_perm)
                   if mask_e is not None else jnp.ones_like(lg_grp))
        v_grp = gather(values[:, h, :], perm_clipped)
        y, m, s = _flash_grouped(v_grp, lg_grp, msk_grp, aux, n_pad)
        ys.append(y)
        ms.append(m)
        ss.append(s)
    num = jnp.stack(ys, axis=1)
    m = jnp.stack(ms, axis=1)
    den = jnp.stack(ss, axis=1)
    return _finalize_softmax(num, m, den, self_logits, self_values,
                             mask_self)


def _fused_fwd(logits, values, aux_receivers, static_args, self_logits,
               self_values, dropout_masks=None):
    out, mx, den = _fused_forward(logits, values, aux_receivers,
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
                - gather(mx, receivers)) / gather(den, receivers),
        0.0)                                              # [E, H]
    m_alpha_e = alpha_e if mask_e is None else alpha_e * mask_e
    dy_e = gather(dy, receivers)                          # [E, H, D]
    dv = m_alpha_e[..., None] * dy_e
    # S_n = <out_n, dy_n> per head (out already includes dropout scaling)
    s_n = jnp.sum(out * dy, -1)                           # [N, H]
    dl = (m_alpha_e * jnp.sum(values * dy_e, -1)
          - alpha_e * gather(s_n, receivers))
    if self_logits is not None:
        alpha_self = jnp.exp(self_logits - mx) / den      # [N, H]
        m_alpha_self = (alpha_self if mask_self is None
                        else alpha_self * mask_self)
        dsl = (m_alpha_self * jnp.sum(self_values * dy, -1)
               - alpha_self * s_n).astype(self_logits.dtype)
        dsv = (m_alpha_self[..., None] * dy).astype(self_values.dtype)
    else:
        dsl = dsv = None
    # primal-dtype cotangents (see _gatv2_bwd note)
    return (dl.astype(logits.dtype), dv.astype(values.dtype), None,
            dsl, dsv, None)


edge_softmax_aggregate.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# single-pass flash-softmax scatter (running max/sum/numerator in VMEM)
# ---------------------------------------------------------------------------
#
# The two-pass decomposition (segment-max kernel, then exp, then weighted
# scatter with a ones column for the denominator) costs three sweeps over
# edge-sized arrays plus a lane-misaligned D+1 matmul. This kernel does the
# whole softmax-aggregate in ONE sweep, flash-attention style: per edge
# block it updates a running per-row max m, rescales the running numerator
# Y and denominator s by exp(m_old - m_new), and accumulates
# (one_hot * exp(lg - m_new)) @ V on the MXU. m and s come out as tiny
# per-node outputs so self-loop terms can be folded in outside.


def _flash_reset(y_ref, m_ref, s_ref, is_first):
    @pl.when(is_first)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        s_ref[:] = jnp.zeros_like(s_ref)



def _slot_extract(hit, full, fill):
    """[BN, BE] one-hot-masked values -> [1, BE] per-slot (the hit row's).

    Each slot has at most one hit row, so a masked max extracts it; dead
    slots read ``fill``. Used to shrink softmax transcendentals from
    [BN, BE] to [1, BE]: `exp`/`div` are the dominant VPU cost of the
    broadcast-form kernels (r5 — the flash kernel alone measured 9.1 ms at
    2M edges with [BN, BE] exps), while adds/selects/maxes are ~1-cycle.
    """
    return jnp.max(jnp.where(hit, full, fill), axis=0, keepdims=True)


def _flash_update(hit, lg, msk, v, y_ref, m_ref, s_ref):
    """Online-softmax accumulator update for one edge block.

    hit: [BN, BE] one-hot receiver mask; lg: [1, BE] logits (-inf at dummy
    slots); msk: [1, BE] or None numerator-only scaling (attention dropout);
    v: [BE, D] value rows for this block.
    """
    neg = jnp.asarray(-jnp.inf, lg.dtype)
    lg_hit = jnp.where(hit, lg, neg)                      # [BN, BE]
    m_old = m_ref[:, 0]                                   # [BN]
    m_new = jnp.maximum(m_old, jnp.max(lg_hit, axis=1))
    # rescale factor for the running accumulators; rows still at -inf keep 1
    scale = jnp.where(m_new == neg, 1.0, jnp.exp(m_old - m_new))
    # per-slot p = exp(lg - m_new[recv]); dummy slots (recv==-1, no hit) die
    m_e = jnp.max(jnp.where(hit, m_new[:, None], neg), axis=0,
                  keepdims=True)                          # [1, BE]
    p = jnp.where(m_e == neg, 0.0, jnp.exp(lg - m_e))     # [1, BE]
    s_ref[:, 0] = s_ref[:, 0] * scale + jnp.sum(
        jnp.where(hit, p, 0.0), axis=1)
    m_ref[:, 0] = m_new
    # numerator: attention-dropout mask scales values but not the denominator
    pw = p if msk is None else p * msk
    one_hot_w = jnp.where(hit, pw, 0.0).astype(v.dtype)
    y_ref[:] = y_ref[:] * scale[:, None].astype(y_ref.dtype) + jax.lax.dot(
        one_hot_w, v, preferred_element_type=jnp.float32
    ).astype(y_ref.dtype)


def _flash_kernel(block_rows_ref, recv_ref, lg_ref, msk_ref, v_ref,
                  y_ref, m_ref, s_ref):
    k = pl.program_id(1)
    b = block_rows_ref[k]
    prev = block_rows_ref[jnp.maximum(k - 1, 0)]
    _flash_reset(y_ref, m_ref, s_ref,
                 jnp.logical_or(k == 0, b != prev))
    recv = recv_ref[0]                                    # [1, BE]
    rows = jax.lax.broadcasted_iota(jnp.int32,
                                    (y_ref.shape[0], recv.shape[1]), 0)
    _flash_update(rows == recv, lg_ref[0], msk_ref[0], v_ref[:], y_ref,
                  m_ref, s_ref)


def _flash_dot_kernel(block_rows_ref, recv_ref, q_ref, k_ref, v_ref,
                      y_ref, m_ref, s_ref, *, scale: float,
                      slope: float | None):
    """Flash update with DOT-PRODUCT logits computed IN-kernel.

    ``lg = scale * <q[recv], k[sender]>``, optionally through
    ``leaky_relu(·, slope)``. The logit matrix for every (row, slot) pair
    is ONE MXU dot_general contracting the feature lanes — q rides the
    output row block (no gather at all), k and v ride two separate 1-chunk
    grouped gathers (two narrow gathers beat one [K|V] 2-chunk gather on
    the descriptor engine, GATHER_STUDY.md). The online-softmax state stays
    [BN, BE]-shaped; no slot-distribute matmuls. No edge-space logit array
    ever exists.
    """
    kidx = pl.program_id(1)
    b = block_rows_ref[kidx]
    prev = block_rows_ref[jnp.maximum(kidx - 1, 0)]
    _flash_reset(y_ref, m_ref, s_ref,
                 jnp.logical_or(kidx == 0, b != prev))
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    recv = recv_ref[0]                                    # [1, BE]
    rows = jax.lax.broadcasted_iota(jnp.int32,
                                    (y_ref.shape[0], recv.shape[1]), 0)
    hit = rows == recv                                    # [BN, BE]
    raw = jax.lax.dot_general(
        q_ref[:].astype(jnp.float32), k_ref[:].astype(jnp.float32),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale       # [BN, BE]
    if slope is not None:
        raw = jnp.where(raw >= 0, raw, slope * raw)
    lg_hit = jnp.where(hit, raw, neg)
    m_old = m_ref[0, :, 0]
    m_new = jnp.maximum(m_old, jnp.max(lg_hit, axis=1))
    scale_f = jnp.where(m_new == neg, 1.0, jnp.exp(m_old - m_new))
    m_fin = jnp.where(m_new == neg, 0.0, m_new)
    lg_slot = jnp.max(lg_hit, axis=0, keepdims=True)      # [1, BE]
    m_slot = _slot_extract(hit, m_fin[:, None], neg)
    p_slot = jnp.where(lg_slot == neg, 0.0, jnp.exp(lg_slot - m_slot))
    p = jnp.where(hit, p_slot, 0.0)
    s_ref[0, :, 0] = s_ref[0, :, 0] * scale_f + jnp.sum(p, axis=1)
    m_ref[0, :, 0] = m_new
    y_ref[:] = (y_ref[:] * scale_f[:, None].astype(y_ref.dtype)
                + jax.lax.dot(p.astype(v_ref.dtype), v_ref[:],
                              preferred_element_type=jnp.float32)
                .astype(y_ref.dtype))


def _flash_dot_grouped(q_flat, k_flat, v_flat, aux: SpmmAux, n_pad: int,
                       scale: float, h_dim: int, bo: int, bd: int,
                       slope: float | None = None,
                       *, interpret: bool | None = None):
    """Fused dot-logit flash pass over all heads (two 1-chunk gathers).

    q_flat: [n_nblk*BN, H*bo] receiver projections (row+lane padded);
    k_flat/v_flat: [n_eblk*BE, H*bo] / [n_eblk*BE, H*bd] grouped sender
    slots per head. Returns (Y [n_pad_rows, H*bd], m [rows, H],
    s [rows, H]) — caller slices/reshapes.
    """
    if interpret is None:
        interpret = _use_interpret()
    n_eblk = aux.n_eblk
    be = aux.senders_grp.shape[1]
    n_nblk = -(-n_pad // BN)
    if q_flat.shape[0] != n_nblk * BN:
        q_flat = jnp.pad(q_flat,
                         ((0, n_nblk * BN - q_flat.shape[0]), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(h_dim, n_eblk),
        in_specs=[
            pl.BlockSpec((1, 1, be), lambda j, k, br: (k, 0, 0)),
            pl.BlockSpec((BN, bo), lambda j, k, br: (br[k], j)),
            pl.BlockSpec((be, bo), lambda j, k, br: (k, j)),
            pl.BlockSpec((be, bd), lambda j, k, br: (k, j)),
        ],
        out_specs=[
            pl.BlockSpec((BN, bd), lambda j, k, br: (br[k], j)),
            # per-head running max/denominator as [H, rows, 1] so the
            # trailing block dim equals the array dim (TPU tiling rule for
            # sub-128-lane blocks)
            pl.BlockSpec((1, BN, 1), lambda j, k, br: (j, br[k], 0)),
            pl.BlockSpec((1, BN, 1), lambda j, k, br: (j, br[k], 0)),
        ],
    )
    y, m, s = pl.pallas_call(
        functools.partial(_flash_dot_kernel, scale=scale, slope=slope),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_nblk * BN, h_dim * bd), v_flat.dtype),
            jax.ShapeDtypeStruct((h_dim, n_nblk * BN, 1), jnp.float32),
            jax.ShapeDtypeStruct((h_dim, n_nblk * BN, 1), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * h_dim * n_eblk * be * BN * (bd + bo),
            bytes_accessed=h_dim * (n_eblk * be * (bd + bo)
                                    + n_nblk * BN * (bd + bo))
            * v_flat.dtype.itemsize,
            transcendentals=h_dim * n_eblk * be,
        ),
    )(aux.block_rows, aux.recv_local[:, None, :], q_flat, k_flat, v_flat)
    m = jnp.swapaxes(m[..., 0], 0, 1)                     # [rows, H]
    s = jnp.swapaxes(s[..., 0], 0, 1)
    return y[:n_pad], m[:n_pad], s[:n_pad]


def _flash_grouped(values_grp: jax.Array, lg_grp: jax.Array,
                   msk_grp: jax.Array, aux: SpmmAux, n_pad: int,
                   *, interpret: bool | None = None):
    """One-pass softmax-aggregate of grouped edge slots.

    values_grp: [n_eblk, BE, D]; lg_grp/msk_grp: [n_eblk, BE].
    Returns (Y [n_pad, D] unnormalized numerator, m [n_pad] running max,
    s [n_pad] denominator sans self terms).
    """
    if interpret is None:
        interpret = _use_interpret()
    n_eblk, be, d = values_grp.shape
    n_nblk = -(-n_pad // BN)
    from .spmm import BD
    bd = min(max(d, 128), BD)
    d_padded = -(-d // bd) * bd
    if d_padded != d:
        values_grp = jnp.pad(values_grp,
                             ((0, 0), (0, 0), (0, d_padded - d)))
    n_dblk = d_padded // bd
    vflat = values_grp.reshape(n_eblk * be, d_padded)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_dblk, n_eblk),
        in_specs=[
            pl.BlockSpec((1, 1, be), lambda j, k, br: (k, 0, 0)),
            pl.BlockSpec((1, 1, be), lambda j, k, br: (k, 0, 0)),
            pl.BlockSpec((1, 1, be), lambda j, k, br: (k, 0, 0)),
            pl.BlockSpec((be, bd), lambda j, k, br: (k, j)),
        ],
        out_specs=[
            pl.BlockSpec((BN, bd), lambda j, k, br: (br[k], j)),
            pl.BlockSpec((BN, 1), lambda j, k, br: (br[k], 0)),
            pl.BlockSpec((BN, 1), lambda j, k, br: (br[k], 0)),
        ],
    )
    y, m, s = pl.pallas_call(
        _flash_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_nblk * BN, d_padded), values_grp.dtype),
            jax.ShapeDtypeStruct((n_nblk * BN, 1), lg_grp.dtype),
            jax.ShapeDtypeStruct((n_nblk * BN, 1), lg_grp.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_eblk * be * BN * d_padded,
            bytes_accessed=(n_eblk * be * d_padded
                            + n_nblk * BN * d_padded)
            * values_grp.dtype.itemsize,
            transcendentals=n_eblk * be,
        ),
    )(aux.block_rows, aux.recv_local[:, None, :], lg_grp[:, None, :],
      msk_grp[:, None, :], vflat)
    return y[:n_pad, :d], m[:n_pad, 0], s[:n_pad, 0]


# ---------------------------------------------------------------------------
# fused dot-product attention (transformer/AGNN-style logits in-kernel)
# ---------------------------------------------------------------------------


def _lane_pad(x, width):
    if x.shape[-1] == width:
        return x
    return jnp.pad(x,
                   ((0, 0),) * (x.ndim - 1) + ((0, width - x.shape[-1]),))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def dot_attention_nodes(q, k, values_n, auxes, ids, static_args,
                        self_logits=None, self_values=None):
    """Dot-product attention with logits ``scale * <q[r], k[s]>`` fully
    in-kernel: ZERO edge-space arrays anywhere in the forward. K and V ride
    ONE fused grouped gather across all heads (the sender gather is
    transaction-count-bound, so fewer/wider gathers win). The UniMP
    transformer / AGNN hot path.

    Args:
      q: [N_dst, H, O] receiver-side projections (queries).
      k: [N_src, H, O] sender-side projections (keys).
      values_n: [N_src, H, D] sender-side node values.
      auxes: (aux_fwd, aux_rev); ids: (receivers, senders, edge_mask).
      static_args: (n_dst_pad, n_src_pad, scale, slope) — slope=None for
        plain dots, a float applies ``leaky_relu(·, slope)`` to the scaled
        dot (the GAT-family affine path via rank-2 q/k).
      self_logits/self_values: optional virtual self-loop terms
        ([N, H] / [N, H, D]; note self logits are NOT scaled here — pass
        them pre-scaled/pre-activated).

    Returns [N_dst_pad, H, D].
    """
    out, _, _ = _dot_forward(q, k, values_n, auxes, ids, static_args,
                             self_logits, self_values)
    return out


def _dot_forward(q, k, values_n, auxes, ids, static_args, self_logits,
                 self_values, return_kv_grp: bool = False):
    from .spmm import BD
    aux, _ = auxes
    n_pad, _, scale, slope = static_args
    _, h_dim, o = q.shape
    d = values_n.shape[2]
    bo = min(max(o, 128), BD)
    bd = min(max(d, 128), BD)
    if o > bo or d > bd:
        raise ValueError("fused dot attention requires O, D <= BD")
    # two separate 1-chunk sender gathers: cheaper than one 2-chunk [K|V]
    # row on the descriptor-rate-bound gather engine (GATHER_STUDY.md)
    k_flat = _lane_pad(k, bo).reshape(k.shape[0], h_dim * bo)
    v_flat = _lane_pad(values_n, bd).reshape(values_n.shape[0], h_dim * bd)
    k_grp = gather(k_flat, aux.senders_grp).reshape(-1, h_dim * bo)
    v_grp = gather(v_flat, aux.senders_grp).reshape(-1, h_dim * bd)
    # softmax state (logits/max/denominator) stays f32 regardless of the
    # value dtype: numerically right for bf16 values, and Mosaic lacks some
    # bf16 lane ops the running-max update needs (only K/V ride bf16)
    q_flat = (_lane_pad(q, bo).reshape(q.shape[0], h_dim * bo)
              .astype(jnp.float32))
    y, m, s = _flash_dot_grouped(
        q_flat, k_grp, v_grp, aux, n_pad,
        float(scale), h_dim, bo, bd, slope)
    num = y.reshape(-1, h_dim, bd)[:, :, :d]              # [N, H, D]
    out3 = _finalize_softmax(num, m, s, self_logits, self_values, None)
    if return_kv_grp:
        return out3 + (k_grp, v_grp)
    return out3


def _dot_fwd(q, k, values_n, auxes, ids, static_args, self_logits,
             self_values):
    out, mx, den, k_grp, v_grp = _dot_forward(q, k, values_n, auxes, ids,
                                              static_args, self_logits,
                                              self_values,
                                              return_kv_grp=True)
    # k_grp/v_grp (the grouped sender rows) are the forward's expensive
    # gathers (descriptor-rate bound, GATHER_STUDY.md); keeping them as
    # residuals lets the dq backward kernel run with ZERO gathers.
    res = (q, k, values_n, auxes, ids, self_logits, self_values, out, mx,
           den, k_grp, v_grp)
    return out, res


def _dot_bwd_dq_kernel(block_rows_ref, recv_ref, q_ref, scal_ref, dy_ref,
                       k_ref, v_ref, dq_ref, *, scale: float,
                       slope: float | None):
    """dq over the FORWARD grouping with ZERO gathers.

    Receiver operands (q, dy, mx/den/s_n) ride the output row block; the
    sender side is the forward's saved k_grp/v_grp residuals. The per-pair
    logit and <v, dy> matrices are MXU dot_generals contracting the
    feature lanes ([BN, BE]-shaped state, no slot-distribute matmuls).
    Accumulates ``dq[r] += dlg_e k[s_e]``.
    """
    kidx = pl.program_id(1)
    b = block_rows_ref[kidx]
    prev = block_rows_ref[jnp.maximum(kidx - 1, 0)]

    @pl.when(jnp.logical_or(kidx == 0, b != prev))
    def _():
        dq_ref[:] = jnp.zeros_like(dq_ref)

    recv = recv_ref[0]                                    # [1, BE]
    bn = dq_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bn, recv.shape[1]), 0)
    hit = rows == recv                                    # [BN, BE]
    kg = k_ref[:].astype(jnp.float32)                     # [BE, bo]
    raw = jax.lax.dot_general(
        q_ref[:], kg, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale       # [BN, BE]
    if slope is None:
        lg, dsig = raw, scale
    else:
        lg = jnp.where(raw >= 0, raw, slope * raw)
        dsig = jnp.where(raw >= 0, 1.0, slope) * scale
    scal = scal_ref[0]                                    # [BN, 8]
    mx_r = scal[:, 0][:, None]
    den_r = jnp.maximum(scal[:, 1], 1e-38)[:, None]
    sn_r = scal[:, 2][:, None]
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    lg_slot = _slot_extract(hit, lg, neg)                 # [1, BE]
    mx_slot = _slot_extract(hit, jnp.broadcast_to(mx_r, lg.shape), neg)
    den_slot = jnp.maximum(
        _slot_extract(hit, jnp.broadcast_to(den_r, lg.shape), 0.0), 1e-38)
    alpha_slot = jnp.where(lg_slot == neg, 0.0,
                           jnp.exp(lg_slot - mx_slot) / den_slot)
    alpha = jnp.where(hit, alpha_slot, 0.0)
    vdots = jax.lax.dot_general(
        dy_ref[:], v_ref[:].astype(jnp.float32),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # [BN, BE]
    dlg = alpha * (vdots - sn_r) * dsig
    dq_ref[:] += jax.lax.dot(dlg, kg,
                             preferred_element_type=jnp.float32)


def _dot_bwd_dkv_kernel(block_rows_ref, recv_ref, kv_ref, q_ref, dy_ref,
                        scal_ref, dk_ref, dv_ref, *, scale: float, bo: int,
                        bd: int, slope: float | None):
    """dk and dv over the REVERSE grouping with three 1-chunk gathers.

    The sender side (k, v) rides the output row block; the receiver side
    arrives as gathered per-slot rows: q, dy, and a packed
    ``[mx | den | s_n]`` scalar row. [BN, BE]-shaped state as in the dq
    kernel. Accumulates ``dv[s] += alpha_e dy[r_e]`` and
    ``dk[s] += dlg_e q[r_e]``.
    """
    kidx = pl.program_id(1)
    b = block_rows_ref[kidx]
    prev = block_rows_ref[jnp.maximum(kidx - 1, 0)]

    @pl.when(jnp.logical_or(kidx == 0, b != prev))
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    recv = recv_ref[0]                                    # [1, BE]
    bn = dk_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bn, recv.shape[1]), 0)
    hit = rows == recv
    kv_blk = kv_ref[:].astype(jnp.float32)                # [BN, bo+bd]
    q_g = q_ref[:]                                        # [BE, bo]
    dy_g = dy_ref[:]                                      # [BE, bd]
    scal = scal_ref[0]                                    # [BE, 8]
    mx_g = scal[:, 0][None, :]
    den_g = jnp.maximum(scal[:, 1], 1e-38)[None, :]
    sn_g = scal[:, 2][None, :]
    raw = jax.lax.dot_general(
        kv_blk[:, :bo], q_g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale       # [BN, BE]
    if slope is None:
        lg, dsig = raw, scale
    else:
        lg = jnp.where(raw >= 0, raw, slope * raw)
        dsig = jnp.where(raw >= 0, 1.0, slope) * scale
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    lg_slot = _slot_extract(hit, lg, neg)                 # [1, BE]
    alpha_slot = jnp.where(lg_slot == neg, 0.0,
                           jnp.exp(lg_slot - mx_g) / den_g)
    alpha = jnp.where(hit, alpha_slot, 0.0)
    dv_ref[:] += jax.lax.dot(alpha, dy_g,
                             preferred_element_type=jnp.float32)
    vdots = jax.lax.dot_general(
        kv_blk[:, bo:], dy_g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # [BN, BE]
    dlg = alpha * (vdots - sn_g) * dsig
    dk_ref[:] += jax.lax.dot(dlg, q_g,
                             preferred_element_type=jnp.float32)


def _round128(x: int) -> int:
    return -(-x // 128) * 128


def _dot_bwd(static_args, res, dy):
    (q, k, values_n, auxes, ids, self_logits, self_values, out, mx,
     den, k_grp, v_grp) = res
    aux, aux_rev = auxes
    receivers, senders, edge_mask = ids
    n_pad, n_src_pad, scale, slope = static_args
    from .spmm import BD
    _, h_dim, o = q.shape
    d = values_n.shape[2]
    bo = min(max(o, 128), BD)
    bd = min(max(d, 128), BD)
    be = aux.senders_grp.shape[1]
    interpret = _use_interpret()
    scale = float(scale)

    s_n = jnp.sum(out * dy, -1).astype(jnp.float32)       # [N_dst, H]
    dy32 = dy.astype(jnp.float32)
    q32 = q.astype(jnp.float32)
    scal = jnp.stack([mx.astype(jnp.float32), den.astype(jnp.float32),
                      s_n], axis=-1)                      # [N_dst, H, 3]
    scal = jnp.pad(scal, ((0, 0), (0, 0), (0, 5)))        # [N_dst, H, 8]

    n_nblk_dst = -(-n_pad // BN)
    rows_dst = n_nblk_dst * BN

    def _rowpad(x, rows=None):
        rows = rows_dst if rows is None else rows
        if x.shape[0] < rows:
            return jnp.pad(x, ((0, rows - x.shape[0]),)
                           + ((0, 0),) * (x.ndim - 1))
        return x

    q_flat = _rowpad(_lane_pad(q32, bo).reshape(-1, h_dim * bo))
    dy_flat = _rowpad(_lane_pad(dy32, bd).reshape(-1, h_dim * bd))
    scal_h = _rowpad(scal).transpose(1, 0, 2)             # [H, rows, 8]

    # ---- dq: forward grouping, zero gathers (k_grp/v_grp residuals) ----
    n_eblk = aux.n_eblk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(h_dim, n_eblk),
        in_specs=[
            pl.BlockSpec((1, 1, be), lambda j, kk, br: (kk, 0, 0)),
            pl.BlockSpec((BN, bo), lambda j, kk, br: (br[kk], j)),
            pl.BlockSpec((1, BN, 8), lambda j, kk, br: (j, br[kk], 0)),
            pl.BlockSpec((BN, bd), lambda j, kk, br: (br[kk], j)),
            pl.BlockSpec((be, bo), lambda j, kk, br: (kk, j)),
            pl.BlockSpec((be, bd), lambda j, kk, br: (kk, j)),
        ],
        out_specs=pl.BlockSpec((BN, bo), lambda j, kk, br: (br[kk], j)),
    )
    dq = pl.pallas_call(
        functools.partial(_dot_bwd_dq_kernel, scale=scale, slope=slope),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_dst, h_dim * bo), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * h_dim * n_eblk * be * BN * (bo + bd),
            bytes_accessed=h_dim * n_eblk * be * (bo + bd) * 4,
            transcendentals=h_dim * n_eblk * be,
        ),
    )(aux.block_rows, aux.recv_local[:, None, :], q_flat, scal_h, dy_flat,
      k_grp, v_grp)
    dq = dq[:n_pad].reshape(-1, h_dim, bo)[:, :, :o]

    # ---- dk, dv: reverse grouping, three 1-chunk gathers ----
    q_rg = gather(q_flat[:n_pad], aux_rev.senders_grp) \
        .reshape(-1, h_dim * bo)
    dy_rg = gather(dy_flat[:n_pad], aux_rev.senders_grp) \
        .reshape(-1, h_dim * bd)
    # [H, slots, 8] so the per-head block's trailing dim equals the array's
    scal_rg = (gather(scal.reshape(-1, h_dim * 8), aux_rev.senders_grp)
               .reshape(-1, h_dim, 8).transpose(1, 0, 2))

    n_nblk_src = -(-n_src_pad // BN)
    rows_src = n_nblk_src * BN
    kv_node = _rowpad(
        jnp.concatenate([_lane_pad(k, bo), _lane_pad(values_n, bd)],
                        axis=-1).reshape(-1, h_dim * (bo + bd)), rows_src)
    n_eblk_r = aux_rev.n_eblk
    grid_spec_r = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(h_dim, n_eblk_r),
        in_specs=[
            pl.BlockSpec((1, 1, be), lambda j, kk, br: (kk, 0, 0)),
            pl.BlockSpec((BN, bo + bd), lambda j, kk, br: (br[kk], j)),
            pl.BlockSpec((be, bo), lambda j, kk, br: (kk, j)),
            pl.BlockSpec((be, bd), lambda j, kk, br: (kk, j)),
            pl.BlockSpec((1, be, 8), lambda j, kk, br: (j, kk, 0)),
        ],
        out_specs=[
            pl.BlockSpec((BN, bo), lambda j, kk, br: (br[kk], j)),
            pl.BlockSpec((BN, bd), lambda j, kk, br: (br[kk], j)),
        ],
    )
    dk, dv_n = pl.pallas_call(
        functools.partial(_dot_bwd_dkv_kernel, scale=scale, bo=bo, bd=bd,
                          slope=slope),
        grid_spec=grid_spec_r,
        out_shape=[
            jax.ShapeDtypeStruct((rows_src, h_dim * bo), jnp.float32),
            jax.ShapeDtypeStruct((rows_src, h_dim * bd), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * h_dim * n_eblk_r * be * BN * (bo + bd),
            bytes_accessed=h_dim * n_eblk_r * be * 2 * (bo + bd) * 4,
            transcendentals=h_dim * n_eblk_r * be,
        ),
    )(aux_rev.block_rows, aux_rev.recv_local[:, None, :], kv_node, q_rg,
      dy_rg, scal_rg)
    dk = dk[:n_src_pad].reshape(-1, h_dim, bo)[:, :, :k.shape[2]]
    dv_n = dv_n[:n_src_pad].reshape(-1, h_dim, bd)[:, :, :d]

    if self_logits is not None:
        alpha_self = jnp.exp(self_logits - mx) / den      # [N, H]
        dsl = (alpha_self * jnp.sum(self_values * dy, -1)
               - alpha_self * s_n).astype(self_logits.dtype)
        dsv = (alpha_self[..., None] * dy).astype(self_values.dtype)
    else:
        dsl = dsv = None
    # primal-dtype cotangents (see _gatv2_bwd note)
    return (dq.astype(q.dtype), dk.astype(k.dtype),
            dv_n.astype(values_n.dtype), None, None, dsl, dsv)


dot_attention_nodes.defvjp(_dot_fwd, _dot_bwd)


# ---------------------------------------------------------------------------
# fused GAT attention: affine logits leaky_relu(pi[r] + pj[s]) in-kernel
# ---------------------------------------------------------------------------
#
# The GAT family's logits are AFFINE in per-node scalars (pi = x a1,
# pj = x a2 — GNNlib/src/layers/conv.jl:112-150), so the kv-style rank-2
# dot formulation wastes a full 128-lane gather chunk on a 2-lane key:
# gathering [k_pad128 | v] rows costs 2 descriptor chunks/row where the
# real payload is H scalars + the value row. Here the sender side rides
# TWO separate node-table gathers (pj: H lanes, v: H*bd lanes) — two
# 1-chunk gathers beat one 2-chunk gather on the descriptor engine
# (GATHER_STUDY.md round-4 addendum) — and the logits, softmax, and
# aggregation all happen in ONE kernel sweep. Backward: a zero-gather
# pass over the forward grouping (dpi; sender operands are the forward's
# grouped residuals) + a reverse-grouping pass whose only new gathers are
# the dy rows and one packed [pi|mx|den|s_n] node-scalar row (dpj, dv).


def _flash_gat_kernel(block_rows_ref, recv_ref, pi_ref, pj_ref, v_ref,
                      y_ref, m_ref, s_ref, *, slope: float, bd: int,
                      h_dim: int):
    """Flash softmax-aggregate with affine logits computed in-kernel.

    pi_ref: [BN, H] receiver projections (ride the output block);
    pj_ref: [BE, H] grouped sender projections; v_ref: [BE, H*bd] grouped
    sender values. All heads are processed in one grid step (static loop).
    """
    k = pl.program_id(0)
    b = block_rows_ref[k]
    prev = block_rows_ref[jnp.maximum(k - 1, 0)]
    _flash_reset(y_ref, m_ref, s_ref,
                 jnp.logical_or(k == 0, b != prev))
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    recv = recv_ref[0]                                    # [1, BE]
    bn = y_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bn, recv.shape[1]), 0)
    hit = rows == recv                                    # [BN, BE]
    # the whole logit/softmax state lives [BN, BE]-shaped: the affine logit
    # broadcasts to every (row, slot) pair and `hit` masks the real edges —
    # no per-slot distribute matmuls or cross-sublane reduces anywhere (a
    # [BN,1]-operand MXU distribute measured ~4x slower than this)
    y_all = y_ref[:]
    m_all = m_ref[:]
    s_all = s_ref[:]
    pi_blk = pi_ref[:]                                    # [BN, H]
    pj_blk = pj_ref[:]                                    # [BE, H]
    ys, ms, ss = [], [], []
    for h in range(h_dim):
        # the affine logit is rank-1, so the whole add/lrelu/exp chain runs
        # per-SLOT ([1, BE]): pi is extracted to slot space by a masked max
        # (each slot has one hit row) and only cheap select/max ops stay
        # [BN, BE] — transcendentals drop BN-fold (r5; the kernel was the
        # bottleneck once the pj gather died)
        pi_slot = _slot_extract(hit, jnp.broadcast_to(
            pi_blk[:, h][:, None], hit.shape), neg)       # [1, BE]
        raw_slot = pi_slot + pj_blk[:, h][None, :]
        act_slot = jnp.where(raw_slot >= 0, raw_slot, slope * raw_slot)
        act_slot = jnp.where(pi_slot == neg, neg, act_slot)
        lg_hit = jnp.where(hit, act_slot, neg)            # [BN, BE] select
        m_old = m_all[:, h]
        m_new = jnp.maximum(m_old, jnp.max(lg_hit, axis=1))
        scale = jnp.where(m_new == neg, 1.0, jnp.exp(m_old - m_new))
        m_fin = jnp.where(m_new == neg, 0.0, m_new)       # exp(-inf-(-inf))
        m_slot = _slot_extract(hit, jnp.broadcast_to(
            m_fin[:, None], hit.shape), neg)
        p_slot = jnp.where(act_slot == neg, 0.0,
                           jnp.exp(act_slot - m_slot))
        p = jnp.where(hit, p_slot, 0.0)
        s_h = s_all[:, h] * scale + jnp.sum(p, axis=1)
        y_h = (y_all[:, h * bd:(h + 1) * bd]
               * scale[:, None].astype(y_all.dtype)
               + jax.lax.dot(p.astype(v_ref.dtype),
                             v_ref[:, h * bd:(h + 1) * bd],
                             preferred_element_type=jnp.float32)
               .astype(y_all.dtype))
        ys.append(y_h)
        ms.append(m_new[:, None])
        ss.append(s_h[:, None])
    y_ref[:] = ys[0] if h_dim == 1 else jnp.concatenate(ys, axis=1)
    m_ref[:] = ms[0] if h_dim == 1 else jnp.concatenate(ms, axis=1)
    s_ref[:] = ss[0] if h_dim == 1 else jnp.concatenate(ss, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gat_attention_nodes(pi, pj, values_n, auxes, ids, static_args,
                        self_logits=None, self_values=None,
                        pj_weight=None):
    """GAT-family attention with affine logits fully in-kernel.

    ``lg_e = leaky_relu(pi[r_e] + pj[s_e], slope)``; values are sender-side
    node rows. The sender side pays at most two 1-chunk node-table gathers
    (pj and v); no edge-space array is ever materialized.

    ``pj_weight`` (r5): when the caller's ``pj`` is exactly
    ``einsum("nhf,fh->nh", values_n, pj_weight)`` — true for GATConv
    without edge features, where pj is the a2-contraction of the SAME Wx
    rows the values are — pass that weight and the forward regenerates the
    grouped pj from the already-gathered value rows (one einsum over the
    residual) instead of paying the second grouped gather: 5.5 ms saved at
    2M edges, the forward drops to ONE gather. ``pj`` still carries the
    gradient (the hint is only a recompute path; its cotangent is zero).

    Args:
      pi: [N_dst, H] receiver logit projections.
      pj: [N_src, H] sender logit projections.
      values_n: [N_src, H, D] sender node values.
      auxes: (aux_fwd, aux_rev); ids: (receivers, senders, edge_mask).
      static_args: (n_dst_pad, n_src_pad, slope).
      self_logits/self_values: optional virtual self-loop terms
        (pre-activated logits).
      pj_weight: optional [D, H] with pj == <values, pj_weight> per head.

    Returns [N_dst_pad, H, D].
    """
    out, _, _ = _gat_forward(pi, pj, values_n, auxes, ids, static_args,
                             self_logits, self_values,
                             pj_weight=pj_weight)
    return out


def _gat_forward(pi, pj, values_n, auxes, ids, static_args, self_logits,
                 self_values, return_grp: bool = False, pj_weight=None):
    from .spmm import BD
    aux, _ = auxes
    n_pad, _, slope = static_args
    _, h_dim = pi.shape
    d = values_n.shape[2]
    bd = min(max(d, 128), BD)
    if d > bd:
        raise ValueError("fused GAT attention requires D <= BD")
    n_eblk = aux.n_eblk
    be = aux.senders_grp.shape[1]
    n_nblk = -(-n_pad // BN)
    v_flat = _lane_pad(values_n, bd).reshape(values_n.shape[0], h_dim * bd)
    v_grp = gather(v_flat, aux.senders_grp).reshape(-1, h_dim * bd)
    if pj_weight is not None:
        # regenerate grouped pj from the gathered value rows (v_grp lane
        # padding is zero-filled, so padding the weight matches exactly)
        a2h = _lane_pad(jnp.swapaxes(pj_weight, 0, 1), bd)  # [H, bd]
        pj_grp = jnp.einsum(
            "shf,hf->sh", v_grp.reshape(-1, h_dim, bd).astype(jnp.float32),
            a2h.astype(jnp.float32))
    else:
        pj_grp = gather(pj.astype(jnp.float32),
                        aux.senders_grp).reshape(-1, h_dim)
    pi_pad = pi.astype(jnp.float32)
    if pi_pad.shape[0] < n_nblk * BN:
        pi_pad = jnp.pad(pi_pad,
                         ((0, n_nblk * BN - pi_pad.shape[0]), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_eblk,),
        in_specs=[
            pl.BlockSpec((1, 1, be), lambda k, br: (k, 0, 0)),
            pl.BlockSpec((BN, h_dim), lambda k, br: (br[k], 0)),
            pl.BlockSpec((be, h_dim), lambda k, br: (k, 0)),
            pl.BlockSpec((be, h_dim * bd), lambda k, br: (k, 0)),
        ],
        out_specs=[
            pl.BlockSpec((BN, h_dim * bd), lambda k, br: (br[k], 0)),
            pl.BlockSpec((BN, h_dim), lambda k, br: (br[k], 0)),
            pl.BlockSpec((BN, h_dim), lambda k, br: (br[k], 0)),
        ],
    )
    y, m, s = pl.pallas_call(
        functools.partial(_flash_gat_kernel, slope=float(slope), bd=bd,
                          h_dim=h_dim),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_nblk * BN, h_dim * bd), values_n.dtype),
            jax.ShapeDtypeStruct((n_nblk * BN, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((n_nblk * BN, h_dim), jnp.float32),
        ],
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_eblk * be * BN * h_dim * bd,
            bytes_accessed=(n_eblk * be * h_dim * bd
                            + 2 * n_nblk * BN * h_dim * bd)
            * values_n.dtype.itemsize,
            transcendentals=h_dim * n_eblk * be,
        ),
    )(aux.block_rows, aux.recv_local[:, None, :], pi_pad, pj_grp, v_grp)
    num = y[:n_pad].reshape(-1, h_dim, bd)[:, :, :d]
    out3 = _finalize_softmax(num, m[:n_pad], s[:n_pad], self_logits,
                             self_values, None)
    if return_grp:
        return out3 + (v_grp, pj_grp)
    return out3


def _gat_fwd(pi, pj, values_n, auxes, ids, static_args, self_logits,
             self_values, pj_weight=None):
    out, mx, den, v_grp, pj_grp = _gat_forward(
        pi, pj, values_n, auxes, ids, static_args, self_logits,
        self_values, return_grp=True, pj_weight=pj_weight)
    res = (pi, pj, values_n, auxes, ids, self_logits, self_values, out, mx,
           den, v_grp, pj_grp)
    return out, res


def _gat_bwd_dpi_kernel(block_rows_ref, recv_ref, pi_ref, scal_ref, dy_ref,
                        pj_ref, v_ref, dpi_ref, *, slope: float, bd: int,
                        h_dim: int):
    """dpi over the FORWARD grouping with ZERO gathers.

    Receiver operands (pi, mx/den/s_n, dy) ride the output block and are
    distributed to slots by one-hot MXU matmuls; sender operands (pj, v)
    are the forward's grouped residuals. Recomputes alpha/dlg in-kernel;
    ``dpi[r] += sum_e dlg_e``.
    """
    k = pl.program_id(0)
    b = block_rows_ref[k]
    prev = block_rows_ref[jnp.maximum(k - 1, 0)]

    @pl.when(jnp.logical_or(k == 0, b != prev))
    def _():
        dpi_ref[:] = jnp.zeros_like(dpi_ref)

    recv = recv_ref[0]
    bn = dpi_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bn, recv.shape[1]), 0)
    hit = rows == recv                                    # [BN, BE]
    # everything [BN, BE]-shaped: receiver operands (pi, mx, den, s_n, dy)
    # ride the rows directly — no slot-distribute matmuls (measured ~4x
    # slower with narrow operands); the per-pair <v_e, dy_r> dots are ONE
    # MXU dot_general contracting the feature lanes
    pi_blk = pi_ref[:]
    pj_blk = pj_ref[:]
    scal_blk = scal_ref[:]
    dpis = []
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    for h in range(h_dim):
        pi_slot = _slot_extract(hit, jnp.broadcast_to(
            pi_blk[:, h][:, None], hit.shape), neg)       # [1, BE]
        raw_slot = pi_slot + pj_blk[:, h][None, :]
        act_slot = jnp.where(raw_slot >= 0, raw_slot, slope * raw_slot)
        act_slot = jnp.where(pi_slot == neg, neg, act_slot)
        mx_r = scal_blk[:, 3 * h][:, None]
        den_r = jnp.maximum(scal_blk[:, 3 * h + 1], 1e-38)[:, None]
        sn_r = scal_blk[:, 3 * h + 2][:, None]
        mx_slot = _slot_extract(hit, jnp.broadcast_to(mx_r, hit.shape), neg)
        den_slot = jnp.maximum(_slot_extract(
            hit, jnp.broadcast_to(den_r, hit.shape), 0.0), 1e-38)
        alpha_slot = jnp.where(act_slot == neg, 0.0,
                               jnp.exp(act_slot - mx_slot) / den_slot)
        alpha = jnp.where(hit, alpha_slot, 0.0)
        vdots = jax.lax.dot_general(
            dy_ref[:, h * bd:(h + 1) * bd].astype(jnp.float32),
            v_ref[:, h * bd:(h + 1) * bd].astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [BN, BE]
        dsig_slot = jnp.where(raw_slot >= 0, 1.0, slope)  # [1, BE]
        dlg = alpha * (vdots - sn_r) * dsig_slot
        dpis.append(jnp.sum(dlg, axis=1)[:, None])
    dpi_ref[:] += (dpis[0] if h_dim == 1
                   else jnp.concatenate(dpis, axis=1))


def _gat_bwd_rev_kernel(block_rows_ref, recv_ref, pj_ref, vnode_ref,
                        pack_ref, dpj_ref, dv_ref, *, slope: float,
                        bd: int, h_dim: int):
    """dpj and dv over the REVERSE grouping.

    Sender operands (pj, v) ride the output block; receiver operands
    arrive as gathered rows: dy (one row gather) and one packed
    ``[pi | mx | den | s_n]`` node-scalar row (rscal_ref, 4 lanes/head).
    ``dv[s] += alpha_e dy[r_e]``; ``dpj[s] += sum_e dlg_e``.
    """
    k = pl.program_id(0)
    b = block_rows_ref[k]
    prev = block_rows_ref[jnp.maximum(k - 1, 0)]

    @pl.when(jnp.logical_or(k == 0, b != prev))
    def _():
        dpj_ref[:] = jnp.zeros_like(dpj_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    recv = recv_ref[0]
    bn = dpj_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bn, recv.shape[1]), 0)
    hit = rows == recv                                    # [BN, BE]
    # [BN, BE]-shaped like the dpi kernel: sender operands (pj, v) ride the
    # rows, receiver operands arrive as gathered per-slot vectors
    pj_blk = pj_ref[:]
    # one packed gathered row: [dy (H*bd) | 8-lane scalar block per head]
    Q = h_dim * bd
    dy_g = pack_ref[:, :Q].astype(jnp.float32)            # [BE, H*bd]
    rscal = pack_ref[:, Q:]
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    dpjs, dvs = [], []
    for h in range(h_dim):
        pi_g = rscal[:, 8 * h][None, :]                   # [1, BE]
        mx_g = rscal[:, 8 * h + 1][None, :]
        den_g = jnp.maximum(rscal[:, 8 * h + 2], 1e-38)[None, :]
        sn_g = rscal[:, 8 * h + 3][None, :]
        pj_slot = _slot_extract(hit, jnp.broadcast_to(
            pj_blk[:, h][:, None], hit.shape), neg)       # [1, BE]
        raw_slot = pj_slot + pi_g
        act_slot = jnp.where(raw_slot >= 0, raw_slot, slope * raw_slot)
        act_slot = jnp.where(pj_slot == neg, neg, act_slot)
        alpha_slot = jnp.where(act_slot == neg, 0.0,
                               jnp.exp(act_slot - mx_g) / den_g)
        alpha = jnp.where(hit, alpha_slot, 0.0)
        dv_h = jax.lax.dot(alpha.astype(jnp.float32),
                           dy_g[:, h * bd:(h + 1) * bd],
                           preferred_element_type=jnp.float32)
        vdots = jax.lax.dot_general(
            vnode_ref[:, h * bd:(h + 1) * bd].astype(jnp.float32),
            dy_g[:, h * bd:(h + 1) * bd],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [BN, BE]
        dsig_slot = jnp.where(raw_slot >= 0, 1.0, slope)
        dlg = alpha * (vdots - sn_g) * dsig_slot
        dpjs.append(jnp.sum(dlg, axis=1)[:, None])
        dvs.append(dv_h)
    dpj_ref[:] += (dpjs[0] if h_dim == 1
                   else jnp.concatenate(dpjs, axis=1))
    dv_ref[:] += (dvs[0] if h_dim == 1
                  else jnp.concatenate(dvs, axis=1))


def _gat_bwd(static_args, res, dy):
    (pi, pj, values_n, auxes, ids, self_logits, self_values, out, mx,
     den, v_grp, pj_grp) = res
    aux, aux_rev = auxes
    n_pad, n_src_pad, slope = static_args
    slope = float(slope)
    from .spmm import BD
    _, h_dim = pi.shape
    d = values_n.shape[2]
    bd = min(max(d, 128), BD)
    be = aux.senders_grp.shape[1]
    interpret = _use_interpret()

    s_n = jnp.sum(out * dy, -1).astype(jnp.float32)       # [N_dst, H]
    dy32 = dy.astype(jnp.float32)
    mx32 = mx.astype(jnp.float32)
    den32 = den.astype(jnp.float32)
    n_nblk_dst = -(-n_pad // BN)
    rows_dst = n_nblk_dst * BN

    def _rowpad(x, rows):
        if x.shape[0] < rows:
            return jnp.pad(x, ((0, rows - x.shape[0]),)
                           + ((0, 0),) * (x.ndim - 1))
        return x

    pi_pad = _rowpad(pi.astype(jnp.float32), rows_dst)
    scal = jnp.stack([mx32, den32, s_n], axis=-1)         # [N_dst, H, 3]
    scal_flat = _rowpad(scal.reshape(-1, h_dim * 3), rows_dst)
    dy_flat = _rowpad(_lane_pad(dy32, bd).reshape(-1, h_dim * bd), rows_dst)

    # ---- dpi: forward grouping, zero gathers ----
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(aux.n_eblk,),
        in_specs=[
            pl.BlockSpec((1, 1, be), lambda k, br: (k, 0, 0)),
            pl.BlockSpec((BN, h_dim), lambda k, br: (br[k], 0)),
            pl.BlockSpec((BN, 3 * h_dim), lambda k, br: (br[k], 0)),
            pl.BlockSpec((BN, h_dim * bd), lambda k, br: (br[k], 0)),
            pl.BlockSpec((be, h_dim), lambda k, br: (k, 0)),
            pl.BlockSpec((be, h_dim * bd), lambda k, br: (k, 0)),
        ],
        out_specs=pl.BlockSpec((BN, h_dim), lambda k, br: (br[k], 0)),
    )
    dpi = pl.pallas_call(
        functools.partial(_gat_bwd_dpi_kernel, slope=slope, bd=bd,
                          h_dim=h_dim),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_dst, h_dim), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * aux.n_eblk * be * BN * h_dim * bd,
            bytes_accessed=aux.n_eblk * be * h_dim * (bd + 1) * 4,
            transcendentals=h_dim * aux.n_eblk * be,
        ),
    )(aux.block_rows, aux.recv_local[:, None, :], pi_pad, scal_flat,
      dy_flat, pj_grp, v_grp)
    dpi = dpi[:n_pad]

    # ---- dpj, dv: reverse grouping — ONE packed row gather
    # ([dy | per-head 8-lane (pi, mx, den, s_n)]: a 528B+ row costs ~5.5-7
    # ns where dy + scal separately cost ~8.1, GATHER_STUDY r5 addendum)
    rscal = jnp.concatenate(
        [pi.astype(jnp.float32)[..., None], scal,
         jnp.zeros(scal.shape[:-1] + (4,), jnp.float32)],
        axis=-1)                                          # [N_dst, H, 8]
    pack = jnp.concatenate([dy_flat[:pi.shape[0]],
                            rscal.reshape(-1, h_dim * 8)], axis=1)
    pack_g = gather(pack, aux_rev.senders_grp).reshape(-1, pack.shape[1])
    n_nblk_src = -(-n_src_pad // BN)
    rows_src = n_nblk_src * BN
    pj_pad = _rowpad(pj.astype(jnp.float32), rows_src)
    v_flat = _rowpad(_lane_pad(values_n, bd).reshape(-1, h_dim * bd),
                     rows_src)
    grid_spec_r = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(aux_rev.n_eblk,),
        in_specs=[
            pl.BlockSpec((1, 1, be), lambda k, br: (k, 0, 0)),
            pl.BlockSpec((BN, h_dim), lambda k, br: (br[k], 0)),
            pl.BlockSpec((BN, h_dim * bd), lambda k, br: (br[k], 0)),
            pl.BlockSpec((be, pack.shape[1]), lambda k, br: (k, 0)),
        ],
        out_specs=[
            pl.BlockSpec((BN, h_dim), lambda k, br: (br[k], 0)),
            pl.BlockSpec((BN, h_dim * bd), lambda k, br: (br[k], 0)),
        ],
    )
    dpj, dv = pl.pallas_call(
        functools.partial(_gat_bwd_rev_kernel, slope=slope, bd=bd,
                          h_dim=h_dim),
        grid_spec=grid_spec_r,
        out_shape=[
            jax.ShapeDtypeStruct((rows_src, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((rows_src, h_dim * bd), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * aux_rev.n_eblk * be * BN * h_dim * bd,
            bytes_accessed=aux_rev.n_eblk * be * h_dim * 2 * bd * 4,
            transcendentals=h_dim * aux_rev.n_eblk * be,
        ),
    )(aux_rev.block_rows, aux_rev.recv_local[:, None, :], pj_pad, v_flat,
      pack_g)
    dpj = dpj[:n_src_pad]
    dv = dv[:n_src_pad].reshape(-1, h_dim, bd)[:, :, :d]

    if self_logits is not None:
        alpha_self = jnp.exp(self_logits - mx) / den      # [N, H]
        dsl = (alpha_self * jnp.sum(self_values * dy, -1)
               - alpha_self * s_n).astype(self_logits.dtype)
        dsv = (alpha_self[..., None] * dy).astype(self_values.dtype)
    else:
        dsl = dsv = None
    # primal-dtype cotangents (see _gatv2_bwd note); pj_weight is a
    # recompute hint only — zero cotangent (the gradient rides pj)
    return (dpi.astype(pi.dtype), dpj.astype(pj.dtype),
            dv.astype(values_n.dtype), None, None, dsl, dsv, None)


gat_attention_nodes.defvjp(_gat_fwd, _gat_bwd)


# ---------------------------------------------------------------------------
# fused GATv2 attention: logits a' leaky_relu(q[r] + k[s]), values == k
# ---------------------------------------------------------------------------


def _flash_gatv2_kernel(block_rows_ref, recv_ref, q_ref, kg_ref, a_ref,
                        y_ref, m_ref, s_ref, *, slope: float, bo: int,
                        h_dim: int):
    """Flash update with GATv2 logits computed IN-kernel.

    ``lg = <a, leaky_relu(q[recv] + k[sender])>`` and the VALUES are the
    same ``k[sender]`` rows (GATv2 aggregates Wx_j — GNNlib conv.jl:171-214)
    — so the ENTIRE layer pays one grouped gather. q arrives as the output
    row block, distributed to slots by a one-hot MXU matmul (the leaky_relu
    sits between the add and the <a,·> contraction, so the logit cannot be
    factored into the [BN,BE] broadcast form the GAT kernel uses).

    All heads ride one grid step (blocks carry the full H*bo width, r5: a
    per-head grid axis needs (BN,1)/(1,bo) blocks over [·,H] arrays, which
    violates the TPU (8,128)-divisibility tiling rule for H>1 — the exact
    H>1 lowering failure r4 fixed for GAT/dot, surfaced for GATv2 by
    benchmarks/measure_r5.py).
    """
    kidx = pl.program_id(0)
    b = block_rows_ref[kidx]
    prev = block_rows_ref[jnp.maximum(kidx - 1, 0)]
    _flash_reset(y_ref, m_ref, s_ref,
                 jnp.logical_or(kidx == 0, b != prev))
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    recv = recv_ref[0]                                    # [1, BE]
    bn = y_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bn, recv.shape[1]), 0)
    hit = rows == recv                                    # [BN, BE]
    cols = jax.lax.broadcasted_iota(jnp.int32,
                                    (recv.shape[1], bn), 1)
    oh_t = (cols == recv[0][:, None]).astype(jnp.float32)  # [BE, BN]
    y_all = y_ref[:]
    m_all = m_ref[:]
    s_all = s_ref[:]
    a_row = a_ref[0].astype(jnp.float32)                  # [H*bo]
    ys, ms, ss = [], [], []
    for h in range(h_dim):
        sl = slice(h * bo, (h + 1) * bo)
        q_slot = jax.lax.dot(oh_t, q_ref[:, sl],
                             preferred_element_type=jnp.float32)
        kg_h = kg_ref[:, sl]
        raw = q_slot + kg_h.astype(jnp.float32)           # [BE, bo]
        act = jnp.where(raw >= 0, raw, slope * raw)
        lg = jnp.sum(act * a_row[sl][None, :], axis=1)[None, :]  # [1, BE]
        lg_valid = jnp.where(recv >= 0, lg, neg)          # [1, BE]
        lg_hit = jnp.where(hit, lg_valid, neg)            # [BN, BE] select
        m_old = m_all[:, h]
        m_new = jnp.maximum(m_old, jnp.max(lg_hit, axis=1))
        scale = jnp.where(m_new == neg, 1.0, jnp.exp(m_old - m_new))
        m_fin = jnp.where(m_new == neg, 0.0, m_new)
        m_slot = _slot_extract(hit, jnp.broadcast_to(
            m_fin[:, None], hit.shape), neg)
        p_slot = jnp.where(lg_valid == neg, 0.0,
                           jnp.exp(lg_valid - m_slot))
        p = jnp.where(hit, p_slot, 0.0)
        s_h = s_all[:, h] * scale + jnp.sum(p, axis=1)
        y_h = (y_all[:, sl] * scale[:, None].astype(y_all.dtype)
               + jax.lax.dot(p.astype(kg_h.dtype), kg_h,
                             preferred_element_type=jnp.float32)
               .astype(y_all.dtype))
        ys.append(y_h)
        ms.append(m_new[:, None])
        ss.append(s_h[:, None])
    y_ref[:] = ys[0] if h_dim == 1 else jnp.concatenate(ys, axis=1)
    m_ref[:] = ms[0] if h_dim == 1 else jnp.concatenate(ms, axis=1)
    s_ref[:] = ss[0] if h_dim == 1 else jnp.concatenate(ss, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gatv2_attention_nodes(q, k, a, auxes, ids, static_args,
                          self_logits=None, self_values=None):
    """GATv2 attention fully in-kernel: logits
    ``<a_h, leaky_relu(q[r] + k[s])>`` with ``k`` doubling as the values.
    ONE grouped gather for the whole layer; zero edge-space arrays.

    Args:
      q: [N_dst, H, O] receiver projections (Wi x).
      k: [N_src, H, O] sender projections (Wj x) — also the values.
      a: [O, H] attention vector (layer layout).
      auxes: (aux_fwd, aux_rev); ids: (receivers, senders, edge_mask).
      static_args: (n_dst_pad, n_src_pad, slope).
      self_logits/self_values: optional virtual self-loop terms.

    Returns [N_dst_pad, H, O].
    """
    out, _, _ = _gatv2_forward(q, k, a, auxes, ids, static_args,
                               self_logits, self_values)
    return out


def _gatv2_forward(q, k, a, auxes, ids, static_args, self_logits,
                   self_values, return_grp: bool = False):
    from .spmm import BD
    aux, _ = auxes
    n_pad, _, slope = static_args
    _, h_dim, o = q.shape
    bo = min(max(o, 128), BD)
    if o > bo:
        raise ValueError("fused GATv2 requires O <= BD")
    n_eblk = aux.n_eblk
    be = aux.senders_grp.shape[1]
    n_nblk = -(-n_pad // BN)
    k_flat = _lane_pad(k, bo).reshape(k.shape[0], h_dim * bo)
    kg_flat = gather(k_flat, aux.senders_grp).reshape(-1, h_dim * bo)
    # f32 softmax state; only K (values) rides the input dtype — see
    # _dot_forward note
    q_flat = (_lane_pad(q, bo).reshape(q.shape[0], h_dim * bo)
              .astype(jnp.float32))
    q_flat = jnp.pad(q_flat, ((0, n_nblk * BN - q_flat.shape[0]), (0, 0)))
    a_hp = _lane_pad(jnp.swapaxes(a, 0, 1), bo) \
        .reshape(1, h_dim * bo)                           # [1, H*bo]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_eblk,),
        in_specs=[
            pl.BlockSpec((1, 1, be), lambda kk, br: (kk, 0, 0)),
            pl.BlockSpec((BN, h_dim * bo), lambda kk, br: (br[kk], 0)),
            pl.BlockSpec((be, h_dim * bo), lambda kk, br: (kk, 0)),
            pl.BlockSpec((1, h_dim * bo), lambda kk, br: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((BN, h_dim * bo), lambda kk, br: (br[kk], 0)),
            pl.BlockSpec((BN, h_dim), lambda kk, br: (br[kk], 0)),
            pl.BlockSpec((BN, h_dim), lambda kk, br: (br[kk], 0)),
        ],
    )
    y, m, s = pl.pallas_call(
        functools.partial(_flash_gatv2_kernel, slope=slope, bo=bo,
                          h_dim=h_dim),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_nblk * BN, h_dim * bo), k.dtype),
            jax.ShapeDtypeStruct((n_nblk * BN, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((n_nblk * BN, h_dim), jnp.float32),
        ],
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * h_dim * n_eblk * be * BN * bo,
            bytes_accessed=h_dim * (n_eblk * be * bo + 2 * n_nblk * BN * bo)
            * k.dtype.itemsize,
            transcendentals=h_dim * n_eblk * be,
        ),
    )(aux.block_rows, aux.recv_local[:, None, :], q_flat, kg_flat, a_hp)
    num = y[:n_pad].reshape(-1, h_dim, bo)[:, :, :o]
    out3 = _finalize_softmax(num, m[:n_pad], s[:n_pad], self_logits,
                             self_values, None)
    if return_grp:
        return out3 + (kg_flat,)
    return out3


def _gatv2_fwd(q, k, a, auxes, ids, static_args, self_logits, self_values):
    out, mx, den, kg_flat = _gatv2_forward(
        q, k, a, auxes, ids, static_args, self_logits, self_values,
        return_grp=True)
    res = (q, k, a, auxes, ids, self_logits, self_values, out, mx, den,
           kg_flat)
    return out, res


def _gatv2_bwd_fwd_kernel(block_rows_ref, recv_ref, q_ref, dy_ref,
                          scal_ref, kg_ref, a_ref, dq_ref, da_ref, *,
                          slope: float, bo: int, h_dim: int):
    """dq and da over the FORWARD grouping — zero gathers.

    Receiver operands (q, dy, [mx|den|s_n]) ride the output row block and
    are distributed to edge slots by one-hot MXU matmuls; sender operand
    (grouped k) is the forward residual. Per slot the kernel recomputes
    ``raw = q[r]+k[s]``, ``act``, ``alpha`` and the logit cotangent
    ``dlg = alpha (<k[s], dy[r]> - s_n[r])``, then accumulates
    ``dq[r] += dlg * a * lrelu'(raw)`` back through the one-hot and
    ``da += act^T dlg`` into a single constant-indexed block (revisited on
    every consecutive grid step, so accumulation is valid).
    """
    kidx = pl.program_id(0)
    b = block_rows_ref[kidx]
    prev = block_rows_ref[jnp.maximum(kidx - 1, 0)]

    @pl.when(jnp.logical_or(kidx == 0, b != prev))
    def _():
        dq_ref[:] = jnp.zeros_like(dq_ref)

    @pl.when(kidx == 0)
    def _():
        da_ref[:] = jnp.zeros_like(da_ref)

    recv = recv_ref[0]                                    # [1, BE]
    bn = dq_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bn, recv.shape[1]), 0)
    hit = rows == recv                                    # [BN, BE]
    one_hot = hit.astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (recv.shape[1], bn), 1)
    oh_t = (cols == recv[0][:, None]).astype(jnp.float32)  # [BE, BN]
    valid = (recv[0] >= 0)                                # [BE]
    a_row = a_ref[0].astype(jnp.float32)
    dqs, das = [], []
    for h in range(h_dim):
        sl = slice(h * bo, (h + 1) * bo)
        q_slot = jax.lax.dot(oh_t, q_ref[:, sl].astype(jnp.float32),
                             preferred_element_type=jnp.float32)
        dy_slot = jax.lax.dot(oh_t, dy_ref[:, sl].astype(jnp.float32),
                              preferred_element_type=jnp.float32)
        sc_slot = jax.lax.dot(oh_t,
                              scal_ref[:, 3 * h:3 * h + 3]
                              .astype(jnp.float32),
                              preferred_element_type=jnp.float32)  # [BE,3]
        mx_s = sc_slot[:, 0]
        den_s = jnp.maximum(sc_slot[:, 1], 1e-38)
        sn_s = sc_slot[:, 2]
        kg = kg_ref[:, sl].astype(jnp.float32)
        raw = q_slot + kg                                 # [BE, bo]
        act = jnp.where(raw >= 0, raw, slope * raw)
        lg = jnp.sum(act * a_row[sl][None, :], axis=1)    # [BE]
        alpha = jnp.where(valid, jnp.exp(lg - mx_s) / den_s, 0.0)
        vdot = jnp.sum(kg * dy_slot, axis=1)
        dlg = alpha * (vdot - sn_s)                       # [BE]
        dsig = jnp.where(raw >= 0, 1.0, slope)
        draw = dlg[:, None] * a_row[sl][None, :] * dsig   # [BE, bo]
        dqs.append(jax.lax.dot(one_hot, draw,
                               preferred_element_type=jnp.float32))
        das.append(jax.lax.dot(dlg[None, :], act,
                               preferred_element_type=jnp.float32))
    dq_ref[:] += dqs[0] if h_dim == 1 else jnp.concatenate(dqs, axis=1)
    da_ref[:] += das[0] if h_dim == 1 else jnp.concatenate(das, axis=1)


def _gatv2_bwd_rev_kernel(block_rows_ref, recv_ref, k_ref, pack_ref,
                          a_ref, dk_ref, *,
                          slope: float, bo: int, h_dim: int):
    """dk over the REVERSE grouping.

    Sender operand k rides the output row block; receiver operands arrive
    as ONE packed gathered row ``[q (H*bo) | dy (H*bo) | 8-lane scalar
    block per head (mx, den, s_n)]`` — a single ~1KB-row gather costs
    ~7 ns/row where three separate gathers cost ~13.4 (r5 width sweep,
    GATHER_STUDY addendum). ``dk[s] += dlg * a * lrelu'(raw) + alpha *
    dy[r]`` — the logit half plus the value half (values == k) in one
    accumulation.
    """
    kidx = pl.program_id(0)
    b = block_rows_ref[kidx]
    prev = block_rows_ref[jnp.maximum(kidx - 1, 0)]

    @pl.when(jnp.logical_or(kidx == 0, b != prev))
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)

    recv = recv_ref[0]
    bn = dk_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bn, recv.shape[1]), 0)
    hit = rows == recv
    one_hot = hit.astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (recv.shape[1], bn), 1)
    oh_t = (cols == recv[0][:, None]).astype(jnp.float32)
    valid = (recv[0] >= 0)
    a_row = a_ref[0].astype(jnp.float32)
    dks = []
    Q = h_dim * bo
    for h in range(h_dim):
        sl = slice(h * bo, (h + 1) * bo)
        k_slot = jax.lax.dot(oh_t, k_ref[:, sl].astype(jnp.float32),
                             preferred_element_type=jnp.float32)
        q_g = pack_ref[:, h * bo:(h + 1) * bo].astype(jnp.float32)
        dy_g = pack_ref[:, Q + h * bo:Q + (h + 1) * bo].astype(jnp.float32)
        mx_s = pack_ref[:, 2 * Q + 8 * h].astype(jnp.float32)
        den_s = jnp.maximum(
            pack_ref[:, 2 * Q + 8 * h + 1].astype(jnp.float32), 1e-38)
        sn_s = pack_ref[:, 2 * Q + 8 * h + 2].astype(jnp.float32)
        raw = q_g + k_slot
        act = jnp.where(raw >= 0, raw, slope * raw)
        lg = jnp.sum(act * a_row[sl][None, :], axis=1)
        alpha = jnp.where(valid, jnp.exp(lg - mx_s) / den_s, 0.0)
        vdot = jnp.sum(k_slot * dy_g, axis=1)
        dlg = alpha * (vdot - sn_s)
        dsig = jnp.where(raw >= 0, 1.0, slope)
        contrib = (dlg[:, None] * a_row[sl][None, :] * dsig
                   + alpha[:, None] * dy_g)               # [BE, bo]
        dks.append(jax.lax.dot(one_hot, contrib,
                               preferred_element_type=jnp.float32))
    dk_ref[:] += dks[0] if h_dim == 1 else jnp.concatenate(dks, axis=1)


def _gatv2_bwd(static_args, res, dy):
    """Fused GATv2 backward: two grouped kernel sweeps (r5).

    Replaces the edge-space backward (three [E,H,O] materializations, six
    edge gathers, 3H separate scatter kernels — 775 ms at 2M/H=4) with the
    GAT-style pair: dq+da on the forward grouping with ZERO gathers, dk on
    the reverse grouping with three row gathers (q, dy, packed scalars).
    """
    (q, k, a, auxes, ids, self_logits, self_values, out, mx, den,
     kg_flat) = res
    aux, aux_rev = auxes
    n_pad, n_src_pad, slope = static_args
    slope = float(slope)
    from .spmm import BD
    h_dim, o = q.shape[1], q.shape[2]
    bo = min(max(o, 128), BD)
    be = aux.senders_grp.shape[1]
    interpret = _use_interpret()

    def _rowpad(x, rows):
        if x.shape[0] < rows:
            return jnp.pad(x, ((0, rows - x.shape[0]),)
                           + ((0, 0),) * (x.ndim - 1))
        return x

    s_n = jnp.sum(out * dy, -1).astype(jnp.float32)       # [N_dst, H]
    scal = jnp.stack([mx.astype(jnp.float32),
                      den.astype(jnp.float32), s_n], axis=-1)  # [N,H,3]
    scal_rows = scal.reshape(-1, h_dim * 3)
    n_nblk_dst = -(-n_pad // BN)
    rows_dst = n_nblk_dst * BN
    q_flat = (_lane_pad(q, bo).reshape(-1, h_dim * bo).astype(jnp.float32))
    dy_flat = (_lane_pad(dy.astype(jnp.float32), bo)
               .reshape(-1, h_dim * bo))
    a_hp = (_lane_pad(jnp.swapaxes(a, 0, 1), bo)
            .reshape(1, h_dim * bo).astype(jnp.float32))

    # ---- pass 1: dq + da on the forward grouping (zero gathers) ----
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(aux.n_eblk,),
        in_specs=[
            pl.BlockSpec((1, 1, be), lambda kk, br: (kk, 0, 0)),
            pl.BlockSpec((BN, h_dim * bo), lambda kk, br: (br[kk], 0)),
            pl.BlockSpec((BN, h_dim * bo), lambda kk, br: (br[kk], 0)),
            pl.BlockSpec((BN, 3 * h_dim), lambda kk, br: (br[kk], 0)),
            pl.BlockSpec((be, h_dim * bo), lambda kk, br: (kk, 0)),
            pl.BlockSpec((1, h_dim * bo), lambda kk, br: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((BN, h_dim * bo), lambda kk, br: (br[kk], 0)),
            pl.BlockSpec((1, h_dim * bo), lambda kk, br: (0, 0)),
        ],
    )
    dq, da = pl.pallas_call(
        functools.partial(_gatv2_bwd_fwd_kernel, slope=slope, bo=bo,
                          h_dim=h_dim),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows_dst, h_dim * bo), jnp.float32),
            jax.ShapeDtypeStruct((1, h_dim * bo), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * aux.n_eblk * be * BN * h_dim * bo,
            bytes_accessed=aux.n_eblk * be * h_dim * 2 * bo * 4,
            transcendentals=h_dim * aux.n_eblk * be,
        ),
    )(aux.block_rows, aux.recv_local[:, None, :],
      _rowpad(q_flat, rows_dst), _rowpad(dy_flat, rows_dst),
      _rowpad(scal_rows, rows_dst), kg_flat, a_hp)
    dq = dq[:n_pad].reshape(-1, h_dim, bo)[:, :, :o]
    da = jnp.swapaxes(da.reshape(h_dim, bo)[:, :o], 0, 1)  # [O, H]

    # ---- pass 2: dk on the reverse grouping — ONE packed row gather
    # ([q | dy | per-head 8-lane scalars]; a ~1KB-row gather costs ~7
    # ns/row vs ~13.4 for three separate ones, GATHER_STUDY r5 addendum).
    # Requires 128-aligned head segments; bo is always >= 128 here and the
    # common cases (o <= 128, or o a lane multiple) keep Q % 128 == 0.
    scal8 = jnp.concatenate(
        [scal, jnp.zeros(scal.shape[:-1] + (5,), scal.dtype)], axis=-1)
    pack = jnp.concatenate(
        [q_flat, dy_flat, scal8.reshape(-1, h_dim * 8)], axis=1)
    pack_g = gather(pack, aux_rev.senders_grp) \
        .reshape(-1, pack.shape[1])
    n_nblk_src = -(-n_src_pad // BN)
    rows_src = n_nblk_src * BN
    k_flat = _rowpad(_lane_pad(k, bo).reshape(-1, h_dim * bo), rows_src)
    grid_spec_r = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(aux_rev.n_eblk,),
        in_specs=[
            pl.BlockSpec((1, 1, be), lambda kk, br: (kk, 0, 0)),
            pl.BlockSpec((BN, h_dim * bo), lambda kk, br: (br[kk], 0)),
            pl.BlockSpec((be, pack.shape[1]), lambda kk, br: (kk, 0)),
            pl.BlockSpec((1, h_dim * bo), lambda kk, br: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BN, h_dim * bo), lambda kk, br: (br[kk], 0)),
    )
    dk = pl.pallas_call(
        functools.partial(_gatv2_bwd_rev_kernel, slope=slope, bo=bo,
                          h_dim=h_dim),
        grid_spec=grid_spec_r,
        out_shape=jax.ShapeDtypeStruct((rows_src, h_dim * bo), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * aux_rev.n_eblk * be * BN * h_dim * bo,
            bytes_accessed=aux_rev.n_eblk * be * h_dim * 3 * bo * 4,
            transcendentals=h_dim * aux_rev.n_eblk * be,
        ),
    )(aux_rev.block_rows, aux_rev.recv_local[:, None, :], k_flat, pack_g,
      a_hp)
    dk = dk[:n_src_pad].reshape(-1, h_dim, bo)[:, :, :o]

    if self_logits is not None:
        alpha_self = jnp.exp(self_logits - mx) / den      # [N, H]
        dsl = (alpha_self * jnp.sum(self_values * dy, -1)
               - alpha_self * s_n).astype(self_logits.dtype)
        dsv = (alpha_self[..., None] * dy).astype(self_values.dtype)
    else:
        dsl = dsv = None
    # cotangents must carry the PRIMAL dtypes (alpha/softmax state is f32
    # internally, so bf16 primals would otherwise get f32 cotangents)
    return (dq.astype(q.dtype), dk.astype(k.dtype), da.astype(a.dtype),
            None, None, dsl, dsv)


gatv2_attention_nodes.defvjp(_gatv2_fwd, _gatv2_bwd)


# ---------------------------------------------------------------------------
# node-level values variant: the GAT-family fast path
# ---------------------------------------------------------------------------
#
# Attention layers' values are node-level (W x_j); materializing them per
# edge ([E, H, D]) just to regather inside the kernel doubles the dominant
# HBM traffic. Here the sender-gather is fused INTO the scatter-matmul via
# ``aux.senders_grp`` (exactly like the SpMM kernel), so the forward streams
# [N, H, D] once instead of materializing + regathering [E, H, D], and the
# value-gradient comes back node-level through one scatter-matmul over the
# reverse grouping (no edge-level dv intermediate).


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def edge_softmax_aggregate_nodes(logits, values_n, auxes, ids, static_args,
                                 self_logits=None, self_values=None,
                                 dropout_masks=None):
    """Fused softmax-over-in-edges + aggregation of NODE-level values.

    Args:
      logits: [E_pad, H] attention logits.
      values_n: [N_src_pad, H, D] sender-side node values (edge e
        contributes ``values_n[sender_e]``).
      auxes: (aux_fwd, aux_rev) SpmmAux pair (the graph's ``spmm_aux``).
      ids: (receivers, senders, edge_mask) int/bool edge indexing.
      static_args: (n_dst_pad, n_src_pad).
      self_logits/self_values/dropout_masks: as
        :func:`edge_softmax_aggregate`.

    Returns [N_dst_pad, H, D].
    """
    out, _, _ = _fused_nodes_forward(logits, values_n, auxes, ids,
                                     static_args, self_logits, self_values,
                                     dropout_masks)
    return out


def _fused_nodes_forward(logits, values_n, auxes, ids, static_args,
                         self_logits, self_values, dropout_masks):
    aux, _ = auxes
    receivers, senders, edge_mask = ids
    mask_e = mask_self = None
    if dropout_masks is not None:
        mask_e, mask_self = dropout_masks
    n_pad = static_args[0]
    h_dim = logits.shape[1]
    logits = logits.astype(jnp.float32)     # f32 softmax state (see
    neg = jnp.asarray(-jnp.inf, logits.dtype)   # _dot_forward note)

    lg = jnp.where(edge_mask[:, None], logits, neg)
    lg_ext = jnp.concatenate([lg, jnp.full((1, h_dim), neg, lg.dtype)])
    if mask_e is not None:
        msk_ext = jnp.concatenate(
            [mask_e, jnp.zeros((1, h_dim), mask_e.dtype)])
    ys, ms, ss = [], [], []
    for h in range(h_dim):
        lg_grp = gather_1d(lg_ext[:, h], aux.edge_perm)      # [blk, BE]
        msk_grp = (gather_1d(msk_ext[:, h], aux.edge_perm)
                   if mask_e is not None else jnp.ones_like(lg_grp))
        v_grp = gather(values_n[:, h, :], aux.senders_grp)  # [blk, BE, D]
        y, m, s = _flash_grouped(v_grp, lg_grp, msk_grp, aux, n_pad)
        ys.append(y)
        ms.append(m)
        ss.append(s)
    num = jnp.stack(ys, axis=1)                           # [N, H, D]
    m = jnp.stack(ms, axis=1)                             # [N, H]
    den = jnp.stack(ss, axis=1)                           # [N, H]
    return _finalize_softmax(num, m, den, self_logits, self_values,
                             mask_self)


def _finalize_softmax(num, m, den, self_logits, self_values, mask_self):
    """Fold virtual self-loop terms into the flash outputs and normalize.

    The kernel's running max ``m`` never saw the self logits, so the
    accumulators are rescaled by ``exp(m - max(m, self_logits))`` first —
    overflow-safe for any self-logit magnitude. The output keeps the
    numerator's (value) dtype; m/den may be wider (f32 softmax state).
    """
    out_dtype = num.dtype
    if self_logits is not None:
        m_tot = jnp.maximum(m, self_logits)
        c = jnp.where(jnp.isneginf(m), 0.0, jnp.exp(m - m_tot))
        ex_self = jnp.exp(self_logits - m_tot)
        den = den * c + ex_self
        sv = (self_values if mask_self is None
              else self_values * mask_self[..., None])
        num = num * c[..., None] + ex_self[..., None] * sv
        mx = m_tot
    else:
        mx = m
    mx = jnp.where(jnp.isneginf(mx), 0.0, mx)
    den = jnp.maximum(den, jnp.finfo(out_dtype).tiny)
    return (num / den[..., None]).astype(out_dtype), mx, den


def _fused_nodes_fwd(logits, values_n, auxes, ids, static_args, self_logits,
                     self_values, dropout_masks=None):
    out, mx, den = _fused_nodes_forward(logits, values_n, auxes, ids,
                                        static_args, self_logits,
                                        self_values, dropout_masks)
    res = (logits, values_n, auxes, ids, self_logits, self_values, out, mx,
           den, dropout_masks)
    return out, res


def _fused_nodes_bwd(static_args, res, dy):
    (logits, values_n, auxes, ids, self_logits, self_values, out, mx, den,
     dropout_masks) = res
    aux, aux_rev = auxes
    receivers, senders, edge_mask = ids
    n_src_pad = static_args[1]
    mask_e = mask_self = None
    if dropout_masks is not None:
        mask_e, mask_self = dropout_masks
    h_dim = logits.shape[1]
    alpha_e = jnp.where(
        edge_mask[:, None],
        jnp.exp(jnp.where(edge_mask[:, None], logits, -jnp.inf)
                - gather(mx, receivers)) / gather(den, receivers),
        0.0)                                              # [E, H]
    m_alpha_e = alpha_e if mask_e is None else alpha_e * mask_e

    # node-level value gradient: dv_n[j] = Σ_{e: s_e=j} mα_e dy[r_e] — a
    # weighted scatter-matmul over the REVERSE grouping (whose senders_grp
    # stores the original receiver per slot).
    m_alpha_ext = jnp.concatenate(
        [m_alpha_e, jnp.zeros((1, h_dim), m_alpha_e.dtype)])
    dv_n = jnp.stack(
        [_scatter_grouped(gather(dy[:, h, :], aux_rev.senders_grp), aux_rev,
                          n_src_pad,
                          w_grp=gather_1d(m_alpha_ext[:, h], aux_rev.edge_perm),
                          interpret=_use_interpret())
         for h in range(h_dim)], axis=1)                  # [N_src, H, D]

    dy_e = gather(dy, receivers)                          # [E, H, D]
    v_e = gather(values_n, senders)                       # [E, H, D]
    s_n = jnp.sum(out * dy, -1)                           # [N, H]
    dl = (m_alpha_e * jnp.sum(v_e * dy_e, -1)
          - alpha_e * gather(s_n, receivers))
    if self_logits is not None:
        alpha_self = jnp.exp(self_logits - mx) / den      # [N, H]
        m_alpha_self = (alpha_self if mask_self is None
                        else alpha_self * mask_self)
        dsl = (m_alpha_self * jnp.sum(self_values * dy, -1)
               - alpha_self * s_n).astype(self_logits.dtype)
        dsv = (m_alpha_self[..., None] * dy).astype(self_values.dtype)
    else:
        dsl = dsv = None
    # primal-dtype cotangents (see _gatv2_bwd note)
    return (dl.astype(logits.dtype), dv_n.astype(values_n.dtype), None,
            None, dsl, dsv, None)


edge_softmax_aggregate_nodes.defvjp(_fused_nodes_fwd, _fused_nodes_bwd)
