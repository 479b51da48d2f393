"""Pallas TPU SDDMM: per-edge dot of endpoint features.

The score step of every attention layer is ``dot(x_i[r_e], x_j[s_e])``
(`xi_dot_xj`, GNNlib/src/msgpass.jl:159-208; the GAT stack SURVEY §3.2).
Lowered naively this is two [E, D] gathers + an elementwise reduce — 2·E·D·4
bytes of HBM traffic, and the sender gather is random-access. This kernel
reuses the SpMM receiver-block grouping (ops/pallas/spmm.py): per edge block,
the receiver-side rows arrive as the *output row block* (contiguous, free)
and get distributed to edge slots by a one-hot matmul on the MXU, so only the
sender side pays a gather:

  oh_t[BE, BN]   = (recv_local == col_iota)                 # VPU
  xi_slot[BE, D] = oh_t @ Xi_block[BN, D]                   # MXU
  out[BE]       += sum(xi_slot * Xj_grp[BE, D], axis=-1)    # VPU

Gradient is two weighted SpMMs (d xi = Σ_e dl_e x_j[s_e] over receivers,
d xj = Σ_e dl_e x_i[r_e] over senders), both on the existing scatter-matmul
kernel — a ``custom_vjp`` keeps everything on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..segment import gather, gather_1d
from .spmm import BD, BN, SpmmAux, _scatter_grouped, _use_interpret

__all__ = ["sddmm"]


def _sddmm_kernel(block_rows_ref, recv_ref, xi_ref, xjg_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    recv = recv_ref[0, 0]                                 # [BE]
    cols = jax.lax.broadcasted_iota(jnp.int32,
                                    (recv.shape[0], xi_ref.shape[0]), 1)
    oh_t = (cols == recv[:, None]).astype(xi_ref.dtype)   # [BE, BN]
    xi_slot = jax.lax.dot(oh_t, xi_ref[:],
                          preferred_element_type=jnp.float32)
    out_ref[0, 0, :] += jnp.sum(
        xi_slot * xjg_ref[:].astype(jnp.float32), axis=1
    ).astype(out_ref.dtype)


def _sddmm_grouped(xi: jax.Array, xjg_flat: jax.Array, aux: SpmmAux,
                   *, interpret: bool | None = None) -> jax.Array:
    """Grouped per-edge dots.

    xi: [n_nblk*BN, d_pad] receiver-side rows (padded); xjg_flat:
    [n_eblk*BE, d_pad] grouped sender rows. Returns [n_eblk, BE] dots
    (garbage 0 at dummy slots).
    """
    if interpret is None:
        interpret = _use_interpret()
    n_eblk = aux.n_eblk
    be = aux.senders_grp.shape[1]
    d_pad = xi.shape[1]
    bd = min(d_pad, BD)
    n_dblk = d_pad // bd

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_eblk, n_dblk),
        in_specs=[
            pl.BlockSpec((1, 1, be), lambda k, j, br: (k, 0, 0)),
            pl.BlockSpec((BN, bd), lambda k, j, br: (br[k], j)),
            pl.BlockSpec((be, bd), lambda k, j, br: (k, j)),
        ],
        out_specs=pl.BlockSpec((1, 1, be), lambda k, j, br: (k, 0, 0)),
    )
    out = pl.pallas_call(
        _sddmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_eblk, 1, be), xi.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_eblk * be * BN * d_pad + n_eblk * be * d_pad,
            bytes_accessed=(n_eblk * be * d_pad * 2) * xi.dtype.itemsize,
            transcendentals=0,
        ),
    )(aux.block_rows, aux.recv_local[:, None, :], xi, xjg_flat)
    return out[:, 0, :]


def _pad_rows(x: jax.Array, rows: int) -> jax.Array:
    if x.shape[0] == rows:
        return x
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, 0)))


def _pad_cols(x: jax.Array, bd: int) -> jax.Array:
    d_pad = -(-x.shape[1] // bd) * bd
    if d_pad == x.shape[1]:
        return x
    return jnp.pad(x, ((0, 0), (0, d_pad - x.shape[1])))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sddmm(xi, xj, auxes, static_args):
    """Per-edge ``dot(xi[r_e], xj[s_e])`` on the grouped Pallas kernel.

    Args:
      xi: [N_dst_pad, D] receiver-side node features.
      xj: [N_src_pad, D] sender-side node features.
      auxes: (aux_fwd, aux_rev) SpmmAux pair (the graph's ``spmm_aux``).
      static_args: (e_pad,) static edge capacity.

    Returns [E_pad] dots in original edge order (0 at padded edges).
    """
    return _sddmm_impl(xi, xj, auxes[0], static_args[0])


def _sddmm_impl(xi, xj, aux: SpmmAux, e_pad: int):
    be = aux.senders_grp.shape[1]
    bd = min(max(xi.shape[1], 128), BD)
    xi_p = _pad_cols(xi, bd)
    xj_p = _pad_cols(xj, bd)
    # receiver rows must cover every node block the grouping touches
    n_nblk = ((xi_p.shape[0] + BN - 1) // BN)
    xi_p = _pad_rows(xi_p, n_nblk * BN)
    xjg = gather(xj_p, aux.senders_grp)                   # [n_eblk, BE, D]
    dots_grp = _sddmm_grouped(xi_p, xjg.reshape(-1, xi_p.shape[1]), aux)
    # ungroup to edge order by GATHERING through the precomputed inverse
    # permutation (padded edges index the appended zero) — a scatter here
    # costs ~10x (TPU scatter pathology; measured on the 2M-edge config).
    flat = jnp.concatenate([dots_grp.reshape(-1), jnp.zeros((1,), xi.dtype)])
    return gather_1d(flat, aux.edge_slot)


def _sddmm_fwd(xi, xj, auxes, static_args):
    return sddmm(xi, xj, auxes, static_args), (xi, xj, auxes)


def _sddmm_bwd(static_args, res, dl):
    xi, xj, auxes = res
    aux_fwd, aux_rev = auxes
    dl_ext = jnp.concatenate([dl, jnp.zeros((1,), dl.dtype)])
    # d xi[r] = Σ_{e: r_e=r} dl_e xj[s_e]  — weighted SpMM, forward grouping
    dxi = _scatter_grouped(
        gather(xj, aux_fwd.senders_grp), aux_fwd, xi.shape[0],
        w_grp=gather_1d(dl_ext, aux_fwd.edge_perm), interpret=_use_interpret())
    # d xj[s] = Σ_{e: s_e=s} dl_e xi[r_e]  — weighted SpMM, reverse grouping
    dxj = _scatter_grouped(
        gather(xi, aux_rev.senders_grp), aux_rev, xj.shape[0],
        w_grp=gather_1d(dl_ext, aux_rev.edge_perm), interpret=_use_interpret())
    return dxi, dxj, None


sddmm.defvjp(_sddmm_fwd, _sddmm_bwd)
