"""Pallas TPU scatter-matmul: the SpMM hot path of message passing.

The reference's hottest op is ``propagate(copy_xj, g, +) == xj * A`` — a
sparse matmul (GNNlib/src/msgpass.jl:215-238, benchmarked at
GraphNeuralNetworks/perf/bench_gnn.jl). On TPU, random scatter-add wastes the
MXU; this kernel reformulates segment-sum over receiver-sorted edges as a
sequence of small **one-hot x message-block matmuls** that run on the MXU:

  for each edge block k (BE edges, receiver-sorted, grouped so a block never
  crosses a node-row-block boundary):
      one_hot[BN, BE] = (row_iota == local_receiver)          # VPU
      Y_block[BN, D] += one_hot @ M_block[BE, D]              # MXU

The grouping (``SpmmAux``) is computed once at graph construction on the
host: edges are bucketed by receiver-node block (BN rows per bucket) and each
bucket padded to a multiple of BE, so every edge block maps to exactly one
output row block — `PrefetchScalarGridSpec` feeds the per-block row index to
the output `index_map`, and consecutive grid steps hitting the same output
block accumulate in VMEM (TPU grids execute sequentially).

Gradient: ``d/dx [sum_{j->i} w_ji x_j]`` applied to dY is the same SpMM over
the **reverse** graph, so a ``custom_vjp`` keeps both directions on the MXU
(the reference relies on NNlib's gather<->scatter pullback pair; SURVEY
§3.3). The edge-weight gradient is an SDDMM computed edge-parallel.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["SpmmAux", "build_spmm_aux", "fixed_eblk_bound", "spmm",
           "spmm_gather_scatter", "BN", "BE", "BD"]


def fixed_eblk_bound(n_pad: int, e_pad: int, *, bn: int | None = None,
                     be: int | None = None) -> int:
    """Edge-block count sufficient for ANY edge distribution at the given
    capacities: each non-empty node block wastes < 1 block of padding and
    empty node blocks cost exactly 1."""
    bn = bn or BN
    be = be or BE
    return -(-e_pad // be) + max(1, -(-n_pad // bn))

# tile sizes: BN output rows x BE edges per block; features blocked by BD.
# BN=128 = one MXU pass per edge block (empirically fastest on v5e: the
# 256-row variant costs two passes for no bandwidth gain).
BN = 128
BE = 512
BD = 512


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpmmAux:
    """Receiver-block grouping of a sorted edge list (see module docstring).

    Arrays (static-shape, built host-side by :func:`build_spmm_aux`):
      block_rows: int32[n_eblk] — output node-block index per edge block
        (non-decreasing).
      senders_grp: int32[n_eblk, BE] — original sender per grouped edge slot
        (dummy slots point at row 0; killed by recv_local == -1).
      recv_local: int32[n_eblk, BE] — receiver minus block start, or -1 for
        dummy/padding slots (never matches the one-hot iota).
      edge_perm: int32[n_eblk, BE] — original edge index per slot (E_pad for
        dummies) for gathering per-edge weight/message arrays.
      edge_slot: int32[E_pad] — inverse of edge_perm: flat grouped-slot index
        per original edge (n_eblk*BE, i.e. one-past-the-end, for padded
        edges). Lets edge-order results come back from grouped kernels via a
        GATHER instead of a pathological scatter.
    """

    block_rows: jax.Array
    senders_grp: jax.Array
    recv_local: jax.Array
    edge_perm: jax.Array
    edge_slot: jax.Array

    @property
    def n_eblk(self) -> int:
        return self.block_rows.shape[0]


def build_spmm_aux(receivers, senders, num_edges: int, n_pad: int,
                   *, bn: int = BN, be: int = BE,
                   orig_ids=None, fixed_n_eblk: int | None = None) -> SpmmAux:
    """Host-side grouping: bucket sorted edges by receiver block, pad each
    bucket to a multiple of ``be`` edges (worst-case overhead: be-1 slots per
    non-empty node block). ``orig_ids`` maps input order to original edge ids
    (for reverse-direction groupings whose input is a permutation).
    ``e_pad`` for dummy slots is taken from the receivers capacity.

    ``fixed_n_eblk`` pads the grouping with trailing all-dummy edge blocks to
    a FIXED block count so auxes of different graphs with the same
    (n_pad, e_pad) share one jit trace (minibatch pipelines).
    ``fixed_eblk_bound(n_pad, e_pad)`` is always sufficient."""
    receivers = np.asarray(receivers)
    senders = np.asarray(senders)
    e_pad = receivers.shape[0]
    r = receivers[:num_edges]
    s = senders[:num_edges]
    ids = (np.arange(num_edges, dtype=np.int32) if orig_ids is None
           else np.asarray(orig_ids, np.int32)[:num_edges])
    if num_edges > 1 and np.any(np.diff(r) < 0):
        raise ValueError("build_spmm_aux requires receiver-sorted edges")
    n_nblk = max(1, -(-n_pad // bn))

    # Fully vectorized (no per-node-block Python loop — matters at
    # ogbn-scale where n_nblk is in the tens of thousands).
    bounds = np.searchsorted(r, np.arange(0, n_nblk + 1) * bn)
    cnt = np.diff(bounds)                              # edges per node block
    # node blocks with zero edges still get one all-dummy edge block so the
    # kernel zero-initializes their output rows (pallas outputs are
    # uninitialized unless written).
    nb = np.maximum(1, -(-cnt // be))                  # edge blocks per node
    slot_base = np.concatenate([[0], np.cumsum(nb * be)])[:-1]
    total = int(np.sum(nb)) * be

    senders_flat = np.zeros(total, np.int32)
    recv_flat = np.full(total, -1, np.int32)
    perm_flat = np.full(total, e_pad, np.int32)
    slot_of_edge = np.full(e_pad, total, np.int32)
    if num_edges:
        # edges are sorted by receiver (hence by node block), so the
        # per-edge block offset is a repeat over blocks — no per-edge
        # fancy-index gathers. int32 arithmetic when the slot space fits
        # (halves host memory bandwidth, the bottleneck on this path).
        dt = np.int32 if total < 2**31 else np.int64
        dest = (np.repeat((slot_base - bounds[:-1]).astype(dt), cnt)
                + np.arange(num_edges, dtype=dt))
        senders_flat[dest] = s
        recv_flat[dest] = r % bn
        perm_flat[dest] = ids
        slot_of_edge[ids] = dest
    rows = np.repeat(np.arange(n_nblk, dtype=np.int32), nb)

    if fixed_n_eblk is not None:
        n_eblk = total // be
        if n_eblk > fixed_n_eblk:
            raise ValueError(f"grouping needs {n_eblk} edge blocks > "
                             f"fixed_n_eblk={fixed_n_eblk}")
        extra = fixed_n_eblk - n_eblk
        if extra:
            # trailing dummy blocks repeat the LAST row index, so the reset
            # logic never re-zeroes a visited output block
            senders_flat = np.concatenate(
                [senders_flat, np.zeros(extra * be, np.int32)])
            recv_flat = np.concatenate(
                [recv_flat, np.full(extra * be, -1, np.int32)])
            perm_flat = np.concatenate(
                [perm_flat, np.full(extra * be, e_pad, np.int32)])
            rows = np.concatenate(
                [rows, np.full(extra, rows[-1], np.int32)])

    return SpmmAux(
        block_rows=jnp.asarray(rows),
        senders_grp=jnp.asarray(senders_flat.reshape(-1, be)),
        recv_local=jnp.asarray(recv_flat.reshape(-1, be)),
        edge_perm=jnp.asarray(perm_flat.reshape(-1, be)),
        edge_slot=jnp.asarray(slot_of_edge),
    )


def _device_grouping(r_sorted, s_sorted, ids, num_edges, n_pad: int,
                     n_eblk: int, *, bn: int = BN, be: int = BE) -> SpmmAux:
    """All-device build_spmm_aux (fixed shapes; traced edge count).

    Same grouping as :func:`build_spmm_aux`, expressed in jnp so the
    minibatch pipeline never ships the ~10MB aux arrays host->device: the
    loader sends only the raw COO index arrays and the jitted train step
    derives the grouping on-chip (searchsorted/cumsum/scatter over fixed
    shapes — microseconds on the VPU vs tens of ms of host build +
    PCIe/tunnel transfer).

    ``r_sorted`` must be ascending with padded edges pointing at the dummy
    node n_pad-1 (the graph() builder invariant), ``ids`` maps slot order to
    original edge ids.
    """
    e_pad = r_sorted.shape[0]
    n_nblk = max(1, -(-n_pad // bn))
    r32 = r_sorted.astype(jnp.int32)
    bounds = jnp.searchsorted(
        r32, jnp.arange(0, (n_nblk + 1) * bn, bn, dtype=jnp.int32))
    cnt = jnp.diff(bounds)                          # edges per node block
    nb = jnp.maximum(1, -(-cnt // be))              # edge blocks per node blk
    slot_base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nb * be).astype(jnp.int32)]
    )[:-1]
    total = n_eblk * be

    blk = r32 // bn
    i = jnp.arange(e_pad, dtype=jnp.int32)
    mask = i < num_edges
    dest = slot_base[blk] + (i - bounds[blk].astype(jnp.int32))
    dest = jnp.where(mask, dest, total)             # OOB -> dropped scatter

    senders_flat = jnp.zeros((total,), jnp.int32) \
        .at[dest].set(s_sorted.astype(jnp.int32), mode="drop")
    recv_flat = jnp.full((total,), -1, jnp.int32) \
        .at[dest].set(r32 % bn, mode="drop")
    perm_flat = jnp.full((total,), e_pad, jnp.int32) \
        .at[dest].set(ids.astype(jnp.int32), mode="drop")
    slot_of_edge = jnp.full((e_pad,), total, jnp.int32) \
        .at[ids].set(jnp.where(mask, dest, total), mode="drop")
    # trailing pad blocks repeat the LAST row index (jnp.repeat pads with the
    # final element), so the kernel reset logic never re-zeroes a visited row
    rows = jnp.repeat(jnp.arange(n_nblk, dtype=jnp.int32), nb,
                      total_repeat_length=n_eblk)
    return SpmmAux(
        block_rows=rows,
        senders_grp=senders_flat.reshape(-1, be),
        recv_local=recv_flat.reshape(-1, be),
        edge_perm=perm_flat.reshape(-1, be),
        edge_slot=slot_of_edge,
    )


def device_spmm_aux(g, *, fixed_n_eblk: int | None = None):
    """Attach an on-device-built (aux_fwd, aux_rev) pair to ``g`` under jit.

    Drop-in replacement for ``graph(..., build_spmm_aux=True)`` for the
    sampled-minibatch pipeline: call INSIDE the jitted step on a graph built
    with ``build_spmm_aux=False``. Requires the builder's receiver-sorted /
    dummy-padded invariants.
    """
    bound = fixed_eblk_bound(g.n_pad, g.e_pad)
    if fixed_n_eblk is not None and fixed_n_eblk < bound:
        # the device grouping scatters with mode="drop": an undersized block
        # count would silently drop real edges (the host builder raises for
        # the same condition) — both quantities are static, so check here
        raise ValueError(
            f"fixed_n_eblk={fixed_n_eblk} < fixed_eblk_bound(n_pad="
            f"{g.n_pad}, e_pad={g.e_pad})={bound}: some edge distribution "
            "at these capacities would not fit the grouping")
    n_eblk = fixed_n_eblk or bound
    ids_fwd = jnp.arange(g.e_pad, dtype=jnp.int32)
    aux_fwd = _device_grouping(g.receivers, g.senders, ids_fwd,
                               g.num_edges, g.n_pad, n_eblk)
    # reverse grouping: sort by sender (dummy edges already point at the
    # dummy node and sort last under a stable key)
    key = jnp.where(g.edge_mask, g.senders.astype(jnp.int32), g.n_pad - 1)
    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    rev_r = g.senders[order]
    rev_s = g.receivers[order]
    aux_rev = _device_grouping(rev_r, rev_s, order, g.num_edges, g.n_pad,
                               n_eblk)
    return g.replace(spmm_aux=(aux_fwd, aux_rev))


def _scatter_kernel(block_rows_ref, recv_ref, w_ref, m_ref, out_ref):
    """One grid step: accumulate one edge block into its output row block.

    Edge weights are folded into the one-hot matrix (free on the VPU), so the
    weighted SpMM costs the same as the unweighted one — no materialized
    ``w * messages`` intermediate.
    """
    k = pl.program_id(1)
    b = block_rows_ref[k]
    prev = block_rows_ref[jnp.maximum(k - 1, 0)]
    is_first = jnp.logical_or(k == 0, b != prev)

    @pl.when(is_first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    recv = recv_ref[0]                                    # [1, BE] int32
    rows = jax.lax.broadcasted_iota(jnp.int32,
                                    (out_ref.shape[0], recv.shape[1]), 0)
    one_hot = (rows == recv).astype(m_ref.dtype)          # [BN, BE]
    one_hot = one_hot * w_ref[0]                          # [BN,BE]*[1,BE]
    out_ref[:] += jax.lax.dot(
        one_hot, m_ref[:], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _scatter_grouped(values_grp: jax.Array, aux: SpmmAux, n_pad: int,
                     *, w_grp: jax.Array | None = None,
                     interpret: bool = False) -> jax.Array:
    """Sum grouped edge values [n_eblk, BE, D] into node rows [n_pad, D].

    ``w_grp``: optional [n_eblk, BE] per-edge weights folded into the one-hot
    scatter matrix inside the kernel.
    """
    n_eblk, be, d = values_grp.shape
    n_nblk = -(-n_pad // BN)
    bd = min(max(d, 128), BD)
    d_padded = -(-d // bd) * bd
    if d_padded != d:
        values_grp = jnp.pad(values_grp,
                             ((0, 0), (0, 0), (0, d_padded - d)))
    n_dblk = d_padded // bd
    vflat = values_grp.reshape(n_eblk * be, d_padded)
    if w_grp is None:
        w_grp = jnp.ones((n_eblk, be), values_grp.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_dblk, n_eblk),
        in_specs=[
            # [n_eblk, 1, BE] so the trailing two block dims are
            # (1, BE) == the array's own trailing dims (TPU tiling rule).
            pl.BlockSpec((1, 1, be), lambda j, k, br: (k, 0, 0)),
            pl.BlockSpec((1, 1, be), lambda j, k, br: (k, 0, 0)),
            pl.BlockSpec((be, bd), lambda j, k, br: (k, j)),
        ],
        out_specs=pl.BlockSpec((BN, bd), lambda j, k, br: (br[k], j)),
    )
    out = pl.pallas_call(
        _scatter_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_nblk * BN, d_padded),
                                       values_grp.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_eblk * be * BN * d_padded,
            bytes_accessed=(n_eblk * be * d_padded + n_nblk * BN * d_padded)
            * values_grp.dtype.itemsize,
            transcendentals=0,
        ),
    )(aux.block_rows, aux.recv_local[:, None, :],
      w_grp[:, None, :].astype(values_grp.dtype), vflat)
    return out[:n_pad, :d]


def _scatter_sddmm_kernel(block_rows_ref, recv_ref, w_ref, m_ref, x_ref,
                          out_ref, dots_ref):
    """Fused dx + dw sweep for the weighted-SpMM backward (reverse grouping).

    Per edge block: accumulates the weighted scatter-matmul into the output
    row block (``dx[s] += w_e dy[r_e]`` — identical to ``_scatter_kernel``)
    AND computes the per-slot SDDMM dots ``dw_slot = <dy[r_e], x[s_e]>``,
    where the x rows ride the output block index (x_ref) and are distributed
    to edge slots by one more one-hot MXU matmul. One kernel sweep replaces
    the round-3 separate grouped-SDDMM pass (7.9 ms at 2M/128) and the
    [slots, D] forward-values VJP residual (~1 GB) it consumed.
    """
    k = pl.program_id(1)
    b = block_rows_ref[k]
    prev = block_rows_ref[jnp.maximum(k - 1, 0)]
    is_first = jnp.logical_or(k == 0, b != prev)

    @pl.when(is_first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    recv = recv_ref[0]                                    # [1, BE] int32
    rows = jax.lax.broadcasted_iota(jnp.int32,
                                    (out_ref.shape[0], recv.shape[1]), 0)
    hit = rows == recv                                    # [BN, BE]
    one_hot = hit.astype(m_ref.dtype) * w_ref[0]          # [BN,BE]*[1,BE]
    out_ref[:] += jax.lax.dot(
        one_hot, m_ref[:], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)
    # x rows -> slots: dead slots (recv == -1) hit nothing and get 0.
    # The dots output carries a per-feature-block axis (indexed by j), so
    # each grid step owns a fresh write-once block: with j as the OUTER grid
    # dim, a (k)-only dots block would be revisited at non-consecutive
    # steps, which TPU output revisit semantics don't accumulate across
    # (the partial sums over j are reduced after the pallas_call instead).
    cols = jax.lax.broadcasted_iota(jnp.int32,
                                    (recv.shape[1], out_ref.shape[0]), 1)
    oh_t = (cols == recv[0][:, None]).astype(jnp.float32)  # [BE, BN]
    x_slot = jax.lax.dot(oh_t, x_ref[:].astype(jnp.float32),
                         preferred_element_type=jnp.float32)
    dots_ref[0, 0, 0] = jnp.sum(x_slot * m_ref[:].astype(jnp.float32),
                                axis=1)


def _scatter_grouped_sddmm(values_grp, x, aux: SpmmAux, n_pad: int,
                           *, w_grp, interpret: bool = False):
    """Weighted scatter of grouped rows + per-slot endpoint dots, fused.

    values_grp: [n_eblk, BE, D] grouped dy rows; ``x``: [N_pad(+), D] whose
    rows ride the output block. Returns (dx [n_pad, D],
    dots [n_eblk, BE] f32) with ``dots_slot = <values_slot, x[out_row]>``
    UNWEIGHTED (the dw SDDMM) while dx folds ``w_grp`` as usual.
    """
    n_eblk, be, d = values_grp.shape
    n_nblk = -(-n_pad // BN)
    bd = min(max(d, 128), BD)
    d_padded = -(-d // bd) * bd
    if d_padded != d:
        values_grp = jnp.pad(values_grp,
                             ((0, 0), (0, 0), (0, d_padded - d)))
        x = jnp.pad(x, ((0, 0), (0, d_padded - d)))
    if x.shape[0] < n_nblk * BN:
        x = jnp.pad(x, ((0, n_nblk * BN - x.shape[0]), (0, 0)))
    n_dblk = d_padded // bd
    vflat = values_grp.reshape(n_eblk * be, d_padded)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_dblk, n_eblk),
        in_specs=[
            pl.BlockSpec((1, 1, be), lambda j, k, br: (k, 0, 0)),
            pl.BlockSpec((1, 1, be), lambda j, k, br: (k, 0, 0)),
            pl.BlockSpec((be, bd), lambda j, k, br: (k, j)),
            pl.BlockSpec((BN, bd), lambda j, k, br: (br[k], j)),
        ],
        out_specs=[
            pl.BlockSpec((BN, bd), lambda j, k, br: (br[k], j)),
            pl.BlockSpec((1, 1, 1, be), lambda j, k, br: (j, k, 0, 0)),
        ],
    )
    out, dots = pl.pallas_call(
        _scatter_sddmm_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_nblk * BN, d_padded), values_grp.dtype),
            jax.ShapeDtypeStruct((n_dblk, n_eblk, 1, be), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * n_eblk * be * BN * d_padded,
            bytes_accessed=(n_eblk * be * d_padded
                            + 2 * n_nblk * BN * d_padded)
            * values_grp.dtype.itemsize,
            transcendentals=0,
        ),
    )(aux.block_rows, aux.recv_local[:, None, :],
      w_grp[:, None, :].astype(values_grp.dtype), vflat, x)
    return out[:n_pad, :d], jnp.sum(dots, axis=0)[:, 0, :]


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# public entry points with custom VJP (backward = kernel on reverse graph)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def spmm_gather_scatter(x, w, auxes, n_pads):
    """Y[i] = sum over edges j->i of w_e * x[j] via the Pallas kernel.

    Args:
      x: [N_src_pad, D] node features.
      w: [E_pad + 1] per-edge weights with a trailing zero slot for dummy
        edges, or None for unweighted.
      auxes: (aux_fwd, aux_rev) SpmmAux pair; the reverse grouping drives the
        VJP.
      n_pads: static (n_dst_pad, n_src_pad).
    """
    return _spmm_impl(x, w, auxes[0], n_pads[0])


def _spmm_impl(x, w, aux: SpmmAux, n_dst_pad: int):
    from ..segment import gather, gather_1d
    vals = gather(x, aux.senders_grp)              # [n_eblk, BE, D]
    w_grp = None if w is None else gather_1d(w, aux.edge_perm)
    return _scatter_grouped(vals, aux, n_dst_pad, w_grp=w_grp,
                            interpret=_use_interpret())


def _spmm_fwd(x, w, auxes, n_pads):
    return spmm_gather_scatter(x, w, auxes, n_pads), (x, w, auxes)


def _spmm_bwd(n_pads, res, dy):
    from ..segment import gather, gather_1d
    x, w, auxes = res
    aux_fwd, aux_rev = auxes
    if w is None:
        return _spmm_impl(dy, w, aux_rev, n_pads[1]), None, None
    # dx and dw share ONE pass over the reverse grouping: the dy rows are
    # gathered once (the descriptor-rate-bound cost, GATHER_STUDY.md), the
    # kernel scatter-matmuls them into dx with the w fold AND computes the
    # SDDMM dots dw_e = <dy[r_e], x[s_e]> in-slot — the x rows ride the
    # output block index, so dw adds one in-kernel matmul, not a second
    # sweep. (History: edge-order endpoint regathers 42 ms -> separate
    # grouped SDDMM ~12 ms -> this fused pass, at 2M edges / D=128.)
    dy_grp = gather(dy, aux_rev.senders_grp)
    w_grp = gather_1d(w, aux_rev.edge_perm)
    dx, dots_grp = _scatter_grouped_sddmm(dy_grp, x, aux_rev, n_pads[1],
                                          w_grp=w_grp,
                                          interpret=_use_interpret())
    flat = jnp.concatenate([dots_grp.reshape(-1),
                            jnp.zeros((1,), dots_grp.dtype)])
    dots = gather_1d(flat, aux_rev.edge_slot)             # [E_pad]
    dw = jnp.concatenate([dots.astype(w.dtype),
                          jnp.zeros((1,), w.dtype)])
    return dx, dw, None


spmm_gather_scatter.defvjp(_spmm_fwd, _spmm_bwd)


def spmm(g, x, *, edge_weight=None, weighted: bool = False):
    """``propagate(copy_xj | w_mul_xj, g, +)`` on the Pallas path.

    Requires ``g.spmm_aux`` (pass ``build_spmm_aux=True`` to ``graph(...)``).
    """
    if g.spmm_aux is None:
        raise ValueError("graph has no spmm_aux; build with "
                         "graph(..., build_spmm_aux=True)")
    ev = getattr(g, "edge_valid", None)
    if weighted or edge_weight is not None or ev is not None:
        # edge_valid graphs (device-sampled) have scattered invalid slots
        # the grouping can't know about — kill them via the (free) weight
        # fold even on the "unweighted" path
        w = edge_weight if edge_weight is not None else g.edge_weight
        if w is None:
            w = jnp.ones((g.e_pad,), x.dtype)
        w = jnp.where(g.edge_mask, w, 0).astype(x.dtype)
        w = jnp.concatenate([w, jnp.zeros((1,), w.dtype)])
    else:
        w = None
    return spmm_gather_scatter(x, w, g.spmm_aux, (g.n_pad, x.shape[0]))
