"""Structured gathers: beat the TPU gather engine on *structured* index maps.

The chip's random row-gather is descriptor-rate bound at ~2.76 ns per row
regardless of index locality, table size, dtype or width <= 512 B
(benchmarks/GATHER_STUDY.md) — so a [2M] scalar "ungroup" costs as much as a
[2M, 128] feature gather (~5.4 ms). But the framework's hottest index maps
are not random:

- ``SpmmAux.edge_perm`` / ``edge_slot`` (grouped-slot <-> edge-order) are
  **piecewise incrementing**: runs break only at node-block boundaries and
  padding slots (ops/pallas/spmm.py:build_spmm_aux computes
  ``dest = slot_base[blk] + (i - bounds[blk])``, affine in ``i`` per block).
- ``receivers`` in edge order is **sorted**, i.e. piecewise *constant*.

Both decompose into K pieces per fixed-width chunk, with K small and known
at aux-build time:

  run mode:   out[j*CH + l] = src[start_r(j) + l]    for l in piece r
  const mode: out[j*CH + l] = src[idx_r(j)]          for l in piece r

MEASURED VERDICT (GATHER_STUDY.md p10): run mode LOSES on TPU — XLA lowers
slice-gathers (slice_sizes > 1) to a ~3.6 us/slice sequential path, not the
descriptor engine — so only **const mode** is production-useful (~1.5× on
sorted `receivers` gathers: its reads are ordinary 1-row descriptors, K per
chunk instead of CH). Run mode is kept for documentation/regression of the
measurement and for non-TPU backends.

Reference parity note: the reference has no analog (NNlib gather is the CUDA
gather, GNNGraphs/src/gatherscatter.jl); this is TPU-specific descriptor
engineering.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["RunMeta", "build_run_meta", "run_gather"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RunMeta:
    """Piecewise-gather plan over fixed CH-wide output chunks.

    starts: int32[n_chunks, K] — per piece: front-pad-shifted source offset.
      In ``run`` mode this is ``src_index_at_piece_start - lane + CH`` (so
      lane l of the chunk reads ``src_padded[starts + l]``); a piece whose
      source is the dummy index reads the front zero pad (starts == 0).
      In ``const`` mode it is ``src_index + 1`` (0 = the front zero row).
    bounds: int32[n_chunks, K] — first output lane of piece r. bounds[:, 0]
      is 0; unused trailing pieces have bounds == CH (never selected).

    Static: ch (chunk width), const (True = piecewise-constant mode),
    out_len (unpadded output length).
    """

    starts: jax.Array
    bounds: jax.Array
    ch: int = dataclasses.field(metadata=dict(static=True), default=128)
    const: bool = dataclasses.field(metadata=dict(static=True), default=False)
    out_len: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def k(self) -> int:
        return self.starts.shape[1]


def build_run_meta(p, *, ch: int, dummy_idx=None, const: bool = False,
                   k_cap: int = 32) -> RunMeta | None:
    """Host-side plan for ``out[i] = src[p[i]]`` (0 where p == dummy_idx).

    Returns None when some chunk needs more than ``k_cap`` pieces (caller
    falls back to a plain gather). Fully vectorized — runs at aux-build time
    on multi-million-edge graphs.
    """
    p = np.asarray(p, np.int64).reshape(-1)
    m = p.shape[0]
    if m == 0:
        return None
    m_pad = -(-m // ch) * ch
    if m_pad != m:
        pad_val = dummy_idx if dummy_idx is not None else p[-1]
        p = np.concatenate([p, np.full(m_pad - m, pad_val, np.int64)])
    lanes = np.arange(m_pad, dtype=np.int64) % ch
    if const:
        f = p + 1                              # front zero row at index 0
    else:
        f = p - lanes + ch                     # front zero pad of CH
    if dummy_idx is not None:
        f = np.where(p == dummy_idx, 0, f)

    is_break = np.ones(m_pad, bool)
    is_break[1:] = f[1:] != f[:-1]
    is_break[::ch] = True
    pos = np.flatnonzero(is_break)             # piece start positions
    chunk_of = pos // ch
    # rank of each piece within its chunk
    first = np.searchsorted(chunk_of, np.arange(m_pad // ch))
    counts = np.diff(np.concatenate([first, [pos.shape[0]]]))
    k = int(counts.max())
    if k > k_cap:
        return None
    rank = np.arange(pos.shape[0]) - np.repeat(first, counts)

    n_chunks = m_pad // ch
    starts = np.zeros((n_chunks, k), np.int64)
    bounds = np.full((n_chunks, k), ch, np.int64)
    starts[chunk_of, rank] = f[pos]
    bounds[chunk_of, rank] = pos % ch
    return RunMeta(starts=jnp.asarray(starts, jnp.int32),
                   bounds=jnp.asarray(bounds, jnp.int32),
                   ch=ch, const=const, out_len=m)


def run_gather(src: jax.Array, meta: RunMeta) -> jax.Array:
    """Apply a :class:`RunMeta` plan: ``out[i] = src[p[i]]`` (0 at dummies).

    ``src``: [L] or [L, D]. Returns [out_len] / [out_len, D]. Out-of-range
    sources are the caller's bug (the plan was built from explicit indices).
    """
    ch, k = meta.ch, meta.k
    n_chunks = meta.starts.shape[0]
    scalar = src.ndim == 1
    s2 = src[:, None] if scalar else src
    d = s2.shape[1]
    if meta.const:
        src_p = jnp.concatenate([jnp.zeros((1, d), s2.dtype), s2])
        rows = src_p[meta.starts.reshape(-1)]          # [n_chunks*K, D]
        rows = rows.reshape(n_chunks, k, d)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, ch), 1)
        out = jnp.broadcast_to(rows[:, 0, None, :], (n_chunks, ch, d))
        for r in range(1, k):
            sel = (lane >= meta.bounds[:, r][:, None])[..., None]
            out = jnp.where(sel, rows[:, r, None, :], out)
    else:
        src_p = jnp.concatenate([
            jnp.zeros((ch, d), s2.dtype), s2,
            jnp.zeros((2 * ch, d), s2.dtype)])

        def piece(starts_r):
            return jax.vmap(
                lambda s: jax.lax.dynamic_slice(
                    src_p, (s, jnp.zeros((), s.dtype)), (ch, d))
            )(starts_r)                                # [n_chunks, ch, d]

        out = piece(meta.starts[:, 0])
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, ch), 1)
        for r in range(1, k):
            sel = (lane >= meta.bounds[:, r][:, None])[..., None]
            out = jnp.where(sel, piece(meta.starts[:, r]), out)
    out = out.reshape(n_chunks * ch, d)[:meta.out_len]
    return out[:, 0] if scalar else out
