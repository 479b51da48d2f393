"""Host-side graph partitioning for multi-chip full-graph training.

The reference has NO distributed execution (SURVEY §2.6) — this subsystem is
the net-new, TPU-native capability: **edge-partitioned message passing with
halo exchange over ICI**. Nodes are assigned to mesh-axis shards; each edge
lives on its receiver's shard; senders owned by other shards are fetched via
a single `all_to_all` of the halo node set (parallel/shard.py), overlapping
with local aggregation under XLA's scheduler.

All per-shard arrays are padded to uniform (n_local, e_local, h_max) shapes
and stacked on a leading shard axis, so one `shard_map` program serves every
shard.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import GraphTuple, round_up

__all__ = ["PartitionedGraph", "partition_graph", "partition_nodes",
           "union_capacities"]


def union_capacities(*pgs) -> dict:
    """Elementwise-max capacity kwargs over probe partitions.

    Data-parallel replicas must share one static shape to stack
    (:func:`~.shard.stack_partitions`): partition each replica once to
    probe its minima, take the union, re-partition with these kwargs.
    Covers the owned/remote split capacities too (e_own/e_rem/h_rem).
    """
    caps = dict(n_local=max(p.n_local for p in pgs),
                e_local=max(p.e_local for p in pgs),
                h_max=max(p.h_max for p in pgs))
    if all(p.own_recv is not None for p in pgs):
        caps.update(e_own=max(p.e_own for p in pgs),
                    e_rem=max(p.e_rem for p in pgs),
                    h_rem=max(p.h_rem for p in pgs))
    return caps


def partition_nodes(senders, receivers, num_nodes: int, num_parts: int, *,
                    balance: float = 1.05, refine_sweeps: int = 16,
                    seed: int = 0) -> np.ndarray:
    """Locality-aware node->shard assignment (host-side, numpy-only).

    Balanced multi-seed BFS growth followed by LDG-style refinement sweeps
    (Stanton & Kliot's linear deterministic greedy objective: move a node to
    the part holding most of its neighbors, damped by a balance cap). Finds
    community/locality structure regardless of node ordering — contiguous
    ranges (the ``partition_graph`` default) only preserve locality already
    present in the ids.

    The result plugs into ``partition_graph(parts=...)``; communication
    volume of the halo exchange is proportional to the edge cut this
    produces. On graphs with community structure the cut drops to the
    inter-community edge fraction; on Erdos-Renyi random graphs NO
    partitioner can beat ~(P-1)/P (expander lower bound) — see
    benchmarks/PARTITION_STUDY.md.

    Args:
      senders/receivers: int[E] directed edge endpoints (treated
        undirected for locality).
      balance: max part size as a multiple of num_nodes/num_parts.
      refine_sweeps: LDG refinement passes (each O(E) numpy; 16 sweeps
        reach within ~20% of the oracle cut on 64-community SBM graphs
        - measured r5: 0.407 at 4 sweeps -> 0.209 at 16, oracle 0.175).

    Returns int32[num_nodes] part ids, every part <= ceil(balance * N/P).
    """
    npart = int(num_parts)
    nn = int(num_nodes)
    if npart <= 1:
        return np.zeros(nn, np.int32)
    s = np.asarray(senders, np.int64).ravel()
    r = np.asarray(receivers, np.int64).ravel()
    u = np.concatenate([s, r])          # undirected incidence: u's neighbor
    v = np.concatenate([r, s])          # is v, both directions
    cap = int(np.ceil(nn / npart * balance))
    rng = np.random.default_rng(seed)
    parts = np.full(nn, -1, np.int32)
    seeds = rng.choice(nn, npart, replace=False)
    parts[seeds] = np.arange(npart, dtype=np.int32)
    sizes = np.bincount(parts[parts >= 0], minlength=npart).astype(np.int64)

    # --- balanced multi-source BFS growth -------------------------------
    while True:
        m = (parts[u] == -1) & (parts[v] >= 0)
        if not m.any():
            break
        uu = u[m]
        pv = parts[v[m]].astype(np.int64)
        frontier, inv = np.unique(uu, return_inverse=True)
        cf = np.bincount(inv * npart + pv,
                         minlength=len(frontier) * npart) \
            .reshape(-1, npart).astype(np.float64)
        # LDG score: neighbor pull damped by remaining capacity
        score = cf * np.maximum(1.0 - sizes / cap, 1e-9)[None, :]
        best = np.argmax(score, axis=1)
        assigned = 0
        for p in range(npart):
            sel = np.nonzero(best == p)[0]
            room = cap - int(sizes[p])
            if room <= 0 or len(sel) == 0:
                continue
            if len(sel) > room:
                sel = sel[np.argsort(-cf[sel, p], kind="stable")[:room]]
            parts[frontier[sel]] = p
            sizes[p] += len(sel)
            assigned += len(sel)
        if assigned == 0:
            # every candidate's best part is full: force the least-loaded
            # part (keeps the loop finite on adversarial degree skew)
            p = int(np.argmin(sizes))
            room = max(cap - int(sizes[p]), 1)
            sel = frontier[:room]
            parts[sel] = p
            sizes[p] += len(sel)
    rem = np.nonzero(parts == -1)[0]
    if len(rem):
        # isolated / disconnected leftovers: spread over least-loaded parts
        order = np.argsort(sizes, kind="stable")
        fill = np.concatenate([
            np.full(max(cap - int(sizes[p]), 0), p, np.int32)
            for p in order] + [np.zeros(0, np.int32)])
        if len(fill) < len(rem):    # caps too tight (rounding): round-robin
            extra = np.arange(len(rem) - len(fill)) % npart
            fill = np.concatenate([fill, extra.astype(np.int32)])
        parts[rem] = fill[:len(rem)]
        sizes = np.bincount(parts, minlength=npart).astype(np.int64)

    # --- LDG refinement sweeps ------------------------------------------
    floor = int(nn / npart * max(2.0 - balance, 0.5))
    ar = np.arange(nn)
    for _ in range(refine_sweeps):
        pv = parts[v].astype(np.int64)
        cnt = np.bincount(u * npart + pv, minlength=nn * npart) \
            .reshape(nn, npart)
        cur = parts.astype(np.int64)
        cur_cnt = cnt[ar, cur]
        best = np.argmax(cnt, axis=1)
        gain = cnt[ar, best] - cur_cnt
        cand = np.nonzero((gain > 0) & (best != cur))[0]
        if len(cand) == 0:
            break
        order = cand[np.argsort(-gain[cand], kind="stable")]
        moved = 0
        for p in range(npart):
            into = order[best[order] == p]
            room = cap - int(sizes[p])
            into = into[:max(room, 0)]
            if len(into) == 0:
                continue
            # don't drain any source part below the floor: keep only the
            # first (size_q - floor) departures per source part q
            src = parts[into]
            keep = np.ones(len(into), bool)
            for q in range(npart):
                idxq = np.nonzero(src == q)[0]
                allow = max(int(sizes[q]) - floor, 0)
                keep[idxq[allow:]] = False
            into = into[keep]
            if len(into) == 0:
                continue
            np.subtract.at(sizes, parts[into], 1)
            parts[into] = p
            sizes[p] += len(into)
            moved += len(into)
        if moved == 0:
            break
    return parts.astype(np.int32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartitionedGraph:
    """Stacked per-shard graph arrays (leading axis = shard).

    Shapes (P shards):
      node_global:   int32[P, n_local] — global node id per local slot
                     (padding slots repeat the last owned id).
      node_mask:     bool[P, n_local] — real owned nodes.
      recv_local:    int32[P, e_local] — local receiver per edge.
      send_halo_idx: int32[P, e_local] — sender position in the halo buffer
                     (flat index into [P * h_max] received rows).
      edge_mask:     bool[P, e_local].
      edge_weight:   optional float[P, e_local].
      halo_send:     int32[P, P, h_max] — for shard q: local node ids to ship
                     to each destination shard (padded with 0).
      num_parts / n_local / e_local / h_max: static ints.
    """

    node_global: jax.Array
    node_mask: jax.Array
    recv_local: jax.Array
    send_halo_idx: jax.Array
    edge_mask: jax.Array
    halo_send: jax.Array
    edge_weight: jax.Array | None = None
    # optional per-shard-stacked (aux_fwd, aux_rev) SpmmAux pair: fwd groups
    # local edges by local receiver (value rows = the halo buffer), rev by
    # halo-buffer slot — the local aggregation then rides the Pallas
    # scatter-matmul inside shard_map (fixed block counts so shards stack).
    spmm_aux: tuple | None = None
    # optional partition of the REVERSED graph (same node ownership, edges
    # re-partitioned by original sender) — unlocks reverse-direction
    # propagation (DConv / DCGRU bidirectional diffusion) under the mesh:
    # ShardGraph.reverse() swaps to this view. Built by
    # partition_graph(..., with_reverse=True).
    reverse_pg: "PartitionedGraph | None" = None
    # ---- owned/remote edge split (halo-overlap path; split_local=True) ----
    # Edges whose sender is owned by this shard aggregate straight from
    # x_local with NO dependence on the collective, so XLA's latency-hiding
    # scheduler runs them while the (off-diagonal-only) all_to_all is in
    # flight (SURVEY §7.3.4). The remote buffer excludes the diagonal, so
    # its row count is set by the true cut, not by local fan-in.
    own_recv: jax.Array | None = None     # int32[P, e_own] local receiver
    own_send: jax.Array | None = None     # int32[P, e_own] local sender
    own_mask: jax.Array | None = None     # bool[P, e_own]
    own_weight: jax.Array | None = None   # float[P, e_own]
    rem_recv: jax.Array | None = None     # int32[P, e_rem] local receiver
    rem_send: jax.Array | None = None     # int32[P, e_rem] remote-buffer idx
    rem_mask: jax.Array | None = None     # bool[P, e_rem]
    rem_weight: jax.Array | None = None   # float[P, e_rem]
    halo_send_rem: jax.Array | None = None  # int32[P, P, h_rem], diag empty
    # (aux_own_fwd, aux_own_rev, aux_rem_fwd, aux_rem_rev) per-shard
    # stacked SpmmAux for the two split aggregations
    split_aux: tuple | None = None
    num_parts: int = dataclasses.field(default=1, metadata=dict(static=True))
    n_local: int = dataclasses.field(default=0, metadata=dict(static=True))
    e_local: int = dataclasses.field(default=0, metadata=dict(static=True))
    h_max: int = dataclasses.field(default=0, metadata=dict(static=True))
    e_own: int = dataclasses.field(default=0, metadata=dict(static=True))
    e_rem: int = dataclasses.field(default=0, metadata=dict(static=True))
    h_rem: int = dataclasses.field(default=0, metadata=dict(static=True))
    # int32[P, 4] per shard = (cut_edges_in, edges_owned, halo_rows_sent,
    # h_min): partition quality — drives the analytic ICI communication
    # model (benchmarks/scaling.py). A per-shard data leaf (not static) so
    # it shards under shard_map and replicas stack via stack_partitions.
    cut_stats: jax.Array | None = None

    @property
    def cut_fraction(self) -> float:
        """Fraction of edges whose sender lives on another shard
        (host-side reporting; do not call under jit)."""
        if self.cut_stats is None:
            return 0.0
        cs = np.asarray(self.cut_stats)
        return float(cs[..., 0].sum() / max(cs[..., 1].sum(), 1))

    def halo_bytes_per_step(self, feat_dim: int, itemsize: int = 4) -> int:
        """Total unique sender rows shipped over the interconnect per
        sender-side operand exchange, in bytes (all shards summed)."""
        if self.cut_stats is None:
            return 0
        return int(np.sum(np.asarray(self.cut_stats)[..., 2])
                   * feat_dim * itemsize)

    def scatter_nodes(self, x) -> jax.Array:
        """[N, ...] global node array -> [P, n_local, ...] shard-stacked."""
        return jnp.asarray(np.asarray(x)[np.asarray(self.node_global)])

    def gather_nodes(self, xs) -> np.ndarray:
        """[P, n_local, ...] -> [N, ...] (host-side, inverse of scatter)."""
        xs = np.asarray(xs)
        ng = np.asarray(self.node_global)
        nm = np.asarray(self.node_mask)
        n = int(ng[nm].max()) + 1
        out = np.zeros((n,) + xs.shape[2:], xs.dtype)
        out[ng[nm]] = xs[nm]
        return out


def partition_graph(g: GraphTuple, num_parts: int, *,
                    parts: np.ndarray | None = None,
                    node_multiple: int = 8,
                    edge_multiple: int = 8,
                    n_local: int | None = None,
                    e_local: int | None = None,
                    h_max: int | None = None,
                    build_spmm_aux: bool = False,
                    with_reverse: bool = False,
                    split_local: bool = True,
                    e_own: int | None = None,
                    e_rem: int | None = None,
                    h_rem: int | None = None) -> PartitionedGraph:
    """Partition a graph for `shard_map` message passing.

    ``parts``: optional int[num_nodes] node->shard assignment (e.g. from a
    graph clusterer); defaults to balanced contiguous ranges, which preserves
    any locality already present in the node ordering.

    ``n_local``/``e_local``/``h_max`` force the per-shard capacities (must be
    >= the computed minimum) so partitions of different graphs share one
    static shape — required when stacking replicas for data parallelism.
    """
    nn = int(g.num_nodes)
    ne = int(g.num_edges)
    s = np.asarray(g.senders)[:ne]
    r = np.asarray(g.receivers)[:ne]
    w = None if g.edge_weight is None else np.asarray(g.edge_weight)[:ne]

    if isinstance(parts, str):
        if parts != "bfs":
            raise ValueError(f"unknown partitioner {parts!r} "
                             "(use 'bfs' or pass an explicit assignment)")
        parts = partition_nodes(s, r, nn, num_parts)
    if parts is None:
        bounds = np.linspace(0, nn, num_parts + 1).astype(np.int64)
        parts = np.zeros(nn, np.int32)
        for p in range(num_parts):
            parts[bounds[p]:bounds[p + 1]] = p
    else:
        parts = np.asarray(parts, np.int32)

    owned = [np.nonzero(parts == p)[0] for p in range(num_parts)]
    n_min = round_up(max(max(len(o) for o in owned), 1), node_multiple)
    n_local = n_local if n_local is not None else n_min
    if n_local < n_min:
        raise ValueError(f"n_local {n_local} < required {n_min}")
    glob2loc = np.zeros(nn, np.int64)
    for p, o in enumerate(owned):
        glob2loc[o] = np.arange(len(o))

    # edges by receiver part
    e_part = parts[r]
    edges_of = [np.nonzero(e_part == p)[0] for p in range(num_parts)]
    e_min = round_up(max(max(len(e) for e in edges_of), 1), edge_multiple)
    e_local = e_local if e_local is not None else e_min
    if e_local < e_min:
        raise ValueError(f"e_local {e_local} < required {e_min}")

    # halo sets: for each (src_part q -> dst_part p), unique senders owned by
    # q that p's edges reference
    halo_nodes = [[np.unique(glob2loc[
        s[edges_of[p]][parts[s[edges_of[p]]] == q]]).astype(np.int64)
        for p in range(num_parts)] for q in range(num_parts)]
    h_min = max(1, max(len(halo_nodes[q][p]) for q in range(num_parts)
                       for p in range(num_parts)))
    h_max_forced = h_max is not None
    h_max = h_max if h_max is not None else h_min
    if h_max < h_min:
        raise ValueError(f"h_max {h_max} < required {h_min}")
    # the halo buffer (num_parts * h_max rows) must be distinguishable from
    # the owned-node space by leading dim alone — ops.to_src_space infers
    # "already converted" from shape, so a collision would let the halo
    # all_to_all run twice on the same operand (silently wrong results)
    if num_parts * h_max == n_local:
        if h_max_forced:
            raise ValueError(
                f"num_parts*h_max ({num_parts}*{h_max}) == n_local "
                f"({n_local}): the halo-buffer row count may not equal the "
                "owned-node capacity (sender-space inference would be "
                "ambiguous); pass h_max+1")
        h_max += 1

    node_global = np.zeros((num_parts, n_local), np.int32)
    node_mask = np.zeros((num_parts, n_local), bool)
    # pad slots point at the LAST local row (mirroring the GraphTuple
    # dummy-node convention): real receivers are ascending per shard, so the
    # tail keeps the sequence non-decreasing and segment ops may honor
    # sorted_by_receivers=True (padded messages are masked to zero upstream)
    recv_local = np.full((num_parts, e_local), n_local - 1, np.int32)
    send_halo_idx = np.zeros((num_parts, e_local), np.int32)
    edge_mask = np.zeros((num_parts, e_local), bool)
    halo_send = np.zeros((num_parts, num_parts, h_max), np.int32)
    ew = (np.zeros((num_parts, e_local), w.dtype)
          if w is not None else None)

    for p in range(num_parts):
        o = owned[p]
        node_global[p, :len(o)] = o
        if len(o):
            node_global[p, len(o):] = o[-1]
        node_mask[p, :len(o)] = True

        # position-in-halo-buffer lookup for shard p's edges:
        # the buffer received on p is [P, h_max]; row q holds halo_nodes[q][p]
        pos = {}
        for q in range(num_parts):
            hn = halo_nodes[q][p]
            for i, loc in enumerate(hn):
                pos[(q, int(loc))] = q * h_max + i

        eidx = edges_of[p]
        sm = s[eidx]
        recv_local[p, :len(eidx)] = glob2loc[r[eidx]]
        send_halo_idx[p, :len(eidx)] = [
            pos[(int(parts[gs]), int(glob2loc[gs]))] for gs in sm]
        edge_mask[p, :len(eidx)] = True
        if w is not None:
            ew[p, :len(eidx)] = w[eidx]

    for q in range(num_parts):
        for p in range(num_parts):
            hn = halo_nodes[q][p]
            halo_send[q, p, :len(hn)] = hn

    # ---- owned/remote edge split (the halo-overlap path) -----------------
    split = {}
    if split_local:
        own_sel = [parts[s[edges_of[p]]] == p for p in range(num_parts)]
        eo_min = round_up(max(max(int(m.sum()) for m in own_sel), 1),
                          edge_multiple)
        er_min = round_up(max(max(int((~m).sum()) for m in own_sel), 1),
                          edge_multiple)
        e_own = e_own if e_own is not None else eo_min
        e_rem = e_rem if e_rem is not None else er_min
        if e_own < eo_min or e_rem < er_min:
            raise ValueError(f"e_own/e_rem ({e_own}/{e_rem}) < required "
                             f"({eo_min}/{er_min})")
        hr_min = max([1] + [len(halo_nodes[q][p]) for q in range(num_parts)
                            for p in range(num_parts) if q != p])
        h_rem = h_rem if h_rem is not None else hr_min
        if h_rem < hr_min:
            raise ValueError(f"h_rem {h_rem} < required {hr_min}")
        own_recv = np.full((num_parts, e_own), n_local - 1, np.int32)
        own_send = np.zeros((num_parts, e_own), np.int32)
        own_mask = np.zeros((num_parts, e_own), bool)
        rem_recv = np.full((num_parts, e_rem), n_local - 1, np.int32)
        rem_send = np.zeros((num_parts, e_rem), np.int32)
        rem_mask = np.zeros((num_parts, e_rem), bool)
        halo_send_rem = np.zeros((num_parts, num_parts, h_rem), np.int32)
        own_w = rem_w = None
        if w is not None:
            own_w = np.zeros((num_parts, e_own), w.dtype)
            rem_w = np.zeros((num_parts, e_rem), w.dtype)
        for p in range(num_parts):
            eidx = edges_of[p]
            om = own_sel[p]
            so, ro = s[eidx][om], r[eidx][om]
            no = len(so)
            own_recv[p, :no] = glob2loc[ro]
            own_send[p, :no] = glob2loc[so]
            own_mask[p, :no] = True
            if w is not None:
                own_w[p, :no] = w[eidx][om]
            sr, rr = s[eidx][~om], r[eidx][~om]
            nr = len(sr)
            # remote-buffer position: block q (source shard) at q*h_rem,
            # row = rank of the sender within halo_nodes[q][p]
            pos = {}
            for q in range(num_parts):
                if q == p:
                    continue
                for i, loc in enumerate(halo_nodes[q][p]):
                    pos[(q, int(loc))] = q * h_rem + i
            rem_recv[p, :nr] = glob2loc[rr]
            rem_send[p, :nr] = [
                pos[(int(parts[gs]), int(glob2loc[gs]))] for gs in sr]
            rem_mask[p, :nr] = True
            if w is not None:
                rem_w[p, :nr] = w[eidx][~om]
        for q in range(num_parts):
            for p in range(num_parts):
                if q == p:
                    continue
                hn = halo_nodes[q][p]
                halo_send_rem[q, p, :len(hn)] = hn
        split_aux = None
        if build_spmm_aux:
            from ..ops.pallas.spmm import build_spmm_aux as _build
            from ..ops.pallas.spmm import fixed_eblk_bound
            buf_rows = num_parts * h_rem
            fx = {"of": fixed_eblk_bound(n_local, e_own),
                  "or": fixed_eblk_bound(n_local, e_own),
                  "rf": fixed_eblk_bound(n_local, e_rem),
                  "rr": fixed_eblk_bound(buf_rows, e_rem)}

            def _pair(recv, send, n_e, n_dst, n_src, fx_f, fx_r):
                fwd = _build(recv, send, n_e, n_dst, fixed_n_eblk=fx_f)
                order = np.argsort(send[:n_e], kind="stable")
                rr_ = np.zeros(recv.shape[0], np.int32)
                rs_ = np.zeros(recv.shape[0], np.int32)
                rr_[:n_e] = send[:n_e][order]
                rs_[:n_e] = recv[:n_e][order]
                rev = _build(rr_, rs_, n_e, n_src,
                             orig_ids=order.astype(np.int32),
                             fixed_n_eblk=fx_r)
                return fwd, rev

            owns, rems = [], []
            for p in range(num_parts):
                no = int(own_mask[p].sum())
                nr = int(rem_mask[p].sum())
                owns.append(_pair(own_recv[p], own_send[p], no, n_local,
                                  n_local, fx["of"], fx["or"]))
                rems.append(_pair(rem_recv[p], rem_send[p], nr, n_local,
                                  buf_rows, fx["rf"], fx["rr"]))
            stk = lambda xs: jax.tree.map(lambda *a: jnp.stack(a), *xs)
            split_aux = (stk([o[0] for o in owns]), stk([o[1] for o in owns]),
                         stk([z[0] for z in rems]), stk([z[1] for z in rems]))
        split = dict(
            own_recv=jnp.asarray(own_recv), own_send=jnp.asarray(own_send),
            own_mask=jnp.asarray(own_mask),
            own_weight=None if own_w is None else jnp.asarray(own_w),
            rem_recv=jnp.asarray(rem_recv), rem_send=jnp.asarray(rem_send),
            rem_mask=jnp.asarray(rem_mask),
            rem_weight=None if rem_w is None else jnp.asarray(rem_w),
            halo_send_rem=jnp.asarray(halo_send_rem),
            split_aux=split_aux,
            e_own=e_own, e_rem=e_rem, h_rem=h_rem)

    aux = None
    if build_spmm_aux:
        from ..ops.pallas.spmm import build_spmm_aux as _build
        from ..ops.pallas.spmm import fixed_eblk_bound
        buf_rows = num_parts * h_max
        fx_fwd = fixed_eblk_bound(n_local, e_local)
        fx_rev = fixed_eblk_bound(buf_rows, e_local)
        fwds, revs = [], []
        for p in range(num_parts):
            ne_p = int(edge_mask[p].sum())
            # local edges inherit the global receiver sort
            fwds.append(_build(recv_local[p], send_halo_idx[p], ne_p,
                               n_local, fixed_n_eblk=fx_fwd))
            order = np.argsort(send_halo_idx[p, :ne_p], kind="stable")
            rev_r = np.zeros(e_local, np.int32)
            rev_s = np.zeros(e_local, np.int32)
            rev_r[:ne_p] = send_halo_idx[p, :ne_p][order]
            rev_s[:ne_p] = recv_local[p, :ne_p][order]
            revs.append(_build(rev_r, rev_s, ne_p, buf_rows,
                               orig_ids=order.astype(np.int32),
                               fixed_n_eblk=fx_rev))
        stack = lambda xs: jax.tree.map(lambda *a: jnp.stack(a), *xs)
        aux = (stack(fwds), stack(revs))

    # partition quality (BASELINE.md scaling north star): cut fraction sets
    # the communication volume — each cut edge's sender row ships once per
    # (src shard, dst shard) pair it appears in (the halo all_to_all sends
    # UNIQUE rows, so halo_rows <= cut_edges).
    cut_stats = jnp.asarray([
        [int(np.sum(parts[s[edges_of[p]]] != p)),      # cut edges into p
         int(len(edges_of[p])),                        # edges owned by p
         int(sum(len(halo_nodes[p][q])                 # rows p ships out
                 for q in range(num_parts) if q != p)),
         int(h_min)]
        for p in range(num_parts)], jnp.int32)         # [P, 4]

    rev_pg = None
    if with_reverse:
        # partition the REVERSED graph with the SAME node ownership (so
        # per-shard owned rows align) — reverse edges live on their
        # receiver's (= original sender's) shard
        from ..graph import graph as _build_graph
        g_rev = _build_graph(r, s, num_nodes=nn, edge_weight=w)
        rev_pg = partition_graph(g_rev, num_parts, parts=parts,
                                 node_multiple=node_multiple,
                                 edge_multiple=edge_multiple,
                                 n_local=n_local,
                                 build_spmm_aux=build_spmm_aux)
        if (np.asarray(rev_pg.node_global) != node_global).any():
            raise AssertionError("reverse partition node ownership mismatch")

    return PartitionedGraph(
        spmm_aux=aux,
        reverse_pg=rev_pg,
        **split,
        node_global=jnp.asarray(node_global),
        node_mask=jnp.asarray(node_mask),
        recv_local=jnp.asarray(recv_local),
        send_halo_idx=jnp.asarray(send_halo_idx),
        edge_mask=jnp.asarray(edge_mask),
        halo_send=jnp.asarray(halo_send),
        edge_weight=None if ew is None else jnp.asarray(ew),
        num_parts=num_parts, n_local=n_local, e_local=e_local, h_max=h_max,
        cut_stats=cut_stats,
    )
