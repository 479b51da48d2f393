"""Neighbor sampling: minibatch subgraphs for large-graph training.

Reference parity: GNNGraphs/src/sampling.jl — ``sample_neighbors`` (per-node
inbound/outbound edge sampling with/without replacement, keeping ``EID`` edge
ids, :68-118), ``induced_subgraph`` (:173-203) — and
GNNGraphs/src/samplers.jl:28-105 — ``NeighborLoader``, the layered
GraphSAGE-style minibatch iterator with a neighbor cache.

TPU-first: the sampler is host-side (numpy, optionally the C fast path in
graphneuralnetworks_tpu/native) and emits **fixed-fanout, fixed-shape**
padded GraphTuples, so the device-side training step compiles once and the
host pipeline double-buffers batches (SURVEY §7.1).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Sequence

import numpy as np

from .graph import GraphTuple, graph, round_up

__all__ = ["sample_neighbors", "induced_subgraph", "NeighborLoader",
           "Prefetcher"]


class Prefetcher:
    """Host-ahead-of-device double buffering for any batch iterable.

    Daemon producer threads drain the wrapped iterable (e.g. a
    :class:`NeighborLoader`) into a bounded queue so the host samples batch
    k+1..k+size while the device executes batch k. ``host_busy_s``
    accumulates sampling time across all workers —
    ``host_busy_s / (wall * workers)`` is the per-worker sampler utilization
    (near 1.0 means the host sampler is the bottleneck and the device
    starves).

    ``workers > 1`` requires the iterable to expose the work-splitting
    protocol (``epoch_batches()`` + ``sample_batch(seeds, rng)``, as
    :class:`NeighborLoader` does); batches may then be yielded out of order
    (irrelevant for shuffled training).
    """

    def __init__(self, it: Iterable, size: int = 2, *, workers: int = 1):
        self._it = it
        self._size = size
        self._workers = int(workers)
        if self._workers > 1 and not hasattr(it, "epoch_batches"):
            raise ValueError("workers > 1 needs an iterable with the "
                             "epoch_batches/sample_batch protocol")
        self.host_busy_s = 0.0
        self._busy_lock = threading.Lock()

    def __len__(self):
        return len(self._it)

    def __iter__(self):
        if self._workers > 1:
            yield from self._iter_multi()
            return
        q: queue.Queue = queue.Queue(maxsize=self._size)
        DONE = object()
        failure: list[BaseException] = []  # producer exception, re-raised
        # on the consumer side (a dead producer must NOT look like a short
        # epoch — silent training-data truncation)

        def produce():
            import time
            try:
                it = iter(self._it)
                while True:
                    t0 = time.perf_counter()
                    try:
                        item = next(it)
                    except StopIteration:
                        break
                    self.host_busy_s += time.perf_counter() - t0
                    q.put(item)
            except BaseException as exc:
                failure.append(exc)
            finally:
                q.put(DONE)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is DONE:
                break
            yield item
        t.join()
        if failure:
            raise failure[0]

    def _iter_multi(self):
        import time

        tasks: queue.Queue = queue.Queue()
        batches = self._it.epoch_batches()
        for b in batches:
            tasks.put(b)
        q: queue.Queue = queue.Queue(maxsize=max(self._size, self._workers))
        errors: list[BaseException] = []

        def produce(w):
            rng = np.random.default_rng(
                np.random.SeedSequence(entropy=[0x5A17, w]))
            busy = 0.0
            try:
                while True:
                    try:
                        seeds = tasks.get_nowait()
                    except queue.Empty:
                        return
                    t0 = time.perf_counter()
                    try:
                        item = self._it.sample_batch(seeds, rng=rng)
                    except BaseException as exc:  # surfaced on consumer side
                        errors.append(exc)
                        return
                    busy += time.perf_counter() - t0
                    q.put(item)
            finally:
                with self._busy_lock:     # one += per worker lifetime
                    self.host_busy_s += busy

        threads = [threading.Thread(target=produce, args=(w,), daemon=True)
                   for w in range(self._workers)]
        for t in threads:
            t.start()
        for _ in range(len(batches)):
            while True:
                try:
                    yield q.get(timeout=1.0)
                    break
                except queue.Empty:
                    if errors:
                        raise errors[0]
                    if not any(t.is_alive() for t in threads):
                        return
        for t in threads:
            t.join()
        if errors:
            raise errors[0]


def _csr_by(ids: np.ndarray, nn: int):
    """Group edge indices by node id: returns (order, ptr)."""
    order = np.argsort(ids, kind="stable")
    counts = np.bincount(ids, minlength=nn)
    ptr = np.concatenate([[0], np.cumsum(counts)])
    return order, ptr


def sample_neighbors(g: GraphTuple, nodes, K: int = -1, *,
                     dir: str = "in", replace: bool = False,
                     dropnodes: bool = False,
                     rng: np.random.Generator | None = None) -> GraphTuple:
    """Sample up to K incident edges per seed node (sampling.jl:68-118).

    ``dir="in"`` samples edges arriving at the seed nodes (the reference
    default). The result keeps all original node ids (or remapped ids with
    ``dropnodes=True``, reference's ``NID``/``DID``), and stores the original
    edge ids in ``edata["EID"]``.
    """
    rng = rng or np.random.default_rng()
    nn = int(g.num_nodes)
    ne = int(g.num_edges)
    s = np.asarray(g.senders)[:ne]
    r = np.asarray(g.receivers)[:ne]
    key = r if dir == "in" else s
    order, ptr = _csr_by(key, nn)

    chosen: list[np.ndarray] = []
    for v in np.asarray(nodes, dtype=np.int64).reshape(-1):
        lo, hi = ptr[v], ptr[v + 1]
        deg = hi - lo
        if deg == 0:
            continue
        k = deg if K < 0 else K
        if replace:
            pick = rng.integers(lo, hi, k)
        else:
            k = min(k, deg)
            pick = lo + rng.permutation(deg)[:k]
        chosen.append(order[pick])
    eid = (np.concatenate(chosen) if chosen
           else np.zeros(0, np.int64))

    s2, r2 = s[eid], r[eid]
    w = g.edge_weight
    w2 = None if w is None else np.asarray(w)[:ne][eid]
    edata = {"EID": eid.astype(np.int32)}
    for kk, v in g.edges.items():
        edata[kk] = np.asarray(v)[:ne][eid]

    if dropnodes:
        used = np.unique(np.concatenate([s2, r2])) if len(s2) else \
            np.zeros(0, np.int64)
        remap = -np.ones(nn, np.int64)
        remap[used] = np.arange(len(used))
        s2 = remap[s2].astype(np.int32)
        r2 = remap[r2].astype(np.int32)
        nodes_d = {"NID": used.astype(np.int32)}
        for kk, v in g.nodes.items():
            nodes_d[kk] = np.asarray(v)[:nn][used]
        return graph(s2, r2, num_nodes=len(used), nodes=nodes_d,
                     edges=edata, edge_weight=w2)
    nodes_d = {kk: np.asarray(v)[:nn] for kk, v in g.nodes.items()} or None
    return graph(s2, r2, num_nodes=nn, nodes=nodes_d, edges=edata,
                 edge_weight=w2)


def induced_subgraph(g: GraphTuple, nodes) -> GraphTuple:
    """Subgraph on a node subset with remapping (sampling.jl:173-203)."""
    nn = int(g.num_nodes)
    ne = int(g.num_edges)
    nodes = np.asarray(nodes, np.int64).reshape(-1)
    mask = np.zeros(nn, bool)
    mask[nodes] = True
    remap = -np.ones(nn, np.int64)
    remap[nodes] = np.arange(len(nodes))
    s = np.asarray(g.senders)[:ne]
    r = np.asarray(g.receivers)[:ne]
    keep = mask[s] & mask[r]
    ndata = {k: np.asarray(v)[:nn][nodes] for k, v in g.nodes.items()}
    edata = {k: np.asarray(v)[:ne][keep] for k, v in g.edges.items()}
    w = g.edge_weight
    return graph(remap[s[keep]], remap[r[keep]], num_nodes=len(nodes),
                 nodes=ndata or None, edges=edata or None,
                 edge_weight=None if w is None else np.asarray(w)[:ne][keep])


class NeighborLoader:
    """Layered fixed-fanout minibatch iterator (samplers.jl:28-105).

    Yields padded GraphTuples whose nodes are [seed_batch | sampled
    neighborhood]; ``ndata["NID"]`` holds original ids, ``ndata["seed_mask"]``
    flags the seed rows (leading ``batch_size`` slots). Shapes are identical
    across batches: n_pad/e_pad are computed from the worst-case fanout
    product, so one compiled train step serves the whole epoch.
    """

    def __init__(self, g: GraphTuple, *, num_neighbors: Sequence[int],
                 input_nodes=None, batch_size: int = 32,
                 replace: bool = False, shuffle: bool = True,
                 seed: int = 0, build_spmm_aux: bool = False,
                 minimal_batch: bool = False, csr=None):
        self.g = g
        self.build_spmm_aux = build_spmm_aux
        # minimal_batch: ship only the index arrays the train step needs
        # (COO + NID); skip EID/seed_mask/edata/weights. For device-resident
        # feature pipelines where every host->device byte counts.
        self.minimal_batch = minimal_batch
        self.num_neighbors = list(num_neighbors)
        self.batch_size = int(batch_size)
        self.replace = replace
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        nn = int(g.num_nodes)
        self.input_nodes = (np.arange(nn, dtype=np.int64)
                            if input_nodes is None
                            else np.asarray(input_nodes, np.int64))
        if csr is not None:
            # prebuilt in-CSR (see from_csr) — skips the argsort pass
            self._csr_send, self._csr_eid, self._ptr = (
                np.ascontiguousarray(csr[0], np.int32),
                np.ascontiguousarray(csr[1], np.int32),
                np.ascontiguousarray(csr[2], np.int64))
        else:
            ne = int(g.num_edges)
            s = np.asarray(g.senders)[:ne]
            r = np.asarray(g.receivers)[:ne]
            order, self._ptr = _csr_by(r, nn)
            # latency-friendly CSR layout for the native sampler: int32
            # senders and edge ids in CSR position order (two independent
            # loads per sampled edge instead of the order->senders chain)
            self._csr_send = s[order].astype(np.int32)
            self._csr_eid = order.astype(np.int32)
            del order

        # worst-case capacities
        max_nodes = self.batch_size
        max_edges = 0
        frontier = self.batch_size
        for k in self.num_neighbors:
            max_edges += frontier * k
            frontier *= k
            max_nodes += frontier
        self.n_pad = round_up(max_nodes + 1, 8)
        self.e_pad = round_up(max(max_edges, 1), 128)

    @property
    def csr(self):
        """The loader's in-CSR ``(csr_send, csr_eid, ptr)`` — cache to disk
        and rebuild with :meth:`from_csr` to skip the argsort pass, or feed
        ``(csr_send, ptr)`` to :class:`~..device_sampler.DeviceSampler`."""
        return self._csr_send, self._csr_eid, self._ptr

    @classmethod
    def from_csr(cls, csr_send, csr_eid, ptr, *, num_nodes=None,
                 **kw) -> "NeighborLoader":
        """Build a loader from a prebuilt incoming-edge CSR.

        ``csr_send[ptr[v]:ptr[v+1]]`` are the senders of v's in-edges and
        ``csr_eid`` the matching original edge ids (the layout ``__init__``
        derives with an argsort — at ogbn scale that pass takes ~30s on a
        small host, so production pipelines and bench.py cache these three
        arrays on disk and skip it).
        """
        from types import SimpleNamespace
        ptr = np.asarray(ptr)
        n = int(num_nodes) if num_nodes is not None else len(ptr) - 1
        e = int(len(csr_send))
        shim = SimpleNamespace(num_nodes=n, num_edges=e, senders=None,
                               receivers=None, nodes={}, edges={},
                               edge_weight=None)
        return cls(shim, csr=(csr_send, csr_eid, ptr), **kw)

    def __len__(self):
        return (len(self.input_nodes) + self.batch_size - 1) \
            // self.batch_size

    def epoch_batches(self) -> list[np.ndarray]:
        """One epoch's seed batches (shuffled; final short batch repeat-
        padded to full size). Part of the Prefetcher multi-worker protocol."""
        seeds_all = self.input_nodes.copy()
        if self.shuffle:
            self._rng.shuffle(seeds_all)
        bs = self.batch_size
        out = []
        for i in range(0, len(seeds_all), bs):
            seeds = seeds_all[i:i + bs]
            if len(seeds) < bs:  # repeat-pad the final short batch
                seeds = np.concatenate(
                    [seeds, seeds_all[: bs - len(seeds)]])
            out.append(seeds)
        return out

    def __iter__(self) -> Iterator[GraphTuple]:
        for seeds in self.epoch_batches():
            yield self._sample_batch(seeds)

    def sample_batch(self, seeds: np.ndarray,
                     rng: np.random.Generator | None = None) -> GraphTuple:
        """Sample one padded minibatch for explicit seed nodes; thread-safe
        when given a private ``rng`` (the CSR arrays are read-only and the
        native sampler's scratch is thread-local)."""
        return self._sample_batch(seeds, rng=rng)

    def _sample_batch(self, seeds: np.ndarray,
                      rng: np.random.Generator | None = None) -> GraphTuple:
        rng = rng or self._rng
        try:
            from .native import sample_layers as _native_sample
        except Exception:
            _native_sample = None
        if _native_sample is not None:
            nid, es, er, eid = _native_sample(
                self._csr_send, self._csr_eid, self._ptr, seeds,
                self.num_neighbors, self.replace,
                int(rng.integers(0, 2 ** 31 - 1)))
        else:
            nid, es, er, eid = self._sample_py(seeds, rng)
        # nid: original node ids (seeds first, unique); es/er: edges in
        # *local* ids; eid: original edge ids (the reference's EID)
        g = self.g
        nn = int(g.num_nodes)
        ne = int(g.num_edges)
        ndata = {"NID": nid.astype(np.int32)}
        edata = None
        w2 = None
        if not self.minimal_batch:
            ndata["seed_mask"] = np.arange(len(nid)) < len(seeds)
            for k, v in g.nodes.items():
                ndata[k] = np.asarray(v)[:nn][nid]
            # edge data rides along: EID mapping, per-edge features, weights
            # (sampling.jl:72-75 keeps EID; weighted GraphSAGE needs them)
            edata = {"EID": eid.astype(np.int32)}
            for k, v in g.edges.items():
                edata[k] = np.asarray(v)[:ne][eid]
            w = g.edge_weight
            w2 = None if w is None else np.asarray(w)[:ne][eid]
        fixed = None
        if self.build_spmm_aux:
            # fixed block count -> identical aux shapes across batches, so
            # the jitted train step compiles once for the whole epoch
            from .ops.pallas.spmm import fixed_eblk_bound
            fixed = fixed_eblk_bound(self.n_pad, self.e_pad)
        return graph(es, er, num_nodes=len(nid), nodes=ndata,
                     edges=edata, edge_weight=w2,
                     n_pad=self.n_pad, e_pad=self.e_pad,
                     build_spmm_aux=self.build_spmm_aux,
                     spmm_fixed_eblk=fixed)

    def _sample_py(self, seeds: np.ndarray,
                   rng: np.random.Generator | None = None):
        rng = rng or self._rng
        local = {int(v): i for i, v in enumerate(seeds)}
        nid = list(seeds)
        es, er, eid = [], [], []
        frontier = list(seeds)
        for k in self.num_neighbors:
            nxt = []
            for v in frontier:
                lo, hi = self._ptr[v], self._ptr[v + 1]
                deg = hi - lo
                if deg == 0:
                    continue
                if self.replace:
                    pick = rng.integers(lo, hi, k)
                else:
                    kk = min(k, deg)
                    pick = lo + rng.permutation(deg)[:kk]
                for p in pick:
                    e = int(self._csr_eid[p])
                    u = int(self._csr_send[p])
                    if u not in local:
                        local[u] = len(nid)
                        nid.append(u)
                        nxt.append(u)
                    es.append(local[u])
                    er.append(local[int(v)])
                    eid.append(int(e))
            frontier = nxt
        return (np.asarray(nid, np.int64), np.asarray(es, np.int32),
                np.asarray(er, np.int32), np.asarray(eid, np.int64))
