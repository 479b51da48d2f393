"""Regression tests for the round-2 review findings (ADVICE.md r2).

Each test pins one concrete bug fixed in round 3:
  1. partition_graph pad slots breaking the sorted_by_receivers hint
  2. single-worker Prefetcher swallowing producer exceptions
  3. src_pad == n_pad ambiguity letting the halo all_to_all run twice
  4. device_spmm_aux silently dropping edges on undersized fixed_n_eblk
"""

import numpy as np
import pytest

import graphneuralnetworks_tpu as gnn
from graphneuralnetworks_tpu.parallel.partition import partition_graph
from graphneuralnetworks_tpu.sampling import Prefetcher


def _ring(n=24, extra=8, seed=0):
    rng = np.random.default_rng(seed)
    s = np.concatenate([np.arange(n), rng.integers(0, n, extra)])
    r = np.concatenate([(np.arange(n) + 1) % n, rng.integers(0, n, extra)])
    return gnn.graph(s, r, num_nodes=n)


def test_partition_recv_local_pad_keeps_sorted_invariant():
    # ADVICE r2 #1: pad slots were 0, making per-shard receiver sequences
    # [0, 1, ..., k, 0, 0, ...] while ShardGraph advertises
    # sorted_by_receivers=True (undefined behavior in XLA segment ops).
    g = _ring()
    pg = partition_graph(g, 4, edge_multiple=16)
    rl = np.asarray(pg.recv_local)
    em = np.asarray(pg.edge_mask)
    for p in range(4):
        assert np.all(np.diff(rl[p]) >= 0), "receivers must be non-decreasing"
        assert np.all(rl[p][~em[p]] == pg.n_local - 1)


def test_partition_halo_buffer_never_collides_with_n_local():
    # ADVICE r2 #3: when num_parts*h_max == n_local, to_src_space cannot
    # tell owned-node arrays from halo buffers by shape — auto h_max bumps.
    g = _ring()
    pg = partition_graph(g, 2)
    assert pg.num_parts * pg.h_max != pg.n_local
    # explicit colliding h_max must raise rather than mis-run
    n_local = pg.n_local
    if n_local % 2 == 0 and n_local // 2 >= pg.h_max:
        with pytest.raises(ValueError, match="ambiguous"):
            partition_graph(g, 2, h_max=n_local // 2)


def test_shard_graph_local_rejects_colliding_partition():
    import dataclasses
    from graphneuralnetworks_tpu.parallel.shardgraph import shard_graph_local
    g = _ring()
    pg = partition_graph(g, 2)
    # hand-build a colliding partition (bypassing the builder's guard)
    bad = dataclasses.replace(pg, h_max=pg.n_local // 2)
    local = type(pg)(**{
        f.name: (getattr(bad, f.name) if f.metadata.get("static")
                 or getattr(bad, f.name) is None
                 else getattr(bad, f.name)[:1])
        for f in dataclasses.fields(bad)})
    with pytest.raises(ValueError, match="h_max"):
        shard_graph_local(local, "graph")


class _Boom(RuntimeError):
    pass


def test_prefetcher_single_worker_propagates_producer_error():
    # ADVICE r2 #2: a raising iterable killed the producer thread and the
    # consumer saw a silently short epoch.
    def gen():
        yield 1
        yield 2
        raise _Boom("sampler overflow")

    got = []
    with pytest.raises(_Boom, match="sampler overflow"):
        for item in Prefetcher(gen(), size=2):
            got.append(item)
    assert got == [1, 2]


def test_device_spmm_aux_rejects_undersized_fixed_n_eblk():
    # ADVICE r2 #4: the device grouping scatters with mode="drop"; an
    # undersized fixed_n_eblk silently dropped real edges where the host
    # builder raises.
    from graphneuralnetworks_tpu.ops.pallas.spmm import (device_spmm_aux,
                                                         fixed_eblk_bound)
    g = _ring()
    bound = fixed_eblk_bound(g.n_pad, g.e_pad)
    with pytest.raises(ValueError, match="fixed_n_eblk"):
        device_spmm_aux(g, fixed_n_eblk=bound - 1)
    assert device_spmm_aux(g, fixed_n_eblk=bound).spmm_aux is not None
