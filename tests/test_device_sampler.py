"""DeviceSampler tests: on-device fixed-fanout sampling correctness.

Semantics analog: GNNGraphs/src/samplers.jl (layered fixed-fanout
NeighborLoader) with sample_neighbors(replace=true) per layer — but the
implementation is device-side with a constant slot structure (see
graphneuralnetworks_tpu/device_sampler.py module docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import graphneuralnetworks_tpu as gnn
from graphneuralnetworks_tpu import ops
from graphneuralnetworks_tpu.device_sampler import DeviceSampler


def _csr(g):
    """In-edge CSR (senders grouped by receiver) of a GraphTuple, numpy."""
    ne = int(g.num_edges)
    s = np.asarray(g.senders)[:ne]
    r = np.asarray(g.receivers)[:ne]
    n = int(g.num_nodes)
    order = np.argsort(r, kind="stable")
    ptr = np.concatenate([[0], np.cumsum(np.bincount(r, minlength=n))])
    return s[order].astype(np.int32), ptr.astype(np.int64), n


def _sample(sampler, seeds, seed=0):
    @jax.jit
    def run(sampler, key, seeds):
        return sampler.sample(key, seeds)
    return run(sampler, jax.random.key(seed), jnp.asarray(seeds, jnp.int32))


def test_structure_constants():
    bs, fanouts = 4, (3, 2)
    g = gnn.rand_graph(30, 200, seed=0)
    cs, ptr, n = _csr(g)
    sp = DeviceSampler.build(cs, ptr, fanouts=fanouts, batch_size=bs,
                             build_spmm_aux=False)
    assert sp.n_slots == 4 + 12 + 24 and sp.e_total == 12 + 24
    r = np.asarray(sp.receivers)
    s = np.asarray(sp.senders)
    # receiver-sorted, and layer-1 edges fan in k per seed slot
    assert np.all(np.diff(r[:sp.e_total]) >= 0)
    assert np.array_equal(r[:12], np.repeat(np.arange(4), 3))
    assert np.array_equal(s[:12], 4 + np.arange(12))
    # layer-2: receivers are layer-1 slots, senders fresh slots
    assert np.array_equal(r[12:36], 4 + np.repeat(np.arange(12), 2))
    assert np.array_equal(s[12:36], 16 + np.arange(24))
    # padding points at the dummy node
    assert np.all(r[sp.e_total:] == sp.n_pad - 1)


def test_sampled_edges_exist_in_graph():
    g = gnn.rand_graph(50, 600, seed=1)
    cs, ptr, n = _csr(g)
    sp = DeviceSampler.build(cs, ptr, fanouts=(4, 3), batch_size=8,
                             build_spmm_aux=False)
    seeds = np.array([0, 3, 7, 11, 20, 33, 41, 49])
    gb = _sample(sp, seeds)
    nid = np.asarray(gb.nodes["NID"])[:sp.n_slots]
    assert np.array_equal(nid[:8], seeds)
    ev = np.asarray(gb.edge_valid)[:sp.e_total]
    s = np.asarray(gb.senders)[:sp.e_total]
    r = np.asarray(gb.receivers)[:sp.e_total]
    # every valid sampled edge (in global ids) exists in the original graph
    has_edge = set(zip(np.asarray(g.senders)[:int(g.num_edges)].tolist(),
                       np.asarray(g.receivers)[:int(g.num_edges)].tolist()))
    for gs, gr in zip(nid[s[ev]].tolist(), nid[r[ev]].tolist()):
        assert (gs, gr) in has_edge
    # valid node ids everywhere (invalid slots echo their parent)
    assert nid.min() >= 0 and nid.max() < n


def test_zero_degree_masks_and_echoes():
    # node 5 has NO in-edges: edges sampled below it must be invalid and
    # its child slots echo the parent id
    s = np.array([0, 1, 2, 3, 4, 0, 1], np.int32)
    r = np.array([1, 2, 3, 4, 0, 2, 3], np.int32)
    g = gnn.graph(s, r, num_nodes=6)
    cs, ptr, n = _csr(g)
    sp = DeviceSampler.build(cs, ptr, fanouts=(2, 2), batch_size=2,
                             build_spmm_aux=False)
    gb = _sample(sp, np.array([5, 1]))
    ev = np.asarray(gb.edge_valid)[:sp.e_total]
    nid = np.asarray(gb.nodes["NID"])[:sp.n_slots]
    # layer-1 edges of seed slot 0 (node 5) invalid, of seed slot 1 valid
    assert not ev[0] and not ev[1] and ev[2] and ev[3]
    # echo: invalid child slots carry the parent's id
    assert nid[2] == 5 and nid[3] == 5
    # layer-2 below the invalid slots is invalid too (mask propagates)
    l2 = ev[4:]
    assert not l2[0] and not l2[1] and not l2[2] and not l2[3]
    # edge_mask == prefix & valid
    em = np.asarray(gb.edge_mask)
    assert np.array_equal(em[:sp.e_total], ev)
    assert not em[sp.e_total:].any()


def test_aggregation_oracle_mean_and_sum():
    """propagate on the sampled graph == numpy reduction over valid edges."""
    g = gnn.rand_graph(40, 300, seed=3)
    cs, ptr, n = _csr(g)
    sp = DeviceSampler.build(cs, ptr, fanouts=(3,), batch_size=16,
                             build_spmm_aux=True)
    seeds = np.arange(16) * 2
    gb = _sample(sp, seeds, seed=7)
    x = np.random.default_rng(0).standard_normal((n, 5)).astype(np.float32)
    nid = np.asarray(gb.nodes["NID"])
    X = jnp.asarray(x)[nid]                       # slot-space features
    got_sum = np.asarray(ops.propagate(ops.copy_xj, gb, "sum", xj=X))
    got_mean = np.asarray(ops.propagate(ops.copy_xj, gb, "mean", xj=X))
    ev = np.asarray(gb.edge_valid)[:sp.e_total]
    s = np.asarray(gb.senders)[:sp.e_total]
    r = np.asarray(gb.receivers)[:sp.e_total]
    want = np.zeros((sp.n_pad, 5), np.float32)
    cnt = np.zeros((sp.n_pad,), np.float32)
    for i in range(sp.e_total):
        if ev[i]:
            want[r[i]] += x[nid[s[i]]]
            cnt[r[i]] += 1
    np.testing.assert_allclose(got_sum[:16], want[:16], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got_mean[:16],
                               want[:16] / np.maximum(cnt[:16, None], 1),
                               rtol=2e-5, atol=2e-5)


def test_spmm_path_matches_fallback_with_edge_valid():
    """The Pallas SpMM path (prebuilt aux + edge_valid weight fold) equals
    the segment fallback on a device-sampled graph with invalid edges."""
    s = np.array([0, 1, 2, 3, 4, 0], np.int32)
    r = np.array([1, 2, 3, 4, 0, 2], np.int32)   # node 5 isolated
    g = gnn.graph(s, r, num_nodes=6)
    cs, ptr, n = _csr(g)
    sp = DeviceSampler.build(cs, ptr, fanouts=(2, 2), batch_size=4,
                             build_spmm_aux=True)
    gb = _sample(sp, np.array([5, 1, 2, 5]), seed=3)
    x = np.random.default_rng(1).standard_normal(
        (sp.n_pad, 4)).astype(np.float32)
    X = jnp.asarray(x)
    fast = np.asarray(ops.propagate(ops.copy_xj, gb, "sum", xj=X))
    slow = np.asarray(ops.propagate(
        ops.copy_xj, gb.replace(spmm_aux=None), "sum", xj=X))
    np.testing.assert_allclose(fast, slow, rtol=2e-5, atol=2e-5)


def test_sage_train_step_smoke():
    """End-to-end: jitted SAGE train step over DeviceSampler batches
    decreases the loss (the bench sage_device phase in miniature)."""
    import optax
    from flax import nnx
    from graphneuralnetworks_tpu import models as M

    g = gnn.rand_graph(100, 1200, seed=4)
    cs, ptr, n = _csr(g)
    sp = DeviceSampler.build(cs, ptr, fanouts=(4, 3), batch_size=8)
    d, ncls = 6, 3
    X = jax.random.normal(jax.random.key(0), (n, d), jnp.float32)
    y = jax.random.randint(jax.random.key(1), (n,), 0, ncls)
    model = M.GNNChain(M.SAGEConv(d, 16, jax.nn.relu, rngs=nnx.Rngs(0)),
                       nnx.Linear(16, ncls, rngs=nnx.Rngs(1)))
    gd, state = nnx.split(model)
    tx = optax.adam(5e-2)
    opt_state = tx.init(state)

    @jax.jit
    def step(state, opt_state, sampler, key, seeds, X, y):
        gb = sampler.sample(key, seeds)
        nid = gb.nodes["NID"]

        def loss_fn(st):
            logits = nnx.merge(gd, st)(gb, X[nid])
            ls = optax.softmax_cross_entropy_with_integer_labels(
                logits[:8], y[nid[:8]])
            return jnp.mean(ls)

        loss, grads = jax.value_and_grad(loss_fn)(state)
        upd, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(state, upd), opt_state, loss

    losses = []
    for i in range(12):
        seeds = jax.random.randint(jax.random.key(100 + i), (8,), 0, n)
        state, opt_state, loss = step(state, opt_state, sp,
                                      jax.random.key(i), seeds, X, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_sample_blocks_matches_full_graph():
    """apply_blocks on trimmed per-hop views == the same model on the full
    slot graph, on the seed rows (same key => identical draw)."""
    from flax import nnx
    from graphneuralnetworks_tpu import models as M
    from graphneuralnetworks_tpu.device_sampler import apply_blocks

    g = gnn.rand_graph(60, 700, seed=5)
    cs, ptr, n = _csr(g)
    bs = 8
    sp = DeviceSampler.build(cs, ptr, fanouts=(4, 3), batch_size=bs)
    d = 6
    convs = [M.SAGEConv(d, 10, jax.nn.relu, rngs=nnx.Rngs(0)),
             M.SAGEConv(10, 5, rngs=nnx.Rngs(1))]
    X = jax.random.normal(jax.random.key(2), (n, d), jnp.float32)
    seeds = jnp.arange(bs, dtype=jnp.int32) * 3

    @jax.jit
    def run_full(sp, key, seeds, X):
        gb = sp.sample(key, seeds)
        x = X[gb.nodes["NID"]]
        for c in convs:
            x = c(gb, x)
        return x[:bs], gb.nodes["NID"], gb.edge_valid

    @jax.jit
    def run_blocks(sp, key, seeds, X):
        blocks, nid = sp.sample_blocks(key, seeds)
        return apply_blocks(blocks, convs, X[nid])[:bs], nid, blocks

    key = jax.random.key(9)
    full, nid_f, ev_f = run_full(sp, key, seeds, X)
    trimmed, nid_b, blocks = run_blocks(sp, key, seeds, X)
    np.testing.assert_array_equal(np.asarray(nid_f), np.asarray(nid_b))
    np.testing.assert_allclose(np.asarray(full), np.asarray(trimmed),
                               rtol=1e-6, atol=1e-6)
    # block shapes shrink: last block covers only seeds+hop-1 slots
    assert blocks[0].n_pad == sp.n_pad
    assert blocks[1].n_pad < sp.n_pad
    assert sp.block_sizes[1][0] < sp.e_total
    # block edge_valid is the matching prefix of the full draw
    e1 = sp.block_sizes[1][0]
    np.testing.assert_array_equal(np.asarray(blocks[1].edge_valid)[:e1],
                                  np.asarray(ev_f)[:e1])


def test_build_validation():
    with pytest.raises(ValueError):
        DeviceSampler.build(np.zeros(4, np.int32), np.array([0, 2, 4]),
                            fanouts=(), batch_size=2)
    with pytest.raises(ValueError):
        DeviceSampler.build(np.zeros(5, np.int32), np.array([0, 2, 4]),
                            fanouts=(2,), batch_size=2)   # ptr[-1] mismatch

def test_without_replacement_distinct_and_complete():
    """replace=False: distinct picks when deg > k; ALL neighbors (each
    exactly once) when deg <= k, excess slots invalid. Analog:
    GNNGraphs/src/sampling.jl:68-118 with replace=false."""
    rng = np.random.default_rng(0)
    g = gnn.rand_graph(40, 400, seed=3)
    cs, ptr, n = _csr(g)
    k = 5
    sp = DeviceSampler.build(cs, ptr, fanouts=(k,), batch_size=16,
                             build_spmm_aux=False, replace=False)
    seeds = rng.integers(0, n, size=16)
    for trial in range(5):
        gt = _sample(sp, seeds, seed=trial)
        nid = np.asarray(gt.nodes["NID"])
        ev = np.asarray(gt.edge_valid)[: sp.e_total]
        deg = np.diff(ptr)
        for i, v in enumerate(seeds):
            d = int(deg[v])
            picks = nid[16 + i * k: 16 + (i + 1) * k]
            valid = ev[i * k: (i + 1) * k]
            neigh = set(cs[ptr[v]:ptr[v + 1]].tolist())
            got = picks[valid].tolist()
            # distinct…
            assert len(got) == len(set(got)), (v, got)
            # …from the true neighbor multiset's support
            assert set(got) <= neigh
            if d <= k:
                # all neighbors taken, exactly the support, excess invalid
                assert valid.sum() == min(d, k)
                assert set(got) == neigh
            else:
                assert valid.all()


def test_without_replacement_marginals_match_host():
    """Inclusion probability of each neighbor is ~k/d (uniform), matching
    the host sampler's replace=False distribution."""
    rng = np.random.default_rng(1)
    # one hub node with degree 12, sampled with k=4 -> p_incl = 1/3 each
    d, k, trials = 12, 4, 1500
    senders = np.arange(1, d + 1, dtype=np.int32)
    cs = senders.copy()
    ptr = np.zeros(d + 2, np.int64)
    ptr[1] = d                       # node 0 has the d in-neighbors
    ptr[2:] = d
    sp = DeviceSampler.build(cs, ptr, fanouts=(k,), batch_size=1,
                             build_spmm_aux=False, replace=False)
    seeds = jnp.zeros((1,), jnp.int32)

    @jax.jit
    def draw(sampler, key):
        return sampler.sample(key, seeds).nodes["NID"][1:1 + k]

    keys = jax.random.split(jax.random.key(42), trials)
    picks = np.asarray(jax.vmap(lambda kk: draw(sp, kk))(keys))
    counts = np.bincount(picks.reshape(-1), minlength=d + 1)[1:]
    # every draw distinct
    assert all(len(set(row.tolist())) == k for row in picks)
    p = counts / (trials * k)
    # uniform 1/d per slot; tolerance ~5 sigma of binomial
    sigma = np.sqrt((1 / d) * (1 - 1 / d) / (trials * k))
    assert np.all(np.abs(p - 1 / d) < 5 * sigma), p
