"""Benchmark: SpMM propagate throughput vs the reference baseline.

Reproduces the reference's headline micro-benchmark
(GraphNeuralNetworks/perf/bench_gnn.jl:56): fused
``propagate(copy_xj, g, +)`` on an Erdos-Renyi graph with n=1024,
density=0.01 (E ~ 10.5k), D=100, where the reference records ~268.6 us on
CPU. We run the same op on one TPU chip via the Pallas scatter-matmul path,
plus a production-scale config (n=131072, E=2M, D=128), each with its XLA
segment-sum fallback for comparison.

Methodology (the remote-execution tunnel both content-caches repeated
identical executions and occasionally wedges a compile):
- iterations are CHAINED inside one jitted `lax.fori_loop` (output feeds
  input) so every step really executes;
- the timed call uses data the warmup never saw, and completion is
  confirmed by fetching a scalar of the result;
- the graph is a jit *argument*, not a closure constant;
- each phase runs in a kill-able subprocess with a deadline and one retry.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
"""

import json
import os
import subprocess
import sys
import time

# importance order: the large config is the headline; smalls are the
# reference's exact micro-config for comparability; sddmm/attention cover
# the other two hot kernels named in BASELINE.md (forward+the fused
# edge-softmax path every attention layer rides).
PHASES = {"large_pallas": (3, 500), "large_xla": (2, 420),
          "small_pallas": (2, 300), "small_xla": (2, 300),
          "sddmm": (2, 420), "attention": (2, 420),
          "train": (2, 480), "sage_epoch": (2, 560)}


def run_phase(phase: str) -> float:
    """Time one configuration; prints seconds-per-iteration to stdout."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import graphneuralnetworks_tpu as gnn
    from graphneuralnetworks_tpu import ops

    if phase == "sage_epoch":
        return _run_sage_epoch(jax, jnp, np)

    small = phase.startswith("small")
    pallas = phase.endswith("pallas")
    if small:
        n, d, iters = 1024, 100, 100
        e = int(n * n * 0.01) // 2 * 2
    else:
        n, e, d, iters = 131072, 2_000_000, 128, 20

    g = gnn.rand_graph(n, e, seed=0 if small else 1, build_spmm_aux=True)
    if phase in ("large_xla", "small_xla"):
        g = g.replace(spmm_aux=None)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((g.n_pad, d)),
                    jnp.float32)

    if phase == "sddmm":
        # per-edge dot of endpoint features (xi_dot_xj) — the score step of
        # every attention layer (SURVEY §3.2).
        @jax.jit
        def run(g, x):
            def body(i, x):
                ee = ops.apply_edges(ops.xi_dot_xj, g, xi=x, xj=x)
                return x * 0.999 + jnp.mean(ee) * 1e-6
            return jax.lax.fori_loop(0, iters, body, x)
    elif phase == "attention":
        # the GAT hot path: affine logits computed IN-kernel from node-level
        # projections + single-pass flash softmax-aggregate of node-level
        # values (ops/pallas/edge_softmax.py:gat_attention_nodes) — zero
        # edge-space intermediates in the whole attention stack.
        from graphneuralnetworks_tpu.ops.attention import gat_attention
        a1 = jnp.asarray(np.random.default_rng(2).standard_normal((d, 1)),
                         jnp.float32)
        a2 = jnp.asarray(np.random.default_rng(3).standard_normal((d, 1)),
                         jnp.float32)

        @jax.jit
        def run(g, x):
            def body(i, x):
                pi, pj = x @ a1, x @ a2                       # [N, 1] each
                out = gat_attention(g, pi, pj, x[:, None, :], 0.2)[:, 0, :]
                return x * 0.9 + out * 0.01
            return jax.lax.fori_loop(0, iters, body, x)
    elif phase == "train":
        # full production train step: 2-layer GCN forward + backward
        # (scatter-matmul VJPs) + Adam, end to end under one jit.
        import optax
        from flax import nnx
        from graphneuralnetworks_tpu import models as M
        iters = 10
        model = M.GNNChain(M.GCNConv(d, d, jax.nn.relu, rngs=nnx.Rngs(0)),
                           M.GCNConv(d, 8, rngs=nnx.Rngs(1)))
        gd, state0 = nnx.split(model)
        tx = optax.adam(1e-3)
        y = jnp.asarray(np.random.default_rng(4).integers(0, 8, g.n_pad))

        @jax.jit
        def run(g, x, state):
            opt_state = tx.init(state)

            def body(i, carry):
                state, opt_state = carry

                def loss_fn(st):
                    logits = nnx.merge(gd, st)(g, x)
                    ls = optax.softmax_cross_entropy_with_integer_labels(
                        logits, y)
                    return jnp.mean(ls * g.node_mask)

                grads = jax.grad(loss_fn)(state)
                upd, opt_state = tx.update(grads, opt_state)
                return optax.apply_updates(state, upd), opt_state

            state, _ = jax.lax.fori_loop(0, iters, body, (state, opt_state))
            return state

        def timed(g, x, state):
            out = run(g, x, state)
            float(jax.tree.leaves(out)[0].ravel()[0])
            return out

        timed(g, x + 1.0, state0)         # compile + warm on novel data
        t0 = time.perf_counter()
        timed(g, x, state0)               # novel data again; fetch = done
        return (time.perf_counter() - t0) / iters
    else:
        @jax.jit
        def run(g, x):
            def body(i, x):
                return ops.propagate(ops.copy_xj, g, "sum", xj=x) * 0.001
            return jax.lax.fori_loop(0, iters, body, x)

    float(run(g, x + 1.0)[0, 0])          # compile + warm on novel data
    t0 = time.perf_counter()
    float(run(g, x)[0, 0])                # novel data again; fetch = done
    return (time.perf_counter() - t0) / iters


def _run_sage_epoch(jax, jnp, np) -> float:
    """NORTH STAR (BASELINE.md primary metric shape): GraphSAGE sampled-
    minibatch training on an ogbn-products-scale graph (2.45M nodes, 124M
    directed edges), NeighborLoader fixed-fanout batches from the C++
    sampler, host double-buffered ahead of the device
    (sampling.Prefetcher). Features/labels stay RESIDENT on device; each
    batch ships only index arrays (the TPU-native pipeline)."""
    import optax
    from types import SimpleNamespace

    from flax import nnx
    from graphneuralnetworks_tpu import models as M
    from graphneuralnetworks_tpu.sampling import NeighborLoader, Prefetcher

    n, e, d, ncls, bs = 2_449_029, 123_718_280, 100, 47, 1024
    rng = np.random.default_rng(0)
    s = rng.integers(0, n, e, dtype=np.int32)
    r = rng.integers(0, n, e, dtype=np.int32)
    shim = SimpleNamespace(num_nodes=n, num_edges=e, senders=s,
                           receivers=r, nodes={}, edges={},
                           edge_weight=None)
    seeds = rng.choice(n, 196_615, replace=False)  # products train size
    # aux groupings are built ON DEVICE inside the jitted step
    # (ops/pallas/spmm.device_spmm_aux) — the host ships only raw COO index
    # arrays (~2MB/batch instead of ~20MB)
    loader = NeighborLoader(shim, num_neighbors=[15, 10], batch_size=bs,
                            input_nodes=seeds, seed=1,
                            build_spmm_aux=False, minimal_batch=True)
    n_batches_epoch = len(loader)
    from graphneuralnetworks_tpu.ops.pallas.spmm import device_spmm_aux

    X = jax.random.normal(jax.random.key(0), (n, d), jnp.float32)
    y = jax.random.randint(jax.random.key(1), (n,), 0, ncls)
    rngs = nnx.Rngs(0)
    model = M.GNNChain(M.SAGEConv(d, 256, jax.nn.relu, rngs=rngs),
                       M.SAGEConv(256, 256, jax.nn.relu, rngs=rngs),
                       nnx.Linear(256, ncls, rngs=rngs))
    gd, state = nnx.split(model)
    tx = optax.adam(1e-3)
    opt_state = tx.init(state)

    @jax.jit
    def step(state, opt_state, gb, X, y):
        gb = device_spmm_aux(gb)
        nid = gb.nodes["NID"]

        def loss_fn(st):
            logits = nnx.merge(gd, st)(gb, X[nid])
            ls = optax.softmax_cross_entropy_with_integer_labels(
                logits[:bs], y[nid][:bs])
            return jnp.mean(ls)

        loss, grads = jax.value_and_grad(loss_fn)(state)
        upd, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(state, upd), opt_state, loss

    # workers=1: this host has 2 CPUs — a second sampler thread fights the
    # dispatch thread and LOSES throughput (measured 100 -> 253 ms/batch);
    # the workers>1 path is for many-core production hosts.
    warm, measure, workers = 2, 40, 1
    pf = Prefetcher(loader, size=4, workers=workers)
    edges = 0
    t0 = busy0 = None
    loss = None
    for i, gb in enumerate(pf):
        if i == warm:
            t0, busy0 = time.perf_counter(), pf.host_busy_s
        state, opt_state, loss = step(state, opt_state, gb, X, y)
        if i >= warm:
            edges += int(gb.num_edges)   # input-side scalar (cheap fetch)
        else:
            float(loss)
        if i + 1 == warm + measure:
            break
    float(loss)                          # drain the async step queue
    wall = time.perf_counter() - t0
    sampler_busy = pf.host_busy_s - busy0
    per_batch = wall / measure
    extra = {
        "sage_epoch_s": round(per_batch * n_batches_epoch, 2),
        "sage_sampled_edges_per_s": round(edges / wall),
        "sage_batches_per_s": round(measure / wall, 2),
        "sampler_workers": workers,
        "sampler_util": round(sampler_busy / (wall * workers), 3),
        "sage_batch_ms": round(per_batch * 1e3, 2),
    }
    print("PHASE_EXTRA " + json.dumps(extra))
    return per_batch


def orchestrate():
    results = {}
    extras = {}
    for phase, (attempts, deadline) in PHASES.items():
        t = None
        for attempt in range(attempts):
            try:
                out = subprocess.run(
                    [sys.executable, "-u", os.path.abspath(__file__),
                     "--phase", phase],
                    capture_output=True, text=True, timeout=deadline)
                for line in out.stdout.splitlines():
                    if line.startswith("PHASE_RESULT "):
                        t = float(line.split()[1])
                    elif line.startswith("PHASE_EXTRA "):
                        extras.update(json.loads(line[len("PHASE_EXTRA "):]))
                if t is not None:
                    break
            except subprocess.TimeoutExpired:
                # a killed client can leave the remote compile service
                # draining its orphaned request; give it time to recover
                time.sleep(90)
                continue
        results[phase] = t

    e_small = int(1024 * 1024 * 0.01) // 2 * 2
    e_large = 2_000_000
    # reference fused SpMM: 10484 edges in 268.6us (bench_gnn.jl:56) =
    # 39.0M edges/s on CPU. Headline = per-edge throughput on the SAME op
    # (propagate(copy_xj, +), f32) at production scale on one TPU chip.
    baseline_edges_per_s = e_small / 268.6e-6
    ts, tsx = results["small_pallas"], results["small_xla"]
    tl, tlx = results["large_pallas"], results["large_xla"]
    rate = (e_large / tl) if tl else ((e_small / ts) if ts else None)
    out = {
        "metric": "spmm_propagate_copy_xj_edges_per_s",
        "value": round(rate) if rate else None,
        "unit": "edges/s",
        "vs_baseline": (round(rate / baseline_edges_per_s, 2)
                        if rate else None),
        "large_graph_ms": round(tl * 1e3, 3) if tl else None,
        "large_graph_xla_fallback_ms": round(tlx * 1e3, 3) if tlx else None,
        "pallas_speedup_vs_xla": (round(tlx / tl, 2) if tl and tlx
                                  else None),
        # the reference's exact micro-config (n=1024, p=0.01, D=100):
        # per-iteration latency of a 100-step chained loop; the tunneled
        # single chip has ~0.3ms/step dispatch latency at this tiny size.
        "small_pallas_us": round(ts * 1e6, 2) if ts else None,
        "small_xla_us": round(tsx * 1e6, 2) if tsx else None,
        # the other two hot kernels (BASELINE.md targets), same 2M-edge graph
        "sddmm_edges_per_s": (round(e_large / results["sddmm"])
                              if results.get("sddmm") else None),
        "attention_edges_per_s": (round(e_large / results["attention"])
                                  if results.get("attention") else None),
        # full train step (2-layer GCN fwd+bwd+adam) on the 2M-edge graph
        "train_step_ms": (round(results["train"] * 1e3, 3)
                          if results.get("train") else None),
        "train_edges_per_s": (round(e_large / results["train"])
                              if results.get("train") else None),
        "baseline_edges_per_s": round(baseline_edges_per_s),
    }
    # north-star sampled-epoch metrics (sage_epoch_s, sage_sampled_edges_per_s,
    # sampler_util, ...) merged from the sage_epoch phase
    out.update(extras)
    print(json.dumps(out))


if __name__ == "__main__":
    if "--phase" in sys.argv:
        phase = sys.argv[sys.argv.index("--phase") + 1]
        t = run_phase(phase)
        print(f"PHASE_RESULT {t}")
    else:
        orchestrate()
