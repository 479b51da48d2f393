"""Benchmark: SpMM propagate throughput vs the reference baseline.

Reproduces the reference's headline micro-benchmark
(GraphNeuralNetworks/perf/bench_gnn.jl:56): fused
``propagate(copy_xj, g, +)`` on an Erdos-Renyi graph with n=1024,
density=0.01 (E ~ 10.5k), D=100, where the reference records ~268.6 us on
CPU. We run the same op on one TPU chip via the Pallas scatter-matmul path,
plus a production-scale config (n=131072, E=2M, D=128).

Methodology: iterations are CHAINED inside one jitted `lax.fori_loop`
(output feeds input) so every step really executes on device — open-loop
repetition of an identical computation can be served from caches by the
remote-execution tunnel and reads absurdly fast.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
"""

import json
import signal
import time

import numpy as np


class _PhaseTimeout(Exception):
    pass


def _with_deadline(fn, seconds):
    """Run fn() with a SIGALRM deadline; returns None on timeout.

    The remote-compile path can occasionally wedge; the benchmark must still
    emit its JSON line with whatever phases completed.
    """
    def handler(signum, frame):
        raise _PhaseTimeout()

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)
    try:
        return fn()
    except _PhaseTimeout:
        return None
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _timeit_chained(propagate_fn, g, x0, iters):
    import jax

    # NOTE: the graph is a jit *argument* (not a closure capture) so its
    # index arrays are runtime inputs, not giant embedded HLO constants.
    @jax.jit
    def run(g, x):
        def body(i, x):
            y = propagate_fn(g, x)
            return y * 0.001  # keep magnitudes bounded; forces dependency
        return jax.lax.fori_loop(0, iters, body, x)

    # Warm/compile with DIFFERENT data, then time a single chained
    # execution: the remote-execution layer content-caches repeated
    # identical (executable, args) calls, so the timed call must be novel —
    # and completion is confirmed by fetching a scalar of the result
    # (block_until_ready alone can resolve at enqueue over the tunnel).
    float(run(g, x0 + 1.0)[0, 0])
    t0 = time.perf_counter()
    float(run(g, x0)[0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    import graphneuralnetworks_tpu as gnn
    from graphneuralnetworks_tpu import ops

    def fused(g, x):
        return ops.propagate(ops.copy_xj, g, "sum", xj=x)

    # --- reference config (bench_gnn.jl:52-58) ------------------------------
    n, p, d = 1024, 0.01, 100
    e = int(n * n * p) // 2 * 2
    g = gnn.rand_graph(n, e, seed=0, build_spmm_aux=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((g.n_pad, d)),
                    jnp.float32)
    t_small = _with_deadline(lambda: _timeit_chained(fused, g, x, 100), 600)

    # --- production-scale config --------------------------------------------
    n2, e2, d2 = 131072, 2_000_000, 128
    g2 = gnn.rand_graph(n2, e2, seed=1, build_spmm_aux=True)
    x2 = jnp.asarray(np.random.default_rng(1).standard_normal(
        (g2.n_pad, d2)), jnp.float32)
    t_large = _with_deadline(lambda: _timeit_chained(fused, g2, x2, 20), 600)
    t_large_xla = _with_deadline(
        lambda: _timeit_chained(fused, g2.replace(spmm_aux=None), x2, 10),
        600)

    baseline_s = 268.6e-6  # reference fused SpMM, same op/config, CPU
    result = {
        "metric": "spmm_propagate_copy_xj_n1024_p0.01_d100",
        "value": round(t_small * 1e6, 2) if t_small else None,
        "unit": "us",
        "vs_baseline": round(baseline_s / t_small, 2) if t_small else None,
        "edges_per_s_small": round(e / t_small) if t_small else None,
        "large_graph_edges_per_s": (round(e2 / t_large) if t_large
                                    else None),
        "large_graph_ms": round(t_large * 1e3, 3) if t_large else None,
        "large_graph_xla_fallback_ms": (round(t_large_xla * 1e3, 3)
                                        if t_large_xla else None),
        "pallas_speedup_vs_xla": (round(t_large_xla / t_large, 2)
                                  if t_large and t_large_xla else None),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


def _arm_watchdog(seconds: int):
    """If the main thread wedges inside a C call (remote compile), a daemon
    thread still emits a JSON line and exits, so the harness gets output."""
    import os
    import threading

    done = threading.Event()

    def watch():
        if not done.wait(seconds):
            print(json.dumps({
                "metric": "spmm_propagate_copy_xj_n1024_p0.01_d100",
                "value": None, "unit": "us", "vs_baseline": None,
                "error": f"benchmark wedged for {seconds}s "
                         "(remote compile service)",
            }), flush=True)
            os._exit(0)

    threading.Thread(target=watch, daemon=True).start()
    return done


if __name__ == "__main__":
    _done = _arm_watchdog(1500)
    main()
    _done.set()
