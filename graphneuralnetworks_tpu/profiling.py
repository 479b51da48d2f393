"""Profiling / observability hooks.

The reference's perf story is a BenchmarkTools script harness
(GraphNeuralNetworks/perf/perf.jl:10-99, SURVEY §5); the TPU-native
equivalents are `jax.profiler` traces plus lightweight throughput counters
(edges/s per step) suitable for production logging.
"""

from __future__ import annotations

import contextlib
import json
import time
import jax

__all__ = ["trace", "StepTimer", "benchmark_layers"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timing + edges/s counter for training loops."""

    def __init__(self, num_edges: int | None = None):
        self.num_edges = num_edges
        self._t = None
        self.history: list[float] = []

    def __enter__(self):
        self._t = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.history.append(time.perf_counter() - self._t)

    @property
    def mean_s(self) -> float:
        h = self.history[1:] or self.history  # drop compile step
        return sum(h) / max(len(h), 1)

    @property
    def edges_per_s(self) -> float | None:
        if self.num_edges is None or not self.history:
            return None
        return self.num_edges / self.mean_s

    def report(self) -> str:
        out = {"steps": len(self.history),
               "mean_ms": round(self.mean_s * 1e3, 3)}
        if self.edges_per_s is not None:
            out["edges_per_s"] = round(self.edges_per_s)
        return json.dumps(out)


def benchmark_layers(layer_factories: dict, graph_sizes=(10, 100, 1000),
                     *, d: int = 64, iters: int = 10,
                     seed: int = 0) -> list[dict]:
    """Layer x graph-size sweep (the perf/perf.jl:10-99 analog).

    ``layer_factories``: {name: (din, dout) -> layer}. Returns a list of
    {layer, n, forward_ms, grad_ms} rows. Times are chained-iteration means.
    """
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    from . import rand_graph

    rows = []
    for name, make in layer_factories.items():
        for n in graph_sizes:
            g = rand_graph(n, min(n * 10, n * (n - 1) // 2 * 2 or 2),
                           seed=seed)
            x = jnp.asarray(np.random.default_rng(seed).standard_normal(
                (g.n_pad, d)), jnp.float32)
            layer = make(d, d)
            graphdef, state = nnx.split(layer)

            # graph passed as a jit argument (not a closure constant)
            @jax.jit
            def fwd(state, g, x):
                return nnx.merge(graphdef, state)(g, x)

            @jax.jit
            def grad(state, g, x):
                def loss(xx):
                    return jnp.sum(fwd(state, g, xx) ** 2)
                return jax.grad(loss)(x)

            fwd(state, g, x).block_until_ready()
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fwd(state, g, x)
            out.block_until_ready()
            t_f = (time.perf_counter() - t0) / iters
            grad(state, g, x).block_until_ready()
            t0 = time.perf_counter()
            for _ in range(iters):
                gr = grad(state, g, x)
            gr.block_until_ready()
            t_g = (time.perf_counter() - t0) / iters
            rows.append({"layer": name, "n": n,
                         "forward_ms": round(t_f * 1e3, 3),
                         "grad_ms": round(t_g * 1e3, 3)})
    return rows
