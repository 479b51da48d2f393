"""Full conv-zoo TPU sweep at production scale (perf/perf.jl's analog,
honest tunnel methodology).

One row per layer: forward and fwd+bwd ms at n=131072 / e=2M / d=128 on the
real chip, chained-fori_loop timing with novel-data warmup (bench.py
docstring — repeated identical calls are content-cached by the tunnel and
read absurdly fast). Incremental: rows already in the --out JSON are
skipped, so a wedged run resumes where it died.

Usage: python benchmarks/zoo_sweep_r5.py [--only GCNConv,GATConv] \
         [--out ZOO_SWEEP_r5.json] [--n 131072] [--e 2000000] [--d 128]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".bench_cache", "xla"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np
from flax import nnx

import graphneuralnetworks_tpu as gnn
from graphneuralnetworks_tpu import models as M

ITERS = 10


def factories(d, rngs):
    """name -> (layer, needs_e, first_output_only)."""
    mk = {}
    mk["GCNConv"] = M.GCNConv(d, d, rngs=rngs)
    mk["ChebConv"] = M.ChebConv(d, d, 3, rngs=rngs)

    class _ChebLam2(M.ChebConv):
        # the production configuration: fixed lambda_max=2.0 (the common
        # approximation) skips the per-call sparse power iteration that
        # dominates the default row (~50 SpMMs for the eigmax)
        def __call__(self, g, x=None):
            return super().__call__(g, x, lambda_max=2.0)

    mk["ChebConv_lam2"] = _ChebLam2(d, d, 3, rngs=rngs)
    mk["GraphConv"] = M.GraphConv(d, d, rngs=rngs)
    mk["GATConv_h4"] = M.GATConv(d, d // 4, heads=4, rngs=rngs)
    mk["GATv2Conv_h4"] = M.GATv2Conv(d, d // 4, heads=4, rngs=rngs)
    mk["AGNNConv"] = M.AGNNConv(rngs=rngs)
    mk["TransformerConv_h4"] = M.TransformerConv(d, d // 4, heads=4,
                                                 rngs=rngs)
    mk["GatedGraphConv"] = M.GatedGraphConv(d, 2, rngs=rngs)
    mk["EdgeConv"] = M.EdgeConv(M.MLP([2 * d, d], rngs=rngs))
    mk["GINConv"] = M.GINConv(M.MLP([d, d], rngs=rngs), 0.0)
    mk["SAGEConv"] = M.SAGEConv(d, d, rngs=rngs)
    mk["ResGatedGraphConv"] = M.ResGatedGraphConv(d, d, rngs=rngs)
    mk["SGConv"] = M.SGConv(d, d, 2, rngs=rngs)
    mk["TAGConv"] = M.TAGConv(d, d, 3, rngs=rngs)
    mk["DConv"] = M.DConv(d, d, 2, rngs=rngs)
    return mk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "ZOO_SWEEP_r5.json"))
    ap.add_argument("--only", default=None)
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--e", type=int, default=2_000_000)
    ap.add_argument("--d", type=int, default=128)
    args = ap.parse_args()

    doc = {"meta": {"nodes": args.n, "edges": args.e, "d": args.d,
                    "iters": ITERS,
                    "note": ("full conv-zoo sweep on one TPU chip; ms per "
                             "forward / fwd+bwd step, chained fori_loop, "
                             "novel-data warmup (perf/perf.jl analog at "
                             "production scale)")},
           "rows": []}
    if os.path.exists(args.out):
        doc = json.load(open(args.out))
    done = {r["layer"] for r in doc["rows"]
            if r.get("fwd_ms") and r.get("grad_ms")}

    g = gnn.rand_graph(args.n, args.e, seed=1, build_spmm_aux=True)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((g.n_pad, args.d)), jnp.float32)

    mk = factories(args.d, nnx.Rngs(0))
    names = (args.only.split(",") if args.only else list(mk))
    for name in names:
        if name in done:
            print(f"skip {name} (already measured)", flush=True)
            continue
        layer = mk[name]
        gd, st = nnx.split(layer)

        def step(st, g, x):
            out = nnx.merge(gd, st)(g, x)
            if isinstance(out, tuple):
                out = out[0]
            return out

        @jax.jit
        def run_fwd(st, g, x):
            def body(i, x):
                y = step(st, g, x)
                return x * 0.9 + y[:, : x.shape[1]] * 0.01
            return jax.lax.fori_loop(0, ITERS, body, x)

        @jax.jit
        def run_grad(st, g, x):
            def body(i, x):
                def loss(xx):
                    return jnp.sum(step(st, g, xx) ** 2) * 1e-6
                return x * 0.999 + jax.grad(loss)(x) * 1e-3
            return jax.lax.fori_loop(0, ITERS, body, x)

        row = {"layer": name}
        t_all = time.perf_counter()
        try:
            for key, fn in (("fwd_ms", run_fwd), ("grad_ms", run_grad)):
                out = fn(st, g, x0 + 1.0)
                float(out.ravel()[0])
                t0 = time.perf_counter()
                out = fn(st, g, x0)
                float(out.ravel()[0])
                row[key] = round((time.perf_counter() - t0) / ITERS * 1e3, 2)
            row["edges_per_s_fwd"] = round(args.e / (row["fwd_ms"] * 1e-3))
        except Exception as ex:  # noqa: BLE001 — record, keep sweeping
            row["error"] = f"{type(ex).__name__}: {ex}"[:200]
        row["wall_s"] = round(time.perf_counter() - t_all, 1)
        doc["rows"] = [r for r in doc["rows"] if r["layer"] != name] + [row]
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        print(json.dumps(row), flush=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
