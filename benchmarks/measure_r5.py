"""Round-5 measured-attention artifact (VERDICT r4 next #5).

Kernel-level fwd and fwd+bwd timings for the three attention primitives
(gat / gatv2 / dot — the GAT, GATv2 and Transformer/AGNN hot paths,
reference anchor GNNlib/src/utils.jl:84-97) at production scale
(E=2M, N=131072, total width 128), H in {1,4}, f32 + bf16 inputs.

Run on the real TPU:  python benchmarks/measure_r5.py [--out MEASURE_r5.json]
Each config is timed with the chained-fori_loop + novel-data methodology
(bench.py docstring); results are emitted as JSON lines the moment they
finish and the artifact file is rewritten after every row, so a tunnel
wedge can cost at most the row in flight.
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

import graphneuralnetworks_tpu as gnn
from graphneuralnetworks_tpu.ops import attention as A

E, N, W = 2_000_000, 131072, 128
ITERS = 10


def timeit(fn, x, *consts):
    out = fn(x + 1.0, *consts)
    float(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    out = fn(x, *consts)
    float(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "MEASURE_r5.json"))
    ap.add_argument("--kernels", default="gat,gatv2,dot")
    ap.add_argument("--heads", default="1,4")
    args = ap.parse_args()

    g = gnn.rand_graph(N, E, seed=1, build_spmm_aux=True)
    rng = np.random.default_rng(0)
    rows = []
    meta = {"edges": E, "nodes": N, "total_width": W, "iters": ITERS,
            "note": ("ms per fwd (or fwd+bwd) step, chained fori_loop, "
                     "novel-data warmup, scalar-fetch completion; inputs in "
                     "the listed dtype, softmax state accumulates f32 "
                     "in-kernel either way")}

    def flush():
        with open(args.out, "w") as f:
            json.dump({"meta": meta, "rows": rows}, f, indent=1)

    for kern in args.kernels.split(","):
        for h in (int(s) for s in args.heads.split(",")):
            o = W // h
            for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
                x = jnp.asarray(rng.standard_normal((g.n_pad, h, o)), dt)
                if kern == "gat":
                    pi = jnp.asarray(rng.standard_normal((g.n_pad, h)), dt)
                    pj = jnp.asarray(rng.standard_normal((g.n_pad, h)), dt)

                    def fwd_step(v, pi, pj):
                        return A.gat_attention(g, pi, pj, v, 0.2)

                    consts = (pi, pj)
                elif kern == "gat_pw":
                    # the GATConv layer path: pj = <values, a2>, regenerated
                    # in-flight via the pj_weight hint (one grouped gather)
                    pi = jnp.asarray(rng.standard_normal((g.n_pad, h)), dt)
                    a2 = jnp.asarray(rng.standard_normal((o, h)), dt)

                    def fwd_step(v, pi, a2):
                        pj = jnp.einsum("nhf,fh->nh", v, a2)
                        return A.gat_attention(g, pi, pj, v, 0.2,
                                               pj_weight=a2)

                    consts = (pi, a2)
                elif kern == "gatv2":
                    a = jnp.asarray(rng.standard_normal((o, h)), dt)
                    q = jnp.asarray(rng.standard_normal((g.n_pad, h, o)), dt)

                    def fwd_step(v, q, a):
                        return A.gatv2_attention(g, q, v, a, 0.2)

                    consts = (q, a)
                elif kern == "dot":
                    q = jnp.asarray(rng.standard_normal((g.n_pad, h, o)), dt)
                    k = jnp.asarray(rng.standard_normal((g.n_pad, h, o)), dt)

                    def fwd_step(v, q, k):
                        return A.dot_attention(g, q, k, v, 1.0 / o ** 0.5)

                    consts = (q, k)
                else:
                    raise ValueError(kern)

                @jax.jit
                def run_fwd(v, *cs):
                    def body(i, v):
                        out = fwd_step(v, *cs)
                        return v * 0.9 + out.astype(v.dtype) * 0.01
                    return jax.lax.fori_loop(0, ITERS, body, v)

                @jax.jit
                def run_grad(v, *cs):
                    def body(i, v):
                        def loss(v):
                            out = fwd_step(v, *cs)
                            return (jnp.sum(out.astype(jnp.float32) ** 2)
                                    * 1e-6)
                        return v * 0.999 + jax.grad(loss)(v).astype(
                            v.dtype) * 1e-3
                    return jax.lax.fori_loop(0, ITERS, body, v)

                for mode, fn in (("fwd", run_fwd), ("fwd+bwd", run_grad)):
                    t0 = time.perf_counter()
                    ms = timeit(fn, x, *consts)
                    row = {"kernel": kern, "heads": h, "o": o,
                           "dtype": dt_name, "mode": mode,
                           "ms": round(ms, 2),
                           "edges_per_s": round(E / (ms * 1e-3)),
                           "wall_s": round(time.perf_counter() - t0, 1)}
                    rows.append(row)
                    print(json.dumps(row), flush=True)
                    flush()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
