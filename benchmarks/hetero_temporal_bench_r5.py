"""Hetero + temporal subsystems on the TPU at scale (round 5).

Extends ZOO_SWEEP_r5's hardware evidence to the two remaining model
families: HeteroGraphConv over a 2-node-type / 3-relation graph (per-type
65k nodes, ~1M edges total) and the recurrent cells (TGCN / GConvGRU) over
a T=8 sequence on a 65k-node / 1M-edge static graph via lax.scan. Honest
chained-loop timing (novel-data warmup, scalar-fetch completion).

Usage: python benchmarks/hetero_temporal_bench_r5.py [--out FILE.json]
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


def timeit(fn, x, *consts):
    out = fn(x + 1.0, *consts)
    float(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    out = fn(x, *consts)
    float(jax.tree.leaves(out)[0].ravel()[0])
    return round((time.perf_counter() - t0) / ITERS * 1e3, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "HETERO_TEMPORAL_r5.json"))
    args = ap.parse_args()
    rows = []
    rng = np.random.default_rng(0)
    d = 128

    # ---- hetero: user/item bipartite-ish, 3 relations, ~1M edges --------
    nu, ni = 65536, 65536
    e_rel = 350_000
    rel = {}
    for et, (ns, nd) in {("user", "rates", "item"): (nu, ni),
                         ("item", "rated_by", "user"): (ni, nu),
                         ("user", "follows", "user"): (nu, nu)}.items():
        rel[et] = (rng.integers(0, ns, e_rel, dtype=np.int64),
                   rng.integers(0, nd, e_rel, dtype=np.int64))
    hg = gnn.heterograph(rel, num_nodes={"user": nu, "item": ni},
                         build_spmm_aux=True)
    x_h = {"user": jnp.asarray(rng.standard_normal((nu, d)), jnp.float32),
           "item": jnp.asarray(rng.standard_normal((ni, d)), jnp.float32)}
    # pad features to the hetero container's per-type padded sizes
    x_h = {t: jnp.pad(v, ((0, hg.n_pad(t) - v.shape[0]), (0, 0)))
           for t, v in x_h.items()}
    conv = M.HeteroGraphConv({
        ("user", "rates", "item"): M.SAGEConv(d, d, rngs=nnx.Rngs(0)),
        ("item", "rated_by", "user"): M.SAGEConv(d, d, rngs=nnx.Rngs(1)),
        ("user", "follows", "user"): M.GraphConv(d, d, rngs=nnx.Rngs(2)),
    })
    gd, st = nnx.split(conv)

    @jax.jit
    def run_hetero(xu, xi_, st, hg):
        def body(i, carry):
            xu, xi_ = carry
            out = nnx.merge(gd, st)(hg, {"user": xu, "item": xi_})
            return (xu * 0.9 + out["user"] * 0.01,
                    xi_ * 0.9 + out["item"] * 0.01)
        return jax.lax.fori_loop(0, ITERS, body, (xu, xi_))

    @jax.jit
    def run_hetero_grad(xu, xi_, st, hg):
        def body(i, carry):
            xu, xi_ = carry

            def loss(xu):
                out = nnx.merge(gd, st)(hg, {"user": xu, "item": xi_})
                return (jnp.sum(out["user"] ** 2)
                        + jnp.sum(out["item"] ** 2)) * 1e-6
            return xu * 0.999 + jax.grad(loss)(xu) * 1e-3, xi_
        return jax.lax.fori_loop(0, ITERS, body, (xu, xi_))

    e_total = 3 * e_rel
    t = timeit(run_hetero, x_h["user"], x_h["item"], st, hg)
    rows.append({"model": "HeteroGraphConv(SAGE,SAGE,Graph)", "mode": "fwd",
                 "nodes": nu + ni, "edges": e_total, "d": d, "ms": t,
                 "edges_per_s": round(e_total / (t * 1e-3))})
    print(json.dumps(rows[-1]), flush=True)
    t = timeit(run_hetero_grad, x_h["user"], x_h["item"], st, hg)
    rows.append({"model": "HeteroGraphConv(SAGE,SAGE,Graph)",
                 "mode": "fwd+bwd(x_user)", "nodes": nu + ni,
                 "edges": e_total, "d": d, "ms": t,
                 "edges_per_s": round(e_total / (t * 1e-3))})
    print(json.dumps(rows[-1]), flush=True)
    json.dump({"rows": rows}, open(args.out, "w"), indent=1)

    # ---- temporal: recurrent cells over T=8 on 65k/1M ------------------
    T, n, e = 8, 65536, 1_000_000
    g = gnn.rand_graph(n, e, seed=2, build_spmm_aux=True)
    xt = jnp.asarray(rng.standard_normal((T, g.n_pad, d)), jnp.float32)
    for name, cell in (("TGCN", M.TGCNCell(d, d, rngs=nnx.Rngs(3))),
                       ("GConvGRU", M.GConvGRUCell(d, d, 2,
                                                   rngs=nnx.Rngs(4)))):
        layer = M.GNNRecurrence(cell)
        gdt, stt = nnx.split(layer)

        @jax.jit
        def run_t(xt, stt, g):
            def body(i, xt):
                y = nnx.merge(gdt, stt)(g, xt)
                return xt * 0.9 + y * 0.01
            return jax.lax.fori_loop(0, ITERS, body, xt)

        t = timeit(run_t, xt, stt, g)
        ees = round(T * e / (t * 1e-3))
        rows.append({"model": f"GNNRecurrence({name})", "mode": "fwd",
                     "T": T, "nodes": n, "edges": e, "d": d, "ms": t,
                     "edge_steps_per_s": ees})
        print(json.dumps(rows[-1]), flush=True)
        json.dump({"rows": rows}, open(args.out, "w"), indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
