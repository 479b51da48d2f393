"""Targeted round-4 measurements: weighted-SpMM backward + attention bwd.

Run on the real TPU:  python benchmarks/measure_r4.py [phase ...]
Phases: grad (spmm fwd/bwd), attn (attention fwd+bwd).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import graphneuralnetworks_tpu as gnn
from graphneuralnetworks_tpu import ops

E, N, D = 2_000_000, 131072, 128
ITERS = 10


def timeit(fn, *args):
    out = fn(*args[:-1], args[-1] + 1.0)
    float(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    out = fn(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def main(phases):
    print("building graph...", flush=True)
    g = gnn.rand_graph(N, E, seed=1, build_spmm_aux=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((g.n_pad, D)), jnp.float32)

    if "grad" in phases:
        w0 = jnp.asarray(rng.standard_normal((g.e_pad,)), jnp.float32)

        @jax.jit
        def run_fwd_w(g, w, x):
            def body(i, x):
                y = ops.propagate(ops.w_mul_xj, g, "sum", xj=x, e=w)
                return x * 0.999 + y * 1e-6
            return jax.lax.fori_loop(0, ITERS, body, x)

        print(f"spmm fwd weighted: {timeit(run_fwd_w, g, w0, x):.3f} ms",
              flush=True)

        @jax.jit
        def run_grad(g, w, x):
            def body(i, carry):
                x, w = carry

                def loss(x, w):
                    y = ops.propagate(ops.w_mul_xj, g, "sum", xj=x, e=w)
                    return jnp.sum(y * y) * 1e-6

                gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
                return x * 0.999 + gx * 1e-3, w * 0.999 + gw * 1e-3
            x2, w2 = jax.lax.fori_loop(0, ITERS, body, (x, w))
            return x2 + jnp.mean(w2)

        print(f"spmm fwd+bwd weighted (grad x,w): "
              f"{timeit(run_grad, g, w0, x):.3f} ms", flush=True)

        @jax.jit
        def run_grad_x(g, x):
            def body(i, x):
                def loss(x):
                    y = ops.propagate(ops.copy_xj, g, "sum", xj=x)
                    return jnp.sum(y * y) * 1e-6
                return x * 0.999 + jax.grad(loss)(x) * 1e-3
            return jax.lax.fori_loop(0, ITERS, body, x)

        print(f"spmm fwd+bwd unweighted (grad x): "
              f"{timeit(run_grad_x, g, x):.3f} ms", flush=True)

    if "attn" in phases:
        from graphneuralnetworks_tpu.ops.attention import gat_attention
        a1 = jnp.asarray(rng.standard_normal((D, 1)), jnp.float32)
        a2 = jnp.asarray(rng.standard_normal((D, 1)), jnp.float32)

        @jax.jit
        def run_attn_fwd(g, x):
            def body(i, x):
                pi, pj = x @ a1, x @ a2
                out = gat_attention(g, pi, pj, x[:, None, :], 0.2)[:, 0, :]
                return x * 0.9 + out * 0.01
            return jax.lax.fori_loop(0, ITERS, body, x)

        print(f"attention fwd: {timeit(run_attn_fwd, g, x):.3f} ms",
              flush=True)

        @jax.jit
        def run_attn_grad(g, x):
            def body(i, x):
                def loss(x):
                    pi, pj = x @ a1, x @ a2
                    out = gat_attention(g, pi, pj, x[:, None, :], 0.2)
                    return jnp.sum(out * out) * 1e-6
                return x * 0.999 + jax.grad(loss)(x) * 1e-3
            return jax.lax.fori_loop(0, ITERS, body, x)

        print(f"attention fwd+bwd: {timeit(run_attn_grad, g, x):.3f} ms",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["grad", "attn"])


def pieces():
    """Time the individual backward components."""
    print("building graph...", flush=True)
    g = gnn.rand_graph(N, E, seed=1, build_spmm_aux=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((g.n_pad, D)), jnp.float32)
    w0 = jnp.asarray(rng.standard_normal((g.e_pad,)), jnp.float32)
    from graphneuralnetworks_tpu.ops.segment import gather
    from graphneuralnetworks_tpu.ops.pallas.spmm import BN, _scatter_grouped
    from graphneuralnetworks_tpu.ops.pallas.sddmm import (_pad_rows,
                                                          _sddmm_grouped)
    aux_f, aux_r = g.spmm_aux

    @jax.jit
    def t_wregroup(aux, w, x):
        def body(i, x):
            wg = gather(jnp.concatenate([w, jnp.zeros((1,), w.dtype)]),
                        aux.edge_perm)
            return x * 0.999 + jnp.sum(wg) * 1e-12
        return jax.lax.fori_loop(0, ITERS, body, x)

    print(f"w regroup (rev perm): {timeit(t_wregroup, aux_r, w0, x):.3f} ms",
          flush=True)

    @jax.jit
    def t_dx(g, w, x):
        from graphneuralnetworks_tpu.ops.pallas.spmm import _spmm_impl
        def body(i, x):
            wx = jnp.concatenate([w, jnp.zeros((1,), w.dtype)])
            y = _spmm_impl(x, wx, g.spmm_aux[1], g.n_pad)
            return x * 0.999 + y * 1e-6
        return jax.lax.fori_loop(0, ITERS, body, x)

    print(f"dx (rev weighted spmm): {timeit(t_dx, g, w0, x):.3f} ms",
          flush=True)

    vals = x[aux_f.senders_grp]
    n_nblk = -(-g.n_pad // BN)

    @jax.jit
    def t_dw_kernel(aux, vals, x):
        def body(i, x):
            dyp = _pad_rows(x, n_nblk * BN)
            dots = _sddmm_grouped(dyp, vals.reshape(-1, D), aux)
            return x * 0.999 + jnp.sum(dots) * 1e-12
        return jax.lax.fori_loop(0, ITERS, body, x)

    print(f"dw sddmm kernel: {timeit(t_dw_kernel, aux_f, vals, x):.3f} ms",
          flush=True)

    total = aux_f.n_eblk * aux_f.senders_grp.shape[1]
    flat0 = jnp.asarray(rng.standard_normal((total,)), jnp.float32)

    @jax.jit
    def t_ungroup(aux, flat, x):
        def body(i, x):
            fe = jnp.concatenate([flat, jnp.zeros((1,), flat.dtype)])
            dots = gather(fe, aux.edge_slot)
            return x * 0.999 + jnp.sum(dots) * 1e-12
        return jax.lax.fori_loop(0, ITERS, body, x)

    print(f"dots ungroup: {timeit(t_ungroup, aux_f, flat0, x):.3f} ms",
          flush=True)

    @jax.jit
    def t_gatherrows(aux, x):
        def body(i, x):
            v = gather(x, aux.senders_grp)
            return x * 0.999 + jnp.sum(v) * 1e-12
        return jax.lax.fori_loop(0, ITERS, body, x)

    print(f"row gather (senders_grp): {timeit(t_gatherrows, aux_r, x):.3f} "
          f"ms", flush=True)


def split():
    """fwd / fwd+dx / fwd+dw / fwd+dx+dw with the real VJP pipeline."""
    print("building graph...", flush=True)
    g = gnn.rand_graph(N, E, seed=1, build_spmm_aux=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((g.n_pad, D)), jnp.float32)
    w0 = jnp.asarray(rng.standard_normal((g.e_pad,)), jnp.float32)

    @jax.jit
    def run_dx(g, w, x):
        def loss(x, w):
            y = ops.propagate(ops.w_mul_xj, g, "sum", xj=x, e=w)
            return jnp.sum(y * y) * 1e-6

        def body(i, x):
            return x * 0.999 + jax.grad(loss, argnums=0)(x, w) * 1e-3
        return jax.lax.fori_loop(0, ITERS, body, x)

    @jax.jit
    def run_dw(g, w, x):
        def loss(x, w):
            y = ops.propagate(ops.w_mul_xj, g, "sum", xj=x, e=w)
            return jnp.sum(y * y) * 1e-6

        def body(i, carry):
            x, w = carry
            gw = jax.grad(loss, argnums=1)(x, w)
            return x, w * 0.999 + gw * 1e-3
        x2, w2 = jax.lax.fori_loop(0, ITERS, body, (x, w))
        return x2 + jnp.mean(w2)

    print(f"fwd+dx: {timeit(run_dx, g, w0, x):.3f} ms", flush=True)
    print(f"fwd+dw: {timeit(run_dw, g, w0, x):.3f} ms", flush=True)
