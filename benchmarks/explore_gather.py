"""Measurement probes for the round-4 SpMM fusion design.

The round-3 roofline showed the SpMM path moving 3x minimal bytes; the
planned fix is to fuse the sender gather into the scatter kernel. But the
bf16 result (only 4% faster where bytes halve) suggests the XLA row-gather
is ROW-RATE bound, not bandwidth bound — in which case in-kernel per-row
DMA cannot beat it and the design must change. These probes establish:

  p1: XLA gather rate vs row width + dtype (row-rate or bandwidth bound?)
  p2: scatter kernel alone on pre-grouped values (the kernel's share)
  p3: full current spmm forward (sanity: ~6.4 ms at 2M/131k/128)
  p4: can Mosaic do dynamic row-gather from a VMEM table at all, and how fast
  p5: per-row DMA issue rate inside a pallas kernel (HBM -> VMEM)
  p6: VMEM capacity probe (how big a table can live on-chip)

Run: python benchmarks/explore_gather.py p1 [p2 ...]   (on the real TPU)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E, N = 2_000_000, 131072
BN, BE = 128, 512


def timeit(fn, *args, iters=20):
    """CLAUDE.md recipe: chained fori_loop inside fn; novel-data warmup;
    scalar fetch confirms completion."""
    out = fn(*args[:-1], args[-1] + 1.0)
    float(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    out = fn(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3  # ms/iter


def p1():
    """XLA gather rate vs D and dtype."""
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, size=E), jnp.int32)
    for dt in (jnp.float32, jnp.bfloat16):
        for d in (64, 128, 256, 512):
            x = jnp.asarray(rng.standard_normal((N, d)), dt)
            iters = 10

            @jax.jit
            def run(idx, x):
                def body(i, x):
                    y = x.at[idx].get(mode="promise_in_bounds")
                    # fold back so the loop carries a [N, d] array
                    return x * 0.999 + y[:N] * 0.001
                return jax.lax.fori_loop(0, iters, body, x)

            ms = timeit(run, idx, x, iters=iters)
            bytes_moved = E * d * x.dtype.itemsize * 2  # read + write
            print(f"p1 gather D={d} {x.dtype.name}: {ms:.3f} ms  "
                  f"{bytes_moved / ms / 1e6:.0f} GB/s  "
                  f"{ms * 1e6 / E:.2f} ns/row", flush=True)


def _make_aux_and_x(d, dt=jnp.float32):
    sys.path.insert(0, ".")
    import graphneuralnetworks_tpu as gnn
    g = gnn.rand_graph(N, E, seed=1, build_spmm_aux=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((g.n_pad, d)), dt)
    return g, x


def p2():
    """Scatter kernel alone on a pre-grouped buffer."""
    from graphneuralnetworks_tpu.ops.pallas.spmm import _scatter_grouped
    g, x = _make_aux_and_x(128)
    aux = g.spmm_aux[0]
    vals = x[aux.senders_grp]
    iters = 10

    @jax.jit
    def run(aux, vals):
        def body(i, v):
            y = _scatter_grouped(v, aux, g.n_pad)
            return v * 0.999 + y[aux.senders_grp] * 0.0  # keep shape, cheap
        return jax.lax.fori_loop(0, iters, body, vals)

    # simpler: time scatter only, carrying vals
    @jax.jit
    def run2(aux, vals):
        def body(i, carry):
            y = _scatter_grouped(carry[0], aux, g.n_pad)
            return (carry[0] * 0.999, y)
        return jax.lax.fori_loop(0, iters, body,
                                 (vals, jnp.zeros((g.n_pad, 128))))

    ms = timeit(run2, aux, vals, iters=iters)
    print(f"p2 scatter-kernel alone: {ms:.3f} ms", flush=True)


def p3():
    from graphneuralnetworks_tpu import ops
    g, x = _make_aux_and_x(128)
    iters = 10

    @jax.jit
    def run(g, x):
        def body(i, x):
            return ops.propagate(ops.copy_xj, g, "sum", xj=x) * 0.001
        return jax.lax.fori_loop(0, iters, body, x)

    ms = timeit(run, g, x, iters=iters)
    print(f"p3 full spmm fwd: {ms:.3f} ms", flush=True)


def p4():
    """Dynamic row-gather from a VMEM table inside a kernel."""
    rng = np.random.default_rng(0)
    for t_rows in (2048, 32768, 131072):
        for d in (128,):
            tbl = jnp.asarray(rng.standard_normal((t_rows, d)), jnp.float32)
            idx = jnp.asarray(rng.integers(0, t_rows, size=(4096, BE)),
                              jnp.int32)

            variant = globals().get("P4_VARIANT", "take")

            def kern(idx_ref, tbl_ref, out_ref):
                iv = idx_ref[0, 0]
                if variant == "take":
                    out_ref[:] = jnp.take(tbl_ref[:], iv, axis=0)
                elif variant == "take_along":
                    out_ref[:] = jnp.take_along_axis(
                        tbl_ref[:], iv[:, None], axis=0)
                elif variant == "loop":
                    def body(i, _):
                        out_ref[pl.ds(i, 1), :] = tbl_ref[pl.ds(iv[i], 1), :]
                        return 0
                    jax.lax.fori_loop(0, BE, body, 0)

            def call(idx, tbl):
                return pl.pallas_call(
                    kern,
                    grid=(idx.shape[0],),
                    in_specs=[
                        pl.BlockSpec((1, 1, BE), lambda k: (k, 0, 0)),
                        pl.BlockSpec((t_rows, d), lambda k: (0, 0)),
                    ],
                    out_specs=pl.BlockSpec((BE, d), lambda k: (k, 0)),
                    out_shape=jax.ShapeDtypeStruct((idx.shape[0] * BE, d),
                                                   jnp.float32),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=128 * 1024 * 1024),
                )(idx[:, None, :], tbl)

            run = jax.jit(call)

            try:
                out = run(idx, tbl)
                ref = tbl[idx.reshape(-1)]
                ok = bool(jnp.allclose(out, ref))
                # time it
                iters = 10

                @jax.jit
                def run_t(idx, tbl):
                    def body(i, t):
                        y = call(idx, t)
                        return t * 0.999 + y[:t_rows] * 0.001
                    return jax.lax.fori_loop(0, iters, body, tbl)

                ms = timeit(run_t, idx, tbl, iters=iters)
                nrows = idx.size
                print(f"p4 vmem-gather T={t_rows} D={d}: OK correct={ok} "
                      f"{ms:.3f} ms  {ms * 1e6 / nrows:.2f} ns/row",
                      flush=True)
            except Exception as ex:  # noqa: BLE001
                print(f"p4 vmem-gather T={t_rows} D={d}: FAIL "
                      f"{type(ex).__name__}: {str(ex)[:300]}", flush=True)


def p5():
    """Per-row DMA gather rate: copy BE random rows per block HBM->VMEM."""
    rng = np.random.default_rng(0)
    d = 128
    n_blk = 512  # 512*512 = 262k rows — enough to measure rate
    x = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, size=(n_blk, BE)), jnp.int32)

    idx = idx[:, None, :]

    def kern(idx_ref, x_hbm, out_ref):
        def body(scratch, sems):
            def mk(i):
                r = idx_ref[0, 0, i]
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(r, 1), :],
                    scratch.at[pl.ds(i, 1), :],
                    sems.at[i % 16],
                )

            def loop(i, _):
                mk(i).start()
                return 0
            jax.lax.fori_loop(0, BE, loop, 0)

            def wloop(i, _):
                mk(i).wait()
                return 0
            jax.lax.fori_loop(0, BE, wloop, 0)
            out_ref[:] = scratch[:]
        pl.run_scoped(body,
                      pltpu.VMEM((BE, d), jnp.float32),
                      pltpu.SemaphoreType.DMA((16,)))

    @jax.jit
    def run(idx, x):
        return pl.pallas_call(
            kern,
            grid=(n_blk,),
            in_specs=[
                pl.BlockSpec((1, 1, BE), lambda k: (k, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((BE, d), lambda k: (k, 0)),
            out_shape=jax.ShapeDtypeStruct((n_blk * BE, d), jnp.float32),
        )(idx, x)

    try:
        out = run(idx, x)
        ref = x[idx.reshape(-1)]  # idx is 3D; reshape flattens fine
        ok = bool(jnp.allclose(out, ref))
        iters = 10

        @jax.jit
        def run_t(idx, x):
            def body(i, t):
                y = pl.pallas_call(
                    kern,
                    grid=(n_blk,),
                    in_specs=[
                        pl.BlockSpec((1, 1, BE), lambda k: (k, 0, 0),
                                     memory_space=pltpu.SMEM),
                        pl.BlockSpec(memory_space=pltpu.ANY),
                    ],
                    out_specs=pl.BlockSpec((BE, d), lambda k: (k, 0)),
                    out_shape=jax.ShapeDtypeStruct((n_blk * BE, d),
                                                   jnp.float32),
                )(idx, t)
                return t * 0.999 + y[:N] * 0.001
            return jax.lax.fori_loop(0, iters, body, x)

        ms = timeit(run_t, idx, x, iters=iters)
        nrows = idx.size
        print(f"p5 dma-gather: OK correct={ok} {ms:.3f} ms for {nrows} rows "
              f"= {ms * 1e6 / nrows:.2f} ns/row "
              f"(at 2M rows: {ms * E / nrows:.1f} ms)", flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"p5 dma-gather: FAIL {type(ex).__name__}: {str(ex)[:300]}",
              flush=True)


def p6():
    """VMEM capacity probe."""
    for mb in (16, 32, 64, 100, 120):
        rows = mb * 1024 * 1024 // (128 * 4)
        x = jnp.zeros((rows, 128), jnp.float32)

        def kern(x_ref, out_ref):
            out_ref[:] = x_ref[pl.ds(0, 8), :] + x_ref[pl.ds(rows - 8, 8), :]

        try:
            out = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=130 * 1024 * 1024),
            )(x)
            out.block_until_ready()
            print(f"p6 vmem {mb} MB table: OK", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"p6 vmem {mb} MB table: FAIL {type(ex).__name__}: "
                  f"{str(ex)[:200]}", flush=True)
            break


def p7():
    """Concurrency: one 2M gather vs two 1M gathers vs four 512k."""
    rng = np.random.default_rng(0)
    d = 128
    x = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, size=E), jnp.int32)
    for parts in (1, 2, 4):
        sz = E // parts
        iters = 10

        @jax.jit
        def run(idx, x):
            def body(i, x):
                ys = [x.at[idx[p * sz:(p + 1) * sz]].get(
                    mode="promise_in_bounds") for p in range(parts)]
                acc = x * 0.999
                for y in ys:
                    acc = acc + y[:N] * 0.001
                return acc
            return jax.lax.fori_loop(0, iters, body, x)

        ms = timeit(run, idx, x, iters=iters)
        print(f"p7 gather parts={parts}: {ms:.3f} ms "
              f"{ms * 1e6 / E:.2f} ns/row", flush=True)


def p8():
    """Does index locality / table size change the row rate?"""
    rng = np.random.default_rng(0)
    d = 128
    iters = 10
    cases = {
        "random T=131072": (N, rng.integers(0, N, size=E)),
        "sorted T=131072": (N, np.sort(rng.integers(0, N, size=E))),
        "blocksorted(512) T=131072": (
            N, np.sort(rng.integers(0, N, size=3907 * 512)
                       .reshape(-1, 512), axis=1).reshape(-1)[:E]),
        "random T=8192": (8192, rng.integers(0, 8192, size=E)),
        "random T=1024": (1024, rng.integers(0, 1024, size=E)),
    }
    for name, (t_rows, idx_np) in cases.items():
        print(f"p8 case {name} ...", flush=True)
        x = jnp.asarray(rng.standard_normal((t_rows, d)), jnp.float32)
        idx = jnp.asarray(idx_np, jnp.int32)

        @jax.jit
        def run(idx, x):
            def body(i, x):
                y = x.at[idx].get(mode="promise_in_bounds")
                return x * 0.999 + y[:t_rows] * 0.001
            return jax.lax.fori_loop(0, iters, body, x)

        ms = timeit(run, idx, x, iters=iters)
        print(f"p8 gather {name}: {ms:.3f} ms {ms * 1e6 / E:.2f} ns/row",
              flush=True)


def p9():
    """Bitcast packing: does viewing wide rows as fewer wider lanes restore
    the 1-descriptor rate? (p1 showed the gather charges per 128-lane chunk.)
    """
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, size=E), jnp.int32)
    iters = 10
    cases = []
    xb = jnp.asarray(rng.standard_normal((N, 256)), jnp.bfloat16)
    cases.append(("bf16 D=256 direct", xb))
    cases.append(("bf16 D=256 as int32[128]", xb.view(jnp.int32)))
    xf = jnp.asarray(rng.standard_normal((N, 256)), jnp.float32)
    cases.append(("f32 D=256 direct", xf))
    try:
        cases.append(("f32 D=256 as c64[128]", xf.view(jnp.complex64)))
    except Exception as ex:  # noqa: BLE001
        print(f"p9 c64 view failed: {ex}", flush=True)
    xq = jnp.asarray(rng.standard_normal((N, 512)), jnp.bfloat16)
    cases.append(("bf16 D=512 as int32[256]", xq.view(jnp.int32)))

    for name, x in cases:
        print(f"p9 case {name} ...", flush=True)

        @jax.jit
        def run(idx, x):
            def body(i, x):
                y = x.at[idx].get(mode="promise_in_bounds")
                return jnp.concatenate([x[:1], y[: N - 1]], axis=0)
            return jax.lax.fori_loop(0, iters, body, x)

        try:
            out = run(idx, x)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = run(idx, jnp.roll(x, 1, axis=0))
            jax.block_until_ready(out)
            ms = (time.perf_counter() - t0) / iters * 1e3
            print(f"p9 gather {name}: {ms:.3f} ms {ms * 1e6 / E:.2f} ns/row",
                  flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"p9 gather {name}: FAIL {type(ex).__name__}: "
                  f"{str(ex)[:200]}", flush=True)


def p10():
    """Structured run/const gathers vs plain XLA gather on real aux maps."""
    from graphneuralnetworks_tpu.ops.runs import build_run_meta, run_gather
    import graphneuralnetworks_tpu as gnn
    print("p10 building graph ...", flush=True)
    g = gnn.rand_graph(N, E, seed=1, build_spmm_aux=True)
    print("p10 graph built", flush=True)
    aux = g.spmm_aux[0]
    rng = np.random.default_rng(0)
    e_pad = g.e_pad
    total = aux.n_eblk * aux.senders_grp.shape[1]
    perm = np.asarray(aux.edge_perm).reshape(-1)
    slot = np.asarray(aux.edge_slot)
    recv = np.asarray(g.receivers)
    iters = 10

    def bench(tag, plan_src_len, metas, src_d, plain_idx):
        src = jnp.asarray(rng.standard_normal(
            (plan_src_len,) if src_d == 1 else (plan_src_len, src_d)),
            jnp.float32)
        print(f"p10 {tag} starting ...", flush=True)
        for ch, meta in metas:
            if meta is None:
                print(f"p10 {tag} ch={ch}: meta None (K>cap)", flush=True)
                continue

            @jax.jit
            def run(src, meta=meta):
                def body(i, s):
                    y = run_gather(s, meta)
                    upd = jnp.sum(y) * 1e-12
                    return s * 0.9999 + upd
                return jax.lax.fori_loop(0, iters, body, src)

            ms = timeit(run, src, iters=iters)
            print(f"p10 {tag} ch={ch} K={meta.k}: {ms:.3f} ms", flush=True)
        idx = jnp.asarray(plain_idx, jnp.int32)

        @jax.jit
        def runp(src):
            def body(i, s):
                y = s.at[jnp.minimum(idx, plan_src_len - 1)].get(
                    mode="promise_in_bounds")
                return s * 0.9999 + jnp.sum(y) * 1e-12
            return jax.lax.fori_loop(0, iters, body, src)

        ms = timeit(runp, src, iters=iters)
        print(f"p10 {tag} plain-gather: {ms:.3f} ms", flush=True)

    # w regroup: edge-order -> slots, scalar
    bench("grp_s", e_pad + 1,
          [(c, build_run_meta(perm, ch=c, dummy_idx=e_pad)) for c in
           (128, 512)], 1, perm)
    # dy regroup: edge-order -> slots, rows D=128
    bench("grp_r", e_pad + 1,
          [(c, build_run_meta(perm, ch=c, dummy_idx=e_pad)) for c in
           (8, 16, 32)], 128, perm)
    # dots ungroup: slots -> edge order, scalar
    bench("ung_s", total,
          [(c, build_run_meta(slot, ch=c, dummy_idx=total)) for c in
           (128, 512)], 1, slot)
    # receivers const: node rows -> edges, rows D=128
    bench("recv_r", g.n_pad,
          [(c, build_run_meta(recv, ch=c, const=True)) for c in
           (16, 32, 64)], 128, recv)
    # receivers const scalar
    bench("recv_s", g.n_pad,
          [(c, build_run_meta(recv, ch=c, const=True)) for c in
           (128, 256)], 1, recv)


if __name__ == "__main__":
    for name in sys.argv[1:] or ["p1"]:
        globals()[name]()
