"""Multi-chip scaling benchmark: halo-exchange propagate over a mesh.

North-star metric (BASELINE.md): edges/s at 1 chip vs N chips, scaling
efficiency >= 75%. On real multi-chip hardware run as-is; on a single host
pass --virtual N to simulate the sharding on N virtual CPU devices (validates
the program and measures *relative* overhead, not real ICI bandwidth).

Prints JSON rows {devices, ms_per_step, edges_per_s, efficiency}.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices")
    ap.add_argument("--nodes", type=int, default=65536)
    ap.add_argument("--edges", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", type=str, default=None,
                    help="also write all JSON rows to this file")
    args = ap.parse_args()

    if args.virtual:
        _os.environ["XLA_FLAGS"] = (
            _os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    import graphneuralnetworks_tpu as gnn
    from graphneuralnetworks_tpu.parallel import (make_sharded_propagate,
                                                  partition_graph)

    g = gnn.rand_graph(args.nodes, args.edges, seed=0)
    nn_ = int(g.num_nodes)
    x = np.random.default_rng(0).standard_normal(
        (nn_, args.d)).astype(np.float32)

    # analytic ICI model constants (one v5e-class chip): per-chip compute
    # rate from the measured single-chip SpMM (BENCH large_graph_ms) and the
    # ICI bandwidth per chip. On v5e each chip has 4 ICI links at ~100 GB/s
    # each (2D torus, ~400 GB/s aggregate; the scaling-book numbers) — a
    # ring all_to_all effectively uses ~1 link pair per neighbor exchange,
    # so we model conservative 100 GB/s per chip of halo throughput.
    ICI_GBPS = 100.0
    SPMM_EDGES_PER_S_1CHIP = 2_000_000 / 6.43e-3   # BENCH_r03 large_graph

    rows = []
    n_avail = len(jax.devices())
    base_rate = None
    for p in [1, 2, 4, 8, 16, 32]:
        if p > n_avail:
            break
        mesh = Mesh(np.array(jax.devices()[:p]), ("graph",))
        pg = partition_graph(g, p)
        run = make_sharded_propagate(mesh, pg)
        xs = pg.scatter_nodes(x)

        K = args.iters

        def chained(xs):
            def body(i, xs):
                return run(xs, pg) * 0.001
            return jax.lax.fori_loop(0, K, body, xs)

        chained_j = jax.jit(chained)
        chained_j(xs).block_until_ready()
        t0 = time.perf_counter()
        chained_j(xs).block_until_ready()
        dt = (time.perf_counter() - t0) / K
        rate = args.edges / dt
        if base_rate is None:
            base_rate = rate
        # analytic v5e projection: per-chip compute time for E/p edges at
        # the measured 1-chip SpMM rate, plus halo rows shipped over ICI
        # (max per chip = worst shard's send volume ~ halo_rows/p on a
        # balanced cut), no overlap assumed (conservative).
        halo_bytes = pg.halo_bytes_per_step(args.d)
        t_comp = (args.edges / p) / SPMM_EDGES_PER_S_1CHIP
        t_comm = (halo_bytes / max(p, 1)) / (ICI_GBPS * 1e9) if p > 1 else 0
        eff_model = t_comp / (t_comp + t_comm)
        row = {
            "devices": p,
            "ms_per_step": round(dt * 1e3, 3),
            "edges_per_s": round(rate),
            "efficiency": round(rate / (base_rate * p), 3),
            "h_max": pg.h_max,
            "cut_fraction": round(pg.cut_fraction, 4),
            "halo_mb_per_step": round(halo_bytes / 1e6, 3),
            "ici_model_efficiency": round(eff_model, 3),
            "ici_model_ms": round((t_comp + t_comm) * 1e3, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({
                "config": {"nodes": args.nodes, "edges": args.edges,
                           "d": args.d,
                           "virtual_cpu_devices": args.virtual or None,
                           "ici_gbps_assumed": ICI_GBPS,
                           "spmm_edges_per_s_1chip": SPMM_EDGES_PER_S_1CHIP},
                "note": ("--virtual rows measure RELATIVE sharding overhead "
                         "on a CPU mesh (no real ICI); ici_model_* columns "
                         "are the analytic v5e projection from the "
                         "partition's measured cut"),
                "rows": rows,
            }, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
