"""Multi-chip scaling benchmark: halo-exchange propagate over a mesh.

North-star metric (BASELINE.md): edges/s at 1 chip vs N chips, scaling
efficiency >= 75%. On real multi-chip hardware run as-is; on a single host
pass --virtual N to simulate the sharding on N virtual CPU devices (validates
the program and measures *relative* overhead, not real ICI bandwidth).

Graph families (--graph):
  community: stochastic-block-model with SHUFFLED node ids (64 hidden
    communities, 80% intra edges) — the locality profile of real GNN
    workloads (products co-purchase, social, road nets), with the locality
    hidden from the node ordering so the partitioner must find it.
  powerlaw: same hidden communities + zipf-skewed sender degrees (hub
    nodes), the adversarial-degree variant.
  uniform: Erdos-Renyi — NO partitioner can beat a ~(P-1)/P cut on an
    expander (see benchmarks/PARTITION_STUDY.md); kept as the worst case.

Partitioners (--partitioner): "range" = balanced contiguous ids (only
preserves pre-existing ordering locality), "bfs" = parallel.partition_nodes
(balanced BFS growth + LDG refinement).

Prints JSON rows {devices, ms_per_step, edges_per_s, efficiency, ...}.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse
import json
import time


def make_graph(kind: str, n: int, e: int, seed: int = 0):
    """Host edge list (senders, receivers) for the chosen family."""
    import numpy as np
    rng = np.random.default_rng(seed)
    if kind == "uniform":
        s = rng.integers(0, n, e, dtype=np.int64)
        r = rng.integers(0, n, e, dtype=np.int64)
        return s.astype(np.int32), r.astype(np.int32)
    ncomm, p_intra = 64, 0.8
    comm = rng.permutation(n) % ncomm            # hidden, id-shuffled
    members = [np.nonzero(comm == c)[0] for c in range(ncomm)]
    if kind == "community":
        s = rng.integers(0, n, e, dtype=np.int64)
    elif kind == "powerlaw":
        # zipf-ish sender skew within the node set (hubs)
        u = rng.random(e)
        s = np.asarray((n * u ** 3), np.int64)   # heavy head at low ids
        s = rng.permutation(n)[s]                # decouple skew from ids
    else:
        raise ValueError(f"unknown graph kind {kind!r}")
    r = rng.integers(0, n, e, dtype=np.int64)
    intra = rng.random(e) < p_intra
    cs = comm[s]
    for c in range(ncomm):
        m = intra & (cs == c)
        if m.any():
            r[m] = rng.choice(members[c], int(m.sum()))
    return s.astype(np.int32), r.astype(np.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices")
    ap.add_argument("--nodes", type=int, default=65536)
    ap.add_argument("--edges", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--graph", type=str, default="community",
                    choices=["community", "powerlaw", "uniform"])
    ap.add_argument("--partitioner", type=str, default="bfs",
                    choices=["bfs", "range"])
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
                                                  partition_graph,
                                                  partition_nodes)

    s, r = make_graph(args.graph, args.nodes, args.edges)
    g = gnn.graph(s, r, num_nodes=args.nodes)
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
    SPMM_EDGES_PER_S_1CHIP = 2_000_000 / 6.32e-3   # BENCH_r04 large_graph

    rows = []
    n_avail = len(jax.devices())
    base_rate = None
    for p in [1, 2, 4, 8, 16, 32]:
        if p > n_avail:
            break
        mesh = Mesh(np.array(jax.devices()[:p]), ("graph",))
        t_part = time.perf_counter()
        parts = (partition_nodes(s, r, nn_, p)
                 if args.partitioner == "bfs" and p > 1 else None)
        pg = partition_graph(g, p, parts=parts)
        t_part = time.perf_counter() - t_part
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
        # analytic v5e projection. The halo-overlap split
        # (shard._halo_propagate_split) aggregates owned-sender edges while
        # the all_to_all is in flight, so per step:
        #   t_own  = (1-cut) * t_comp   (hidden behind comm when shorter)
        #   t_rem  = cut * t_comp       (starts after the buffer lands)
        #   t_step = max(t_own, t_comm) + t_rem
        # The no-overlap column (t_comp + t_comm) is kept for comparison.
        halo_bytes = pg.halo_bytes_per_step(args.d)
        cut = pg.cut_fraction
        t_comp = (args.edges / p) / SPMM_EDGES_PER_S_1CHIP
        # per-chip comm: halo bytes over ICI + ~10us collective launch; the
        # send-side row gather (HBM read before the collective can start)
        # is not overlappable either
        ALPHA_S, HBM_GBPS = 10e-6, 819.0
        bpc = halo_bytes / max(p, 1)
        t_comm = (bpc / (ICI_GBPS * 1e9) + ALPHA_S) if p > 1 else 0
        t_gather = bpc / (HBM_GBPS * 1e9) if p > 1 else 0
        t_step = t_gather + max((1 - cut) * t_comp, t_comm) + cut * t_comp
        eff_overlap = t_comp / t_step
        eff_nooverlap = t_comp / (t_gather + t_comp + t_comm)
        row = {
            "devices": p,
            "graph": args.graph,
            "partitioner": args.partitioner if p > 1 else "-",
            "ms_per_step": round(dt * 1e3, 3),
            "edges_per_s": round(rate),
            "efficiency": round(rate / (base_rate * p), 3),
            "h_max": pg.h_max,
            "h_rem": pg.h_rem,
            "cut_fraction": round(cut, 4),
            "partition_s": round(t_part, 2),
            "halo_mb_per_step": round(halo_bytes / 1e6, 3),
            "ici_model_efficiency": round(eff_overlap, 3),
            "ici_model_efficiency_nooverlap": round(eff_nooverlap, 3),
            "ici_model_ms": round(t_step * 1e3, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({
                "config": {"nodes": args.nodes, "edges": args.edges,
                           "d": args.d, "graph": args.graph,
                           "partitioner": args.partitioner,
                           "virtual_cpu_devices": args.virtual or None,
                           "ici_gbps_assumed": ICI_GBPS,
                           "spmm_edges_per_s_1chip": SPMM_EDGES_PER_S_1CHIP},
                "note": ("--virtual rows measure RELATIVE sharding overhead "
                         "on a CPU mesh (no real ICI); ici_model_* columns "
                         "are the analytic v5e projection from the "
                         "partition's measured cut, with and without the "
                         "halo-overlap term (shard._halo_propagate_split)"),
                "rows": rows,
            }, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
