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
        print(json.dumps({
            "devices": p,
            "ms_per_step": round(dt * 1e3, 3),
            "edges_per_s": round(rate),
            "efficiency": round(rate / (base_rate * p), 3),
            "h_max": pg.h_max,
        }))


if __name__ == "__main__":
    main()
