"""Layer x graph-size benchmark sweep (the reference's perf/perf.jl analog).

Reference: GraphNeuralNetworks/perf/perf.jl:10-99 sweeps GCNConv/GATConv x
N in {10,100,1000,10000} x graph-type x CPU/GPU. Here: layer x N on the
current backend, forward and gradient, JSON rows to stdout.

Usage: python benchmarks/layer_sweep.py [--sizes 10 100 1000 10000]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse
import json

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[10, 100, 1000, 10000])
    ap.add_argument("--d", type=int, default=64)
    args = ap.parse_args()

    from flax import nnx

    from graphneuralnetworks_tpu import models as M
    from graphneuralnetworks_tpu.profiling import benchmark_layers

    factories = {
        "GCNConv": lambda i, o: M.GCNConv(i, o, rngs=nnx.Rngs(0)),
        "GATConv": lambda i, o: M.GATConv(i, o, rngs=nnx.Rngs(0)),
        "GraphConv": lambda i, o: M.GraphConv(i, o, rngs=nnx.Rngs(0)),
        "SAGEConv": lambda i, o: M.SAGEConv(i, o, rngs=nnx.Rngs(0)),
        "GINConv": lambda i, o: M.GINConv(
            M.MLP([i, o], rngs=nnx.Rngs(0)), 0.0),
    }
    rows = benchmark_layers(factories, graph_sizes=args.sizes, d=args.d)
    for r in rows:
        r["backend"] = jax.default_backend()
        print(json.dumps(r))


if __name__ == "__main__":
    main()
