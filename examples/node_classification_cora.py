"""Semi-supervised node classification (the reference's Cora example).

Reference: GraphNeuralNetworks/examples/node_classification_cora.jl — a
2-layer GCN + Dense head, Adam, full-batch training with train/test accuracy
reports. Runs here on the seeded Cora-analog dataset (no-network sandbox);
point ``--data`` at a Planetoid .npz to use the real thing.

Usage: python examples/node_classification_cora.py [--epochs 100] [--lr 1e-2]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse
import time

import jax
import jax.numpy as jnp
import optax
from flax import nnx

import graphneuralnetworks_tpu as gnn
from graphneuralnetworks_tpu import models as M
from graphneuralnetworks_tpu.data import planetoid_from_files, synthetic_cora
from graphneuralnetworks_tpu.training import (TrainState, make_train_step,
                                              masked_accuracy,
                                              masked_cross_entropy)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--nhidden", type=int, default=16)
    ap.add_argument("--data", type=str, default=None,
                    help="optional Planetoid .npz path")
    args = ap.parse_args()

    data = (planetoid_from_files(args.data) if args.data
            else synthetic_cora(seed=1))
    g = data.graph
    x, y = g.nodes["x"], g.nodes["y"]
    print(f"graph: {g}  classes={data.num_classes}")

    rngs = nnx.Rngs(17)
    model = M.GNNChain(
        M.GCNConv(x.shape[-1], args.nhidden, jax.nn.relu, rngs=rngs),
        M.GCNConv(args.nhidden, args.nhidden, jax.nn.relu, rngs=rngs),
        nnx.Linear(args.nhidden, data.num_classes, rngs=rngs),
    )
    state = TrainState(model, optax.adam(args.lr))
    train_mask = jnp.asarray(data.train_mask)
    test_mask = jnp.asarray(data.test_mask)

    def loss_fn(m, g, x, y, mask):
        return masked_cross_entropy(m(g, x), y, mask)

    step = make_train_step(state, loss_fn)
    params, opt_state = state.params, state.opt_state
    t0 = time.perf_counter()
    for epoch in range(1, args.epochs + 1):
        params, opt_state, loss = step(params, opt_state, g, x, y,
                                       train_mask)
        if epoch % 10 == 0 or epoch == 1:
            logits = state.model(params)(g, x)
            tr = masked_accuracy(logits, y, train_mask)
            te = masked_accuracy(logits, y, test_mask)
            print(f"epoch {epoch:4d}  loss {float(loss):.4f}  "
                  f"train {float(tr):.3f}  test {float(te):.3f}")
    print(f"total {time.perf_counter() - t0:.1f}s on "
          f"{jax.default_backend()}")


if __name__ == "__main__":
    main()
