"""Batched graph classification (the reference's TUDataset/MUTAG example).

Reference: GraphNeuralNetworks/examples/graph_classification_tudataset.jl —
GraphConv x2 + GlobalPool(mean) + Dense over DataLoader-collated batches.
Here batches are fixed-shape padded graphs (one compiled step per epoch;
SURVEY §3.4) over the MUTAG-analog synthetic set.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

import graphneuralnetworks_tpu as gnn
from graphneuralnetworks_tpu import models as M
from graphneuralnetworks_tpu.data import DataLoader, synthetic_tudataset
from graphneuralnetworks_tpu.training import TrainState, make_train_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--buckets", type=int, default=2,
                    help="size-quantile capacity buckets (one compiled "
                         "shape each; cuts padding on size-skewed sets)")
    args = ap.parse_args()

    graphs, labels = synthetic_tudataset(188, seed=0)
    n_train = 150
    train_loader = DataLoader(graphs[:n_train], batch_size=args.batch_size,
                              shuffle=True, seed=1,
                              num_buckets=args.buckets)
    test_loader = DataLoader(graphs[n_train:], batch_size=args.batch_size,
                             num_buckets=args.buckets)
    stats = train_loader.padding_stats()
    print(f"buckets={args.buckets} node_util={stats['node_util']:.2f} "
          f"edge_util={stats['edge_util']:.2f}")

    nin, nh = 7, 64
    rngs = nnx.Rngs(0)
    model = M.GNNChain(
        M.GraphConv(nin, nh, jax.nn.relu, rngs=rngs),
        M.GraphConv(nh, nh, jax.nn.relu, rngs=rngs),
        M.GlobalPool("mean"),
        nnx.Linear(nh, 2, rngs=rngs),
    )
    state = TrainState(model, optax.adam(args.lr))

    def loss_fn(m, gb):
        logits = m(gb, gb.nodes["x"])                 # [G_pad, 2]
        y = gb.globals_["y"]
        mask = gb.graph_mask
        ls = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(ls, y[:, None].astype(jnp.int32),
                                   axis=-1)[:, 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)

    step = make_train_step(state, loss_fn)
    params, opt_state = state.params, state.opt_state

    @jax.jit
    def accuracy(params, gb):
        m = state.model(params)
        pred = jnp.argmax(m(gb, gb.nodes["x"]), -1)
        y = gb.globals_["y"]
        mask = gb.graph_mask
        return jnp.sum((pred == y) * mask), jnp.sum(mask)

    def evaluate(loader):
        c = t = 0.0
        for gb in loader:
            ci, ti = accuracy(params, gb)
            c += float(ci)
            t += float(ti)
        return c / max(t, 1)

    for epoch in range(1, args.epochs + 1):
        for gb in train_loader:
            params, opt_state, loss = step(params, opt_state, gb)
        if epoch % 5 == 0 or epoch == 1:
            print(f"epoch {epoch:3d}  loss {float(loss):.4f}  "
                  f"train {evaluate(train_loader):.3f}  "
                  f"test {evaluate(test_loader):.3f}")


if __name__ == "__main__":
    main()
