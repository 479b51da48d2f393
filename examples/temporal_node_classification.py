"""Temporal graph example: TGCN on a time-varying node signal.

Reference: GraphNeuralNetworks/examples/traffic_prediction_metrla.jl (TGCN
regression on METR-LA). Uses the REAL METR-LA sensor graph + speed signal
when its files are on disk ($GNN_METRLA_DIR, see README "Real datasets");
otherwise a seeded synthetic diffusion process on a random graph
(no-network sandbox). Either way: predict the next-step signal from a
window of past steps.
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
from graphneuralnetworks_tpu.training import TrainState, make_train_step


def make_series(g, T=200, seed=0):
    """Diffusion + noise signal over the graph."""
    rng = np.random.default_rng(seed)
    A = np.asarray(gnn.adjacency_matrix(g))
    deg = A.sum(0) + 1
    P = (A / deg).T
    x = rng.standard_normal(g.n_pad).astype(np.float32)
    xs = []
    for _ in range(T):
        x = 0.9 * (P @ x) + 0.4 * np.sin(x) + 0.01 * rng.standard_normal(g.n_pad)
        xs.append(x.copy())
    return np.stack(xs).astype(np.float32)  # [T, N]


def load_data(max_steps=400):
    """(graph, series [T, N_pad], is_real) — real METR-LA when on disk."""
    from graphneuralnetworks_tpu.data.datasets import load_metrla
    d, is_real = load_metrla()
    if is_real:
        g = gnn.graph(d.senders, d.receivers, num_nodes=d.num_nodes,
                      edge_weight=d.edge_weight)
        sig = d.signal[:max_steps, :, 0]
        # z-score like the DCRNN/TGCN literature, pad to capacity
        sig = (sig - sig.mean()) / max(sig.std(), 1e-6)
        series = np.zeros((sig.shape[0], g.n_pad), np.float32)
        series[:, :d.num_nodes] = sig
        return g, series, True
    g = gnn.rand_graph(128, 512, seed=0)
    return g, make_series(g), False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--window", type=int, default=8)
    args = ap.parse_args()

    g, series, is_real = load_data()
    print(f"real dataset: {is_real}  nodes={int(g.num_nodes)} "
          f"steps={len(series)}")
    W = args.window
    # windows: input [T', W, N, 1] -> predict the next step [T', N]
    xs, ys = [], []
    for t in range(len(series) - W - 1):
        xs.append(series[t:t + W][..., None])
        ys.append(series[t + W])
    xs = np.stack(xs)
    ys = np.stack(ys)
    n_train = int(0.8 * len(xs))

    rngs = nnx.Rngs(0)

    class Model(nnx.Module):
        def __init__(self):
            self.tgcn = M.TGCN(1, 32, rngs=rngs)
            self.head = nnx.Linear(32, 1, rngs=rngs)

        def __call__(self, g, x):           # x: [W, N, 1]
            h = self.tgcn(g, x)             # [W, N, 32]
            return self.head(h[-1])[:, 0]   # [N]

    model = Model()
    state = TrainState(model, optax.adam(1e-2))

    def loss_fn(m, g, x, y):
        pred = m(g, x)
        mask = g.node_mask
        return jnp.sum(((pred - y) ** 2) * mask) / jnp.sum(mask)

    step = make_train_step(state, loss_fn)
    params, opt_state = state.params, state.opt_state
    rng = np.random.default_rng(1)
    for epoch in range(1, args.epochs + 1):
        i = int(rng.integers(0, n_train))
        params, opt_state, loss = step(params, opt_state, g,
                                       jnp.asarray(xs[i]),
                                       jnp.asarray(ys[i]))
        if epoch % 10 == 0 or epoch == 1:
            # eval on a held-out window
            m = state.model(params)
            j = n_train
            pred = m(g, jnp.asarray(xs[j]))
            mask = np.asarray(g.node_mask)
            mse = float(np.mean((np.asarray(pred) - ys[j])[mask] ** 2))
            var = float(np.var(ys[j][mask]))
            print(f"epoch {epoch:3d}  train mse {float(loss):.4f}  "
                  f"test mse {mse:.4f}  (signal var {var:.4f})")


if __name__ == "__main__":
    main()
