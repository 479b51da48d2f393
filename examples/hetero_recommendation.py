"""Heterogeneous graph training: user/movie rating prediction.

Reference analog: the HeteroGraphConv docs example
(GraphNeuralNetworks/src/layers/heteroconv.jl) — two relations
(user-rates-movie / movie-rated_by-user), per-relation convolutions merged on
destination types, trained to predict held-out ratings from a synthetic
preference model.
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


def make_data(n_users=200, n_movies=120, d=8, n_obs=3000, seed=0):
    rng = np.random.default_rng(seed)
    pu = rng.standard_normal((n_users, d)).astype(np.float32)
    pm = rng.standard_normal((n_movies, d)).astype(np.float32)
    u = rng.integers(0, n_users, n_obs)
    m = rng.integers(0, n_movies, n_obs)
    rating = np.tanh((pu[u] * pm[m]).sum(-1) / np.sqrt(d)).astype(np.float32)
    split = int(0.8 * n_obs)
    g = gnn.heterograph(
        {("user", "rates", "movie"): (u[:split], m[:split]),
         ("movie", "rated_by", "user"): (m[:split], u[:split])},
        num_nodes={"user": n_users, "movie": n_movies},
        node_data={"user": {"x": pu + 0.3 * rng.standard_normal(pu.shape)
                            .astype(np.float32)},
                   "movie": {"x": pm + 0.3 * rng.standard_normal(pm.shape)
                             .astype(np.float32)}})
    return g, (u, m, rating, split)


class Model(nnx.Module):
    def __init__(self, din, nh, rngs):
        self.conv1 = M.HeteroGraphConv({
            ("user", "rates", "movie"): M.SAGEConv(din, nh, jax.nn.relu,
                                                   rngs=rngs),
            ("movie", "rated_by", "user"): M.SAGEConv(din, nh, jax.nn.relu,
                                                      rngs=rngs),
        })
        self.conv2 = M.HeteroGraphConv({
            ("user", "rates", "movie"): M.SAGEConv(nh, nh, rngs=rngs),
            ("movie", "rated_by", "user"): M.SAGEConv(nh, nh, rngs=rngs),
        })

    def __call__(self, g, uu, mm):
        x = {t: g.node_data[t]["x"] for t in ("user", "movie")}
        h = self.conv1(g, x)
        h = self.conv2(g, h)
        return jnp.sum(h["user"][uu] * h["movie"][mm], -1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=200)
    args = ap.parse_args()

    g, (u, m, rating, split) = make_data()
    model = Model(8, 32, nnx.Rngs(0))
    state = TrainState(model, optax.adam(5e-3))

    uu = jnp.asarray(u)
    mm = jnp.asarray(m)
    rr = jnp.asarray(rating)

    def loss_fn(mod, g, uu, mm, rr):
        pred = mod(g, uu[:split], mm[:split])
        return jnp.mean((pred - rr[:split]) ** 2)

    step = make_train_step(state, loss_fn)
    params, opt_state = state.params, state.opt_state
    for epoch in range(1, args.epochs + 1):
        params, opt_state, loss = step(params, opt_state, g, uu, mm, rr)
        if epoch % 40 == 0 or epoch == 1:
            mod = state.model(params)
            pred = mod(g, uu[split:], mm[split:])
            mse = float(jnp.mean((pred - rr[split:]) ** 2))
            var = float(jnp.var(rr[split:]))
            print(f"epoch {epoch:4d}  train mse {float(loss):.4f}  "
                  f"test mse {mse:.4f}  (rating var {var:.4f})")


if __name__ == "__main__":
    main()
