"""Neural graph ODE on Cora: continuous-depth GCN dynamics.

Reference: GraphNeuralNetworks/examples/neural_ode_cora.jl — embed with a
GCNConv, evolve the hidden state through a NeuralODE whose dynamics are a
2-layer GCN chain over the fixed graph, then decode classes.

TPU-first: instead of the reference's adaptive Tsit5 solver (data-dependent
step control does not fit XLA's static-trace model), the ODE is integrated
with a fixed-step RK4 under `lax.scan` — fully jittable, differentiable by
reverse-mode AD through the scan (checkpointed by XLA), and every stage is
the same fused GCN SpMM kernel. `WithGraph` is unnecessary: the graph rides
the pytree as a jit argument.
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

from graphneuralnetworks_tpu import models as M
from graphneuralnetworks_tpu.data.datasets import load_cora


class GCNDynamics(nnx.Module):
    """dx/dt = GNNChain(GCNConv, GCNConv)(g, x) (neural_ode_cora.jl:33-34)."""

    def __init__(self, nh, rngs):
        self.c1 = M.GCNConv(nh, nh, jax.nn.relu, rngs=rngs)
        self.c2 = M.GCNConv(nh, nh, jax.nn.relu, rngs=rngs)

    def __call__(self, g, x):
        return self.c2(g, self.c1(g, x))


class NeuralGDE(nnx.Module):
    """GCN embed -> RK4-integrated GCN dynamics over t in [0, 1] -> head."""

    def __init__(self, nin, nh, nout, steps, rngs):
        self.embed = M.GCNConv(nin, nh, jax.nn.relu, rngs=rngs)
        self.dyn = GCNDynamics(nh, rngs)
        self.head = nnx.Linear(nh, nout, rngs=rngs)
        self.steps = steps

    def __call__(self, g, x):
        h0 = self.embed(g, x)
        dt = 1.0 / self.steps

        def rk4(h, _):
            k1 = self.dyn(g, h)
            k2 = self.dyn(g, h + 0.5 * dt * k1)
            k3 = self.dyn(g, h + 0.5 * dt * k2)
            k4 = self.dyn(g, h + dt * k3)
            return h + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

        h, _ = jax.lax.scan(rk4, h0, None, length=self.steps)
        return self.head(h)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--nhidden", type=int, default=16)
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()

    data, is_real = load_cora()
    g = data.graph
    X, y = g.x, g.nodes["y"]
    train_mask = jnp.asarray(data.train_mask)
    test_mask = np.asarray(data.test_mask).astype(bool)
    nout = data.num_classes
    print(f"real dataset: {is_real}  nodes={int(g.num_nodes)} "
          f"classes={nout}")

    model = NeuralGDE(X.shape[1], args.nhidden, nout, args.steps,
                      nnx.Rngs(0))
    gd, state = nnx.split(model)
    tx = optax.adam(1e-2)
    opt_state = tx.init(state)

    @jax.jit
    def step(state, opt_state, g, X, y):
        def loss_fn(st):
            logits = nnx.merge(gd, st)(g, X)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.sum(ls * train_mask) / jnp.sum(train_mask)

        loss, grads = jax.value_and_grad(loss_fn)(state)
        upd, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(state, upd), opt_state, loss

    @jax.jit
    def logits_fn(state, g, X):
        return nnx.merge(gd, state)(g, X)

    for epoch in range(1, args.epochs + 1):
        state, opt_state, loss = step(state, opt_state, g, X, y)
        if epoch % 10 == 0 or epoch == 1:
            pred = np.argmax(np.asarray(logits_fn(state, g, X)), axis=1)
            acc = float((pred[test_mask] == np.asarray(y)[test_mask]).mean())
            print(f"epoch {epoch:3d}  loss {float(loss):.4f}  "
                  f"test acc {acc:.3f}")


if __name__ == "__main__":
    main()
