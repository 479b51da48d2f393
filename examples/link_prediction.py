"""Link prediction with negative sampling + DotDecoder.

Reference: GraphNeuralNetworks/examples/link_prediction_pubmed.jl — GCN
encoder, per-edge dot decoder on positive vs negative-sampled graphs,
binary cross-entropy. Runs on the Cora-analog graph.
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
from graphneuralnetworks_tpu.data import synthetic_cora
from graphneuralnetworks_tpu.training import TrainState, make_train_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50)
    args = ap.parse_args()

    data = synthetic_cora(seed=3)
    g = data.graph
    x = g.nodes["x"]
    train_g, test_g = gnn.rand_edge_split(g, 0.9,
                                          rng=np.random.default_rng(0))
    # re-pad the training graph to a fixed capacity and attach features
    rngs = nnx.Rngs(0)
    enc = M.GNNChain(M.GCNConv(x.shape[-1], 64, jax.nn.relu, rngs=rngs),
                     M.GCNConv(64, 32, rngs=rngs))
    dec = M.DotDecoder()

    class Model(nnx.Module):
        def __init__(self):
            self.enc = enc
            self.dec = dec

        def __call__(self, g_msg, pos_g, neg_g, x):
            h = self.enc(g_msg, x[: g_msg.n_pad])
            pos = self.dec(pos_g, h[: pos_g.n_pad])[:, 0]
            neg = self.dec(neg_g, h[: neg_g.n_pad])[:, 0]
            return pos, neg

    model = Model()
    state = TrainState(model, optax.adam(1e-2))

    def bce(logits, target, mask):
        z = jax.nn.log_sigmoid(logits)
        zm = jax.nn.log_sigmoid(-logits)
        loss = -(target * z + (1 - target) * zm)
        return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1)

    def loss_fn(m, g_msg, pos_g, neg_g, x):
        pos, neg = m(g_msg, pos_g, neg_g, x)
        return (bce(pos, 1.0, pos_g.edge_mask)
                + bce(neg, 0.0, neg_g.edge_mask))

    step = make_train_step(state, loss_fn)
    params, opt_state = state.params, state.opt_state
    rng = np.random.default_rng(7)
    e_cap = train_g.e_pad
    for epoch in range(1, args.epochs + 1):
        neg_g = gnn.negative_sample(train_g,
                                    num_neg_edges=int(train_g.num_edges),
                                    rng=rng)
        # keep shapes static across epochs
        neg_g = neg_g.replace() if neg_g.e_pad == e_cap else \
            gnn.graph(np.asarray(neg_g.senders)[: int(neg_g.num_edges)],
                      np.asarray(neg_g.receivers)[: int(neg_g.num_edges)],
                      num_nodes=int(neg_g.num_nodes),
                      n_pad=train_g.n_pad, e_pad=e_cap)
        params, opt_state, loss = step(params, opt_state, train_g, train_g,
                                       neg_g, x)
        if epoch % 10 == 0 or epoch == 1:
            # AUC-ish eval: accuracy at 0 threshold on held-out edges
            m = state.model(params)
            neg_t = gnn.negative_sample(
                g, num_neg_edges=int(test_g.num_edges), rng=rng)
            neg_t = gnn.graph(
                np.asarray(neg_t.senders)[: int(neg_t.num_edges)],
                np.asarray(neg_t.receivers)[: int(neg_t.num_edges)],
                num_nodes=int(g.num_nodes), n_pad=g.n_pad,
                e_pad=test_g.e_pad)
            pos, neg = m(train_g, test_g, neg_t, x)
            acc = 0.5 * (
                float(jnp.sum((pos > 0) * test_g.edge_mask)
                      / jnp.maximum(jnp.sum(test_g.edge_mask), 1))
                + float(jnp.sum((neg < 0) * neg_t.edge_mask)
                        / jnp.maximum(jnp.sum(neg_t.edge_mask), 1)))
            print(f"epoch {epoch:3d}  loss {float(loss):.4f}  "
                  f"link acc {acc:.3f}")


if __name__ == "__main__":
    main()
