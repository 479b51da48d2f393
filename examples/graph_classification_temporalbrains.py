"""Temporal-graph classification: GIN + global pooling over snapshots.

Reference: GraphNeuralNetworks/examples/graph_classification_temporalbrains.jl
(gender classification on fMRI-derived temporal brain graphs; the reference
header states 65-70% accuracy). The TemporalBrains files are not shippable in
the zero-egress sandbox, so this example trains on a seeded synthetic analog
with the same shape: subjects are `TemporalGraph`s (T snapshots over the same
node set, edges and signals varying over time) and the label depends on the
*temporal* connectivity/signal statistics. Architecture mirrors the
reference: GINConv(MLP) per snapshot -> mean pool per snapshot -> mean over
time -> linear head.
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
from graphneuralnetworks_tpu.temporal import TemporalGraph


def make_subject(rng, label, n=24, T=6):
    """One synthetic 'brain': T snapshots; class 1 has denser, faster-
    rewiring connectivity and higher-frequency node signals."""
    p_edge = 0.08 if label == 0 else 0.18
    rewire = 0.1 if label == 0 else 0.6
    freq = 0.5 if label == 0 else 1.5
    A = rng.random((n, n)) < p_edge
    phase = rng.random(n) * np.pi
    snaps = []
    for t in range(T):
        flip = rng.random((n, n)) < rewire * p_edge
        A = np.where(flip, rng.random((n, n)) < p_edge, A)
        s, r = np.nonzero(A)
        sig = np.sin(freq * t + phase).astype(np.float32)[:, None]
        x = np.concatenate([np.eye(n, dtype=np.float32), sig], axis=1)
        snaps.append(gnn.graph(s, r, num_nodes=n, nodes={"x": x},
                               e_pad=1024))
    return TemporalGraph.from_snapshots(snaps, uniform=True,
                                        tgdata={"y": np.int32(label)})


class GenderPredictionModel(nnx.Module):
    """GIN per snapshot -> mean pool -> time mean -> 2-way head
    (mirrors the reference model, temporalbrains.jl:58-82)."""

    def __init__(self, nfeatures, nhidden, rngs):
        mlp = M.MLP([nfeatures, nhidden, nhidden], final_act=jax.nn.relu,
                    rngs=rngs)
        self.gin = M.GINConv(mlp, 0.5)
        self.pool = M.GlobalPool("mean")
        self.head = nnx.Linear(nhidden, 2, rngs=rngs)

    def __call__(self, tg: TemporalGraph):
        hs = [self.pool(g, self.gin(g, g.x))[0] for g in tg.snapshots]
        return self.head(jnp.mean(jnp.stack(hs), axis=0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--subjects", type=int, default=80)
    ap.add_argument("--nhidden", type=int, default=64)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    # real TemporalBrains when its files are on disk
    # (data/datasets.temporalbrains_from_files; $GNN_TEMPORALBRAINS_DIR),
    # else the seeded synthetic analog
    from graphneuralnetworks_tpu.data import load_temporalbrains
    real, is_real = load_temporalbrains()
    if is_real:
        ns = min(args.subjects, real.num_subjects)
        labels = real.labels[:ns]
        subjects = [real.subject(i) for i in range(ns)]
        print(f"real TemporalBrains: {ns} subjects, "
              f"{real.num_snapshots} snapshots")
    else:
        labels = np.arange(args.subjects) % 2     # balanced classes
        subjects = [make_subject(rng, int(y)) for y in labels]
    n_train = int(0.8 * len(subjects))
    nfeat = subjects[0][0].x.shape[1]

    model = GenderPredictionModel(nfeat, args.nhidden, nnx.Rngs(0))
    gd, state = nnx.split(model)
    tx = optax.adam(5e-3)
    opt_state = tx.init(state)

    @jax.jit
    def step(state, opt_state, tg, y):
        def loss_fn(st):
            logits = nnx.merge(gd, st)(tg)
            return optax.softmax_cross_entropy_with_integer_labels(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(state)
        upd, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(state, upd), opt_state, loss

    @jax.jit
    def predict(state, tg):
        return jnp.argmax(nnx.merge(gd, state)(tg))

    def accuracy(idx):
        hit = sum(int(predict(state, subjects[i])) == int(labels[i])
                  for i in idx)
        return hit / len(idx)

    order = np.arange(n_train)
    for epoch in range(1, args.epochs + 1):
        rng.shuffle(order)
        tot = 0.0
        for i in order:
            state, opt_state, loss = step(state, opt_state, subjects[i],
                                          jnp.int32(labels[i]))
            tot += float(loss)
        if epoch % 5 == 0 or epoch == 1:
            tr = accuracy(range(n_train))
            te = accuracy(range(n_train, len(subjects)))
            print(f"epoch {epoch:3d}  loss {tot / n_train:.4f}  "
                  f"train acc {tr:.3f}  test acc {te:.3f}")
    te = accuracy(range(n_train, len(subjects)))
    print(f"final test accuracy: {te:.3f} (reference bar: 0.65-0.70, "
          "temporalbrains.jl:3)")


if __name__ == "__main__":
    main()
