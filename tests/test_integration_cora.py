"""End-to-end Cora-bar integration test.

Reference: GraphNeuralNetworks/test/examples/node_classification_cora.jl —
seven 2-layer models each trained briefly must reach train acc > 94% / test
acc > 69% (:100-101). Same protocol here on the seeded Cora-analog dataset
(data/datasets.py): 2-layer GNN + Dense head, Adam, full-batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx

import graphneuralnetworks_tpu as gnn
from graphneuralnetworks_tpu import models as M
from graphneuralnetworks_tpu.data.datasets import load_cora
from graphneuralnetworks_tpu.training import (TrainState, make_train_step,
                                              masked_accuracy,
                                              masked_cross_entropy)

NHIDDEN = 16
EPOCHS = 40


def _dataset():
    # uses the REAL Cora (raw Planetoid pickles / npz) when present on disk
    # ($GNN_CORA_DIR, ./data/cora, ~/.datasets/cora) — the reference's exact
    # bar; falls back to the seeded synthetic analog offline.
    if not hasattr(_dataset, "_cache"):
        data, is_real = load_cora(seed=1)
        print(f"[cora integration] real dataset: {is_real}")
        _dataset._cache = data
    return _dataset._cache


def make_models(din, nh, nout):
    def build(name):
        r = nnx.Rngs(17)
        if name == "GCN":
            return M.GNNChain(M.GCNConv(din, nh, jax.nn.relu, rngs=r),
                              M.GCNConv(nh, nh, jax.nn.relu, rngs=r),
                              nnx.Linear(nh, nout, rngs=r))
        if name == "GraphConv":
            return M.GNNChain(M.GraphConv(din, nh, jax.nn.relu, rngs=r),
                              M.GraphConv(nh, nh, jax.nn.relu, rngs=r),
                              nnx.Linear(nh, nout, rngs=r))
        if name == "SAGE":
            return M.GNNChain(M.SAGEConv(din, nh, jax.nn.relu, rngs=r),
                              M.SAGEConv(nh, nh, jax.nn.relu, rngs=r),
                              nnx.Linear(nh, nout, rngs=r))
        if name == "GAT":
            return M.GNNChain(
                M.GATConv(din, nh, jax.nn.relu, heads=2, concat=True,
                          rngs=r),
                M.GATConv(2 * nh, nh, jax.nn.relu, heads=2, concat=False,
                          rngs=r),
                nnx.Linear(nh, nout, rngs=r))
        if name == "GIN":
            return M.GNNChain(
                M.GINConv(M.MLP([din, nh], jax.nn.relu, rngs=r), 0.01),
                M.GINConv(M.MLP([nh, nh], jax.nn.relu, rngs=r), 0.01),
                nnx.Linear(nh, nout, rngs=r))
        if name == "ResGated":
            return M.GNNChain(
                M.ResGatedGraphConv(din, nh, jax.nn.relu, rngs=r),
                M.ResGatedGraphConv(nh, nh, jax.nn.relu, rngs=r),
                nnx.Linear(nh, nout, rngs=r))
        if name == "Transformer":
            return M.GNNChain(
                M.TransformerConv(din, nh, heads=2, concat=False, rngs=r),
                M.TransformerConv(nh, nh, heads=2, concat=False, rngs=r),
                nnx.Linear(nh, nout, rngs=r))
        raise KeyError(name)
    return build


@pytest.mark.parametrize("name", ["GCN", "GraphConv", "SAGE", "GAT", "GIN",
                                  "ResGated", "Transformer"])
def test_cora_accuracy_bar(name):
    data = _dataset()
    g = data.graph
    x = g.nodes["x"]
    y = g.nodes["y"]
    model = make_models(x.shape[-1], NHIDDEN, data.num_classes)(name)
    state = TrainState(model, optax.adam(1e-2))

    train_mask = jnp.asarray(data.train_mask)
    test_mask = jnp.asarray(data.test_mask)

    def loss_fn(m, g, x, y, mask):
        return masked_cross_entropy(m(g, x), y, mask)

    step = make_train_step(state, loss_fn)
    params, opt_state = state.params, state.opt_state
    for _ in range(EPOCHS):
        params, opt_state, loss = step(params, opt_state, g, x, y,
                                       train_mask)

    logits = state.model(params)(g, x)
    train_acc = float(masked_accuracy(logits, y, train_mask))
    test_acc = float(masked_accuracy(logits, y, test_mask))
    # the reference CI bar (node_classification_cora.jl:100-101)
    assert train_acc > 0.94, f"{name}: train acc {train_acc}"
    assert test_acc > 0.69, f"{name}: test acc {test_acc}"
