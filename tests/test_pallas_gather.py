"""fast_gather: forward identity + kernel-backed VJP equals XLA scatter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import graphneuralnetworks_tpu as gnn
from graphneuralnetworks_tpu import ops
from graphneuralnetworks_tpu.ops.pallas.gather import fast_gather


@pytest.mark.parametrize("side", ["senders", "receivers"])
def test_fast_gather_grad_matches(side):
    g = gnn.rand_graph(150, 600, seed=0, build_spmm_aux=True)
    aux = g.spmm_aux[1] if side == "senders" else g.spmm_aux[0]
    idx = getattr(g, side)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((g.n_pad, 12)), jnp.float32)
    # padded-edge cotangents are out of contract (see fast_gather doc)
    t = jnp.asarray(rng.standard_normal((g.e_pad, 12)), jnp.float32)
    t = t * g.edge_mask[:, None]

    y = fast_gather(x, idx, aux, g.n_pad)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x[idx]))

    def loss_fast(xx):
        return jnp.sum(fast_gather(xx, idx, aux, g.n_pad) * t)

    def loss_ref(xx):
        return jnp.sum(xx[idx] * t)

    g1 = jax.grad(loss_fast)(x)
    g2 = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                               atol=1e-5)


def test_apply_edges_grads_with_aux():
    """apply_edges on an aux graph: gradients equal the no-aux XLA path."""
    g = gnn.rand_graph(60, 240, seed=2, build_spmm_aux=True)
    g0 = g.replace(spmm_aux=None)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((g.n_pad, 6)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((g.e_pad, 6)), jnp.float32)
    t = t * g.edge_mask[:, None]

    def loss(gg, xx):
        m = ops.apply_edges(lambda xi, xj, e: xi * 2.0 + xj, gg, xi=xx,
                            xj=xx)
        return jnp.sum(m * t)

    g1 = jax.grad(lambda xx: loss(g, xx))(x)
    g2 = jax.grad(lambda xx: loss(g0, xx))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                               atol=1e-5)


def test_layer_grads_with_aux_match_noaux():
    """Full GAT + SAGE gradients: aux graph vs plain graph."""
    from flax import nnx
    from graphneuralnetworks_tpu import models as M
    g = gnn.rand_graph(50, 200, seed=4, build_spmm_aux=True)
    g0 = g.replace(spmm_aux=None)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((g.n_pad, 6)), jnp.float32)
    for make in (lambda: M.GATConv(6, 5, heads=2, rngs=nnx.Rngs(0)),
                 lambda: M.SAGEConv(6, 5, rngs=nnx.Rngs(0)),
                 lambda: M.GCNConv(6, 5, rngs=nnx.Rngs(0))):
        layer = make()

        def loss(gg, xx):
            return jnp.sum(layer(gg, xx) ** 2)

        g1 = jax.grad(lambda xx: loss(g, xx))(x)
        g2 = jax.grad(lambda xx: loss(g0, xx))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=2e-4, atol=2e-5)
