"""Grouped SDDMM kernel vs the gather+reduce XLA path (+ gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import graphneuralnetworks_tpu as gnn
from graphneuralnetworks_tpu import ops
from graphneuralnetworks_tpu.ops.attention import dot_attention_logits
from graphneuralnetworks_tpu.ops.pallas.sddmm import sddmm


def _graph(n=150, e=600, seed=0):
    return gnn.rand_graph(n, e, seed=seed, build_spmm_aux=True)


@pytest.mark.parametrize("d", [4, 100, 130])
def test_sddmm_matches_gathers(d):
    g = _graph()
    rng = np.random.default_rng(1)
    xi = jnp.asarray(rng.standard_normal((g.n_pad, d)), jnp.float32)
    xj = jnp.asarray(rng.standard_normal((g.n_pad, d)), jnp.float32)
    out = sddmm(xi, xj, g.spmm_aux, (g.e_pad,))
    ref = jnp.sum(xi[g.receivers] * xj[g.senders], -1)
    ref = jnp.where(g.edge_mask, ref, 0.0)  # kernel zeroes padded edges
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_sddmm_gradients_match():
    g = _graph(n=60, e=240)
    rng = np.random.default_rng(2)
    d = 8
    xi = jnp.asarray(rng.standard_normal((g.n_pad, d)), jnp.float32)
    xj = jnp.asarray(rng.standard_normal((g.n_pad, d)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((g.e_pad,)), jnp.float32)
    tm = jnp.where(g.edge_mask, t, 0.0)

    def loss_k(a, b):
        return jnp.sum(sddmm(a, b, g.spmm_aux, (g.e_pad,)) * tm)

    def loss_ref(a, b):
        return jnp.sum(jnp.sum(a[g.receivers] * b[g.senders], -1) * tm)

    g1 = jax.grad(loss_k, argnums=(0, 1))(xi, xj)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(xi, xj)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)


@pytest.mark.parametrize("d", [16, 288])  # kernel engages above 256 lanes
def test_apply_edges_xi_dot_xj_dispatch(d):
    """apply_edges(xi_dot_xj) rides the kernel and matches the plain path."""
    g = _graph(n=80, e=320, seed=3)
    g_xla = g.replace(spmm_aux=None)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((g.n_pad, d)), jnp.float32)
    out1 = ops.apply_edges(ops.xi_dot_xj, g, xi=x, xj=x)
    out2 = ops.apply_edges(ops.xi_dot_xj, g_xla, xi=x, xj=x)
    m = np.asarray(g.edge_mask)
    np.testing.assert_allclose(np.asarray(out1)[m], np.asarray(out2)[m],
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("heads", [1, 3])
def test_dot_attention_logits_multihead(heads):
    g = _graph(n=70, e=280, seed=4)
    g_xla = g.replace(spmm_aux=None)
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((g.n_pad, heads, 6)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((g.n_pad, heads, 6)), jnp.float32)
    out1 = dot_attention_logits(g, q, k)
    out2 = dot_attention_logits(g_xla, q, k)
    m = np.asarray(g.edge_mask)
    np.testing.assert_allclose(np.asarray(out1)[m], np.asarray(out2)[m],
                               rtol=2e-5, atol=2e-5)
    t = jnp.asarray(rng.standard_normal(out1.shape), jnp.float32)
    tm = jnp.where(g.edge_mask[:, None], t, 0.0)
    g1 = jax.grad(lambda a, b: jnp.sum(dot_attention_logits(g, a, b) * tm),
                  argnums=(0, 1))(q, k)
    g2 = jax.grad(
        lambda a, b: jnp.sum(dot_attention_logits(g_xla, a, b) * tm),
        argnums=(0, 1))(q, k)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)
