"""Hetero relations with spmm_aux ride the Pallas kernels."""

import jax.numpy as jnp
import numpy as np

import graphneuralnetworks_tpu as gnn


def test_hetero_spmm_aux_kernel_parity():
    """Relations carrying spmm_aux ride the Pallas kernels; results match
    the aux-less XLA path end-to-end through HeteroGraphConv (fwd+grads)."""
    import dataclasses
    import jax
    from flax import nnx
    from graphneuralnetworks_tpu import models as M

    g = gnn.rand_heterograph(
        {"user": 37, "item": 53},
        {("user", "rates", "item"): 210, ("item", "rated_by", "user"): 210},
        seed=3, build_spmm_aux=True)
    assert g.relations[("user", "rates", "item")].spmm_aux is not None
    g_xla = dataclasses.replace(g, relations={
        et: dataclasses.replace(rel, spmm_aux=None)
        for et, rel in g.relations.items()})
    rng = np.random.default_rng(5)
    x = {"user": jnp.asarray(rng.standard_normal(
             (g.n_pad("user"), 6)), jnp.float32),
         "item": jnp.asarray(rng.standard_normal(
             (g.n_pad("item"), 6)), jnp.float32)}
    conv = M.HeteroGraphConv({
        ("user", "rates", "item"): M.SAGEConv(6, 4, rngs=nnx.Rngs(0)),
        ("item", "rated_by", "user"): M.GraphConv(6, 4, rngs=nnx.Rngs(1)),
    })
    y1 = conv(g, x)
    y2 = conv(g_xla, x)
    for t in y1:
        np.testing.assert_allclose(np.asarray(y1[t]), np.asarray(y2[t]),
                                   rtol=2e-5, atol=2e-5)
    gd = nnx.graphdef(conv)

    def loss(state, gg):
        m = nnx.merge(gd, state)
        out = m(gg, x)
        return sum(jnp.sum(v ** 2) for v in out.values())

    s = nnx.state(conv)
    g1 = jax.grad(loss)(s, g)
    g2 = jax.grad(loss)(s, g_xla)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=3e-5)
