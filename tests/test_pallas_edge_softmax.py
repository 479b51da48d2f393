"""Fused edge-softmax kernel vs the XLA attention path (+ gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import graphneuralnetworks_tpu as gnn
from graphneuralnetworks_tpu.ops.attention import attention_aggregate
from graphneuralnetworks_tpu.ops.pallas.edge_softmax import (
    edge_softmax_aggregate, segment_max_grouped)
from graphneuralnetworks_tpu.ops.segment import segment_max


def _graph(n=200, e=800, seed=0):
    return gnn.rand_graph(n, e, seed=seed, build_spmm_aux=True)


def test_segment_max_grouped_matches():
    g = _graph()
    rng = np.random.default_rng(1)
    h = 3
    lg = jnp.asarray(rng.standard_normal((g.e_pad + 1, h)), jnp.float32)
    lg = lg.at[-1].set(-jnp.inf)
    lg = jnp.where(g.edge_mask[:, None],
                   lg[:-1], -jnp.inf)
    lg_ext = jnp.concatenate([lg, jnp.full((1, h), -jnp.inf)])
    mx = segment_max_grouped(lg_ext, g.spmm_aux[0], g.n_pad)
    ref = segment_max(lg, g.receivers, g.n_pad, mask=g.edge_mask,
                      sorted=True, empty_value=None)
    np.testing.assert_allclose(np.asarray(mx), np.asarray(ref), rtol=1e-6)


@pytest.mark.parametrize("with_self", [False, True])
@pytest.mark.parametrize("heads", [1, 2])
def test_fused_matches_xla_attention(with_self, heads):
    g = _graph()
    rng = np.random.default_rng(2)
    d = 8
    logits = jnp.asarray(rng.standard_normal((g.e_pad, heads)), jnp.float32)
    values = jnp.asarray(rng.standard_normal((g.e_pad, heads, d)),
                         jnp.float32)
    sl = (jnp.asarray(rng.standard_normal((g.n_pad, heads)), jnp.float32)
          if with_self else None)
    sv = (jnp.asarray(rng.standard_normal((g.n_pad, heads, d)), jnp.float32)
          if with_self else None)
    # fused path dispatches inside attention_aggregate
    out_fused = attention_aggregate(g, logits, values, self_logits=sl,
                                    self_values=sv)
    g_xla = g.replace(spmm_aux=None)
    out_ref = attention_aggregate(g_xla, logits, values, self_logits=sl,
                                  self_values=sv)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("with_self", [False, True])
def test_fused_gradients_match_xla(with_self):
    g = _graph(n=60, e=240)
    rng = np.random.default_rng(3)
    h, d = 2, 4
    logits = jnp.asarray(rng.standard_normal((g.e_pad, h)), jnp.float32)
    values = jnp.asarray(rng.standard_normal((g.e_pad, h, d)), jnp.float32)
    sl = (jnp.asarray(rng.standard_normal((g.n_pad, h)), jnp.float32)
          if with_self else None)
    sv = (jnp.asarray(rng.standard_normal((g.n_pad, h, d)), jnp.float32)
          if with_self else None)
    t = jnp.asarray(rng.standard_normal((g.n_pad, h, d)), jnp.float32)
    g_xla = g.replace(spmm_aux=None)

    def loss(gg, lg, v, sl_, sv_):
        out = attention_aggregate(gg, lg, v, self_logits=sl_, self_values=sv_)
        return jnp.sum(out * t)

    args = (logits, values) + ((sl, sv) if with_self else (None, None))
    diff_idx = (0, 1, 3, 4) if with_self else (0, 1)

    grads_fused = jax.grad(lambda lg, v: loss(g, lg, v, sl, sv),
                           argnums=(0, 1))(logits, values)
    grads_ref = jax.grad(lambda lg, v: loss(g_xla, lg, v, sl, sv),
                         argnums=(0, 1))(logits, values)
    for gf, gr in zip(grads_fused, grads_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-5)
    if with_self:
        gs_f = jax.grad(lambda a, b: loss(g, logits, values, a, b),
                        argnums=(0, 1))(sl, sv)
        gs_r = jax.grad(lambda a, b: loss(g_xla, logits, values, a, b),
                        argnums=(0, 1))(sl, sv)
        for gf, gr in zip(gs_f, gs_r):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       rtol=2e-4, atol=2e-5)


def test_gat_layer_on_aux_graph_matches():
    """Whole GATConv forward: aux graph (fused) vs no-aux graph (XLA)."""
    from flax import nnx
    from graphneuralnetworks_tpu import models as M
    g = _graph(n=50, e=200)
    g_xla = g.replace(spmm_aux=None)
    layer = M.GATConv(6, 5, heads=2, rngs=nnx.Rngs(0))
    x = jnp.asarray(np.random.default_rng(4).standard_normal(
        (g.n_pad, 6)), jnp.float32)
    y1 = layer(g, x)
    y2 = layer(g_xla, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-5,
                               atol=2e-5)


def test_attention_dropout_masks_consistency():
    """Dropout masks: fused path == XLA path given the same masks."""
    g = _graph(n=40, e=160)
    g_xla = g.replace(spmm_aux=None)
    rng = np.random.default_rng(7)
    h, d = 2, 4
    logits = jnp.asarray(rng.standard_normal((g.e_pad, h)), jnp.float32)
    values = jnp.asarray(rng.standard_normal((g.e_pad, h, d)), jnp.float32)
    keep = jnp.asarray(rng.random((g.e_pad, h)) > 0.3, jnp.float32) / 0.7
    masks = (keep, None)
    out1 = attention_aggregate(g, logits, values, dropout_masks=masks)
    out2 = attention_aggregate(g_xla, logits, values, dropout_masks=masks)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=2e-5, atol=2e-5)
    # grads too
    t = jnp.asarray(rng.standard_normal((g.n_pad, h, d)), jnp.float32)

    def loss(gg, lg, v):
        return jnp.sum(attention_aggregate(gg, lg, v, dropout_masks=masks)
                       * t)

    g1 = jax.grad(lambda lg, v: loss(g, lg, v), argnums=(0, 1))(logits,
                                                                values)
    g2 = jax.grad(lambda lg, v: loss(g_xla, lg, v), argnums=(0, 1))(logits,
                                                                    values)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)


def test_gat_dropout_training_mode():
    """GAT with dropout: deterministic=False changes outputs, both paths
    finite."""
    from flax import nnx
    from graphneuralnetworks_tpu import models as M
    g = _graph(n=30, e=120)
    layer = M.GATConv(4, 5, heads=2, dropout=0.5, rngs=nnx.Rngs(0))
    x = jnp.asarray(np.random.default_rng(8).standard_normal(
        (g.n_pad, 4)), jnp.float32)
    y_det = layer(g, x, deterministic=True)
    y_tr = layer(g, x, deterministic=False)
    assert np.isfinite(np.asarray(y_tr)).all()
    assert not np.allclose(np.asarray(y_det), np.asarray(y_tr))


@pytest.mark.parametrize("with_self", [False, True])
@pytest.mark.parametrize("heads", [1, 2])
def test_node_values_fused_matches_xla(with_self, heads):
    """Node-level values (GAT-family fast path): fused vs XLA, fwd+grads."""
    g = _graph(n=60, e=240)
    g_xla = g.replace(spmm_aux=None)
    rng = np.random.default_rng(11)
    d = 4
    logits = jnp.asarray(rng.standard_normal((g.e_pad, heads)), jnp.float32)
    vnodes = jnp.asarray(rng.standard_normal((g.n_pad, heads, d)),
                         jnp.float32)
    sl = (jnp.asarray(rng.standard_normal((g.n_pad, heads)), jnp.float32)
          if with_self else None)
    sv = (jnp.asarray(rng.standard_normal((g.n_pad, heads, d)), jnp.float32)
          if with_self else None)
    t = jnp.asarray(rng.standard_normal((g.n_pad, heads, d)), jnp.float32)

    def loss(gg, lg, v, a, b):
        out = attention_aggregate(gg, lg, v, self_logits=a, self_values=b,
                                  node_values=True)
        return jnp.sum(out * t)

    out1 = attention_aggregate(g, logits, vnodes, self_logits=sl,
                               self_values=sv, node_values=True)
    out2 = attention_aggregate(g_xla, logits, vnodes, self_logits=sl,
                               self_values=sv, node_values=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=2e-5, atol=2e-5)
    g1 = jax.grad(lambda lg, v: loss(g, lg, v, sl, sv),
                  argnums=(0, 1))(logits, vnodes)
    g2 = jax.grad(lambda lg, v: loss(g_xla, lg, v, sl, sv),
                  argnums=(0, 1))(logits, vnodes)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)
    if with_self:
        gs1 = jax.grad(lambda a, b: loss(g, logits, vnodes, a, b),
                       argnums=(0, 1))(sl, sv)
        gs2 = jax.grad(lambda a, b: loss(g_xla, logits, vnodes, a, b),
                       argnums=(0, 1))(sl, sv)
        for a, b in zip(gs1, gs2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)


def test_node_values_squeezed_and_dropout():
    """1D-logit squeeze path + dropout masks on node-level values."""
    g = _graph(n=40, e=160)
    g_xla = g.replace(spmm_aux=None)
    rng = np.random.default_rng(12)
    d = 4
    logits = jnp.asarray(rng.standard_normal((g.e_pad,)), jnp.float32)
    vnodes = jnp.asarray(rng.standard_normal((g.n_pad, d)), jnp.float32)
    out1 = attention_aggregate(g, logits, vnodes, node_values=True)
    out2 = attention_aggregate(g_xla, logits, vnodes, node_values=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=2e-5, atol=2e-5)
    # dropout masks, 2D logits
    h = 2
    lg = jnp.asarray(rng.standard_normal((g.e_pad, h)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((g.n_pad, h, d)), jnp.float32)
    keep = jnp.asarray(rng.random((g.e_pad, h)) > 0.3, jnp.float32) / 0.7
    t = jnp.asarray(rng.standard_normal((g.n_pad, h, d)), jnp.float32)

    def loss(gg, a, b):
        out = attention_aggregate(gg, a, b, dropout_masks=(keep, None),
                                  node_values=True)
        return jnp.sum(out * t)

    np.testing.assert_allclose(
        np.asarray(loss(g, lg, vn)), np.asarray(loss(g_xla, lg, vn)),
        rtol=2e-5, atol=2e-5)
    g1 = jax.grad(loss, argnums=(1, 2))(g, lg, vn)
    g2 = jax.grad(loss, argnums=(1, 2))(g_xla, lg, vn)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)


@pytest.mark.parametrize("with_self", [False, True])
@pytest.mark.parametrize("heads", [1, 2])
def test_gat_affine_kernel_matches_xla(with_self, heads):
    """In-kernel affine logits (gat_attention) vs gathered-logit XLA path."""
    from graphneuralnetworks_tpu.ops.attention import gat_attention
    g = _graph(n=60, e=240, seed=5)
    g_xla = g.replace(spmm_aux=None)
    rng = np.random.default_rng(13)
    d, slope = 4, 0.2
    pi = jnp.asarray(rng.standard_normal((g.n_pad, heads)), jnp.float32)
    pj = jnp.asarray(rng.standard_normal((g.n_pad, heads)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((g.n_pad, heads, d)), jnp.float32)
    sl = (jnp.asarray(rng.standard_normal((g.n_pad, heads)), jnp.float32)
          if with_self else None)
    sv = (jnp.asarray(rng.standard_normal((g.n_pad, heads, d)), jnp.float32)
          if with_self else None)
    t = jnp.asarray(rng.standard_normal((g.n_pad, heads, d)), jnp.float32)

    def loss(gg, a, b, v, c, e):
        out = gat_attention(gg, a, b, v, slope, self_logits=c,
                            self_values=e)
        return jnp.sum(out * t)

    out1 = gat_attention(g, pi, pj, vn, slope, self_logits=sl,
                         self_values=sv)
    out2 = gat_attention(g_xla, pi, pj, vn, slope, self_logits=sl,
                         self_values=sv)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=2e-5, atol=2e-5)
    args = (pi, pj, vn) + ((sl, sv) if with_self else ())
    idx = tuple(range(1, 4 + (2 if with_self else 0)))

    def wrap(gg):
        if with_self:
            return lambda a, b, v, c, e: loss(gg, a, b, v, c, e)
        return lambda a, b, v: loss(gg, a, b, v, None, None)

    g1 = jax.grad(wrap(g), argnums=tuple(range(len(args))))(*args)
    g2 = jax.grad(wrap(g_xla), argnums=tuple(range(len(args))))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)


def test_gatconv_fused_vs_xla_layer_level():
    """GATConv end-to-end: fused affine kernel vs spmm_aux-less XLA path."""
    from flax import nnx
    from graphneuralnetworks_tpu import models as M
    g = _graph(n=50, e=200, seed=7)
    g_xla = g.replace(spmm_aux=None)
    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.standard_normal((g.n_pad, 6)), jnp.float32)
    layer = M.GATConv(6, 5, heads=3, rngs=nnx.Rngs(0))
    y1, y2 = layer(g, x), layer(g_xla, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-5,
                               atol=2e-5)

    gd = nnx.graphdef(layer)

    def loss(state, gg):
        m = nnx.merge(gd, state)
        return jnp.sum(m(gg, x) ** 2)

    s = nnx.state(layer)
    g1 = jax.grad(loss)(s, g)
    g2 = jax.grad(loss)(s, g_xla)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)


@pytest.mark.parametrize("with_self", [False, True])
@pytest.mark.parametrize("heads", [1, 2])
def test_dot_attention_kernel_matches_xla(with_self, heads):
    """In-kernel dot-product logits (dot_attention) vs XLA path, fwd+grads."""
    from graphneuralnetworks_tpu.ops.attention import dot_attention
    g = _graph(n=60, e=240, seed=9)
    g_xla = g.replace(spmm_aux=None)
    rng = np.random.default_rng(15)
    o, d, scale = 6, 4, 0.37
    q = jnp.asarray(rng.standard_normal((g.n_pad, heads, o)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((g.n_pad, heads, o)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((g.n_pad, heads, d)), jnp.float32)
    sl = (jnp.asarray(rng.standard_normal((g.n_pad, heads)), jnp.float32)
          if with_self else None)
    sv = (jnp.asarray(rng.standard_normal((g.n_pad, heads, d)), jnp.float32)
          if with_self else None)
    t = jnp.asarray(rng.standard_normal((g.n_pad, heads, d)), jnp.float32)

    def loss(gg, *args):
        out = dot_attention(gg, args[0], args[1], args[2], scale,
                            self_logits=args[3] if with_self else None,
                            self_values=args[4] if with_self else None)
        return jnp.sum(out * t)

    args = (q, k, v) + ((sl, sv) if with_self else ())
    out1 = dot_attention(g, q, k, v, scale, self_logits=sl, self_values=sv)
    out2 = dot_attention(g_xla, q, k, v, scale, self_logits=sl,
                         self_values=sv)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=2e-5, atol=2e-5)
    idx = tuple(range(len(args)))
    g1 = jax.grad(lambda *a: loss(g, *a), argnums=idx)(*args)
    g2 = jax.grad(lambda *a: loss(g_xla, *a), argnums=idx)(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)


def test_transformer_agnn_fused_vs_xla_layer_level():
    """TransformerConv + AGNNConv end-to-end: fused dot kernel vs XLA."""
    from flax import nnx
    from graphneuralnetworks_tpu import models as M
    g = _graph(n=50, e=200, seed=8)
    g_xla = g.replace(spmm_aux=None)
    rng = np.random.default_rng(16)
    x = jnp.asarray(rng.standard_normal((g.n_pad, 6)), jnp.float32)
    for layer in (M.TransformerConv(6, 5, heads=2, add_self_loops=True,
                                    rngs=nnx.Rngs(0)),
                  M.AGNNConv(rngs=nnx.Rngs(1))):
        y1, y2 = layer(g, x), layer(g_xla, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   rtol=2e-5, atol=2e-5)
        gd = nnx.graphdef(layer)

        def loss(state, gg):
            m = nnx.merge(gd, state)
            return jnp.sum(m(gg, x) ** 2)

        s = nnx.state(layer)
        g1 = jax.grad(loss)(s, g)
        g2 = jax.grad(loss)(s, g_xla)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=3e-5)


@pytest.mark.parametrize("with_self", [False, True])
@pytest.mark.parametrize("heads", [1, 2])
def test_gatv2_kernel_matches_xla(with_self, heads):
    """In-kernel GATv2 logits (gatv2_attention) vs XLA path, fwd+grads."""
    from graphneuralnetworks_tpu.ops.attention import gatv2_attention
    g = _graph(n=60, e=240, seed=10)
    g_xla = g.replace(spmm_aux=None)
    rng = np.random.default_rng(17)
    o, slope = 5, 0.2
    q = jnp.asarray(rng.standard_normal((g.n_pad, heads, o)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((g.n_pad, heads, o)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((o, heads)), jnp.float32)
    sl = (jnp.asarray(rng.standard_normal((g.n_pad, heads)), jnp.float32)
          if with_self else None)
    sv = (jnp.asarray(rng.standard_normal((g.n_pad, heads, o)), jnp.float32)
          if with_self else None)
    t = jnp.asarray(rng.standard_normal((g.n_pad, heads, o)), jnp.float32)

    def loss(gg, *args):
        out = gatv2_attention(gg, args[0], args[1], args[2], slope,
                              self_logits=args[3] if with_self else None,
                              self_values=args[4] if with_self else None)
        return jnp.sum(out * t)

    args = (q, k, a) + ((sl, sv) if with_self else ())
    out1 = gatv2_attention(g, q, k, a, slope, self_logits=sl,
                           self_values=sv)
    out2 = gatv2_attention(g_xla, q, k, a, slope, self_logits=sl,
                           self_values=sv)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=2e-5, atol=2e-5)
    idx = tuple(range(len(args)))
    g1 = jax.grad(lambda *xs: loss(g, *xs), argnums=idx)(*args)
    g2 = jax.grad(lambda *xs: loss(g_xla, *xs), argnums=idx)(*args)
    for x1, x2 in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2),
                                   rtol=2e-4, atol=3e-5)


def test_gatv2conv_fused_vs_xla_layer_level():
    """GATv2Conv end-to-end: fused kernel vs spmm_aux-less XLA path."""
    from flax import nnx
    from graphneuralnetworks_tpu import models as M
    g = _graph(n=50, e=200, seed=11)
    g_xla = g.replace(spmm_aux=None)
    rng = np.random.default_rng(18)
    x = jnp.asarray(rng.standard_normal((g.n_pad, 6)), jnp.float32)
    layer = M.GATv2Conv(6, 5, heads=2, rngs=nnx.Rngs(0))
    y1, y2 = layer(g, x), layer(g_xla, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-5,
                               atol=2e-5)
    gd = nnx.graphdef(layer)

    def loss(state, gg):
        m = nnx.merge(gd, state)
        return jnp.sum(m(gg, x) ** 2)

    s = nnx.state(layer)
    g1 = jax.grad(loss)(s, g)
    g2 = jax.grad(loss)(s, g_xla)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=3e-5)


def test_bf16_values_f32_softmax_state():
    """bf16 inputs run through every fused attention path (the softmax
    state is kept f32 internally — bf16 lane ops are unsupported by Mosaic
    on TPU and numerically poor anyway); outputs stay bf16 and track the
    f32 result; gradients flow with matching dtypes."""
    from graphneuralnetworks_tpu.ops.attention import (dot_attention,
                                                       gat_attention,
                                                       gatv2_attention)
    g = _graph(n=60, e=300, seed=21)
    rng = np.random.default_rng(5)
    d = 8
    x32 = jnp.asarray(rng.standard_normal((g.n_pad, d)), jnp.float32)
    a32 = jnp.asarray(rng.standard_normal((d, 2)), jnp.float32)

    def paths(x, a):
        dt = x.dtype
        pi = (x @ a[:, :1])
        pj = (x @ a[:, 1:])
        outs = [gat_attention(g, pi, pj, x[:, None, :], 0.2)]
        q = x.reshape(-1, 2, d // 2)
        outs.append(dot_attention(g, q, q, q, 0.5))
        outs.append(gatv2_attention(g, q, q, a[: d // 2], 0.2))
        return outs

    ref = paths(x32, a32)
    got = paths(x32.astype(jnp.bfloat16), a32.astype(jnp.bfloat16))
    for r, o in zip(ref, got):
        assert o.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(r),
                                   np.asarray(o.astype(jnp.float32)),
                                   rtol=0.1, atol=0.05)

    def loss(x):
        return sum(jnp.sum(o.astype(jnp.float32) ** 2)
                   for o in paths(x.astype(jnp.bfloat16),
                                  a32.astype(jnp.bfloat16)))

    gx = jax.grad(lambda x: loss(x))(x32)
    assert bool(jnp.isfinite(gx).all())


@pytest.mark.parametrize("with_self", [False, True])
@pytest.mark.parametrize("heads", [1, 2])
def test_gat_attention_nodes_fwd_grad_matches(with_self, heads):
    """The dedicated affine-logit GAT kernel (round 4) vs the XLA path,
    forward AND all three gradients (pi, pj, values)."""
    from graphneuralnetworks_tpu.ops.attention import gat_attention
    from graphneuralnetworks_tpu.ops.segment import gather
    g = _graph(n=150, e=600, seed=5)
    g_xla = g.replace(spmm_aux=None)
    rng = np.random.default_rng(7)
    d = 8
    pi = jnp.asarray(rng.standard_normal((g.n_pad, heads)), jnp.float32)
    pj = jnp.asarray(rng.standard_normal((g.n_pad, heads)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((g.n_pad, heads, d)), jnp.float32)
    sl = (jnp.asarray(rng.standard_normal((g.n_pad, heads)), jnp.float32)
          if with_self else None)
    sv = (jnp.asarray(rng.standard_normal((g.n_pad, heads, d)), jnp.float32)
          if with_self else None)
    t = jnp.asarray(rng.standard_normal((g.n_pad, heads, d)), jnp.float32)

    def loss(gg, pi, pj, v):
        out = gat_attention(gg, pi, pj, v, 0.2, self_logits=sl,
                            self_values=sv)
        return jnp.sum(out * t)

    out_f = gat_attention(g, pi, pj, v, 0.2, self_logits=sl, self_values=sv)
    out_r = gat_attention(g_xla, pi, pj, v, 0.2, self_logits=sl,
                          self_values=sv)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)
    gf = jax.grad(loss, argnums=(1, 2, 3))(g, pi, pj, v)
    gr = jax.grad(loss, argnums=(1, 2, 3))(g_xla, pi, pj, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("heads", [1, 2])
def test_gat_pj_weight_hint_matches_gathered_pj(heads):
    """gat_attention's pj_weight recompute path (r5: grouped pj from the
    gathered value rows, one fewer grouped gather) must equal the
    pj-gather path, forward and gradients."""
    from graphneuralnetworks_tpu.ops.attention import gat_attention
    g = _graph()
    rng = np.random.default_rng(11)
    d = 8
    v = jnp.asarray(rng.standard_normal((g.n_pad, heads, d)), jnp.float32)
    a2 = jnp.asarray(rng.standard_normal((d, heads)), jnp.float32)
    pi = jnp.asarray(rng.standard_normal((g.n_pad, heads)), jnp.float32)

    def run(v, a2, use_hint):
        pj = jnp.einsum("nhf,fh->nh", v, a2)
        return gat_attention(g, pi, pj, v, 0.2,
                             pj_weight=a2 if use_hint else None)

    o1 = run(v, a2, True)
    o2 = run(v, a2, False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=2e-5, atol=2e-5)

    def loss(v, a2, use_hint):
        return jnp.sum(run(v, a2, use_hint) ** 2)

    g1v, g1a = jax.grad(loss, argnums=(0, 1))(v, a2, True)
    g2v, g2a = jax.grad(loss, argnums=(0, 1))(v, a2, False)
    np.testing.assert_allclose(np.asarray(g1v), np.asarray(g2v),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g1a), np.asarray(g2a),
                               rtol=2e-4, atol=2e-5)
