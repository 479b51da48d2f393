"""Convolutional layer zoo (flax.nnx, explicit parameters, features-last).

Reference parity: constructor surfaces follow
GraphNeuralNetworks/src/layers/conv.jl (Flux frontend) and the math follows
GNNlib/src/layers/conv.jl (functional core) — per-layer citations below.
Arrays are [N_pad, D] (features-last; the reference is features-first Julia).

TPU-first departures from the reference, applied uniformly:

- ``add_self_loops`` never materializes edges. GCN-family layers fold the
  self term into the math (degree+1 and an extra ``c_i * x_i`` summand);
  attention layers use :func:`ops.attention.attention_aggregate`'s virtual
  self-loop. Numerics are identical; shapes stay static under jit.
- hot aggregations are receiver-sorted segment ops (Pallas SpMM-backed).
- every layer is jit-compatible with no data-dependent Python control flow.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from flax import nnx

from ..graph import GraphTuple
from ..ops import (aggregate_neighbors, apply_edges, copy_xj, e_mul_xj,
                   propagate, to_src_space, w_mul_xj, xi_dot_xj, xi_sub_xj)
from ..ops.attention import (attention_aggregate, dot_attention,
                             gat_attention, gatv2_attention)
from ..ops.segment import gather, segment_sum
from ..query import degree, scaled_laplacian
from .basic import GNNLayer, glorot_uniform

__all__ = [
    "GCNConv", "ChebConv", "GraphConv", "GATConv", "GATv2Conv",
    "GatedGraphConv", "EdgeConv", "GINConv", "NNConv", "SAGEConv",
    "ResGatedGraphConv", "CGConv", "AGNNConv", "MEGNetConv", "GMMConv",
    "SGConv", "TAGConv", "EGNNConv", "TransformerConv", "DConv", "MLP",
]


def _init(rngs: nnx.Rngs, shape) -> nnx.Param:
    return nnx.Param(glorot_uniform()(rngs.params(), shape, jnp.float32))


def _bias(shape) -> nnx.Param:
    return nnx.Param(jnp.zeros(shape, jnp.float32))


def _expand_srcdst(x):
    """Bipartite support: ``x`` may be (x_src, x_dst) like the reference's
    ``expand_srcdst`` (GNNlib/src/utils.jl:123-125). Returns (xj, xi)."""
    if isinstance(x, (tuple, list)):
        xsrc, xdst = x
        return xsrc, xdst
    return x, x


class MLP(nnx.Module):
    """Small Dense chain used as `nn` arguments (Flux `Chain(Dense...)`)."""

    def __init__(self, dims, act=jax.nn.relu, *, final_act=None,
                 use_bias=True, rngs: nnx.Rngs):
        self.linears = nnx.List([
            nnx.Linear(a, b, use_bias=use_bias,
                       kernel_init=glorot_uniform(), rngs=rngs)
            for a, b in zip(dims[:-1], dims[1:])])
        self.act = act
        self.final_act = final_act

    def __call__(self, x):
        n = len(self.linears)
        for i, lin in enumerate(self.linears):
            x = lin(x)
            if i < n - 1:
                x = self.act(x)
            elif self.final_act is not None:
                x = self.final_act(x)
        return x


# ---------------------------------------------------------------------------
# GCN family (shared symmetric-norm propagation)
# ---------------------------------------------------------------------------

def _gcn_norm(g: GraphTuple, *, edge_weight, use_edge_weight,
              add_self_loops, norm_fn, dtype):
    """c = norm_fn(deg_in [+1 for the virtual self-loop]).

    Reference: gcn_conv degree/norm block (GNNlib/src/layers/conv.jl:44-58);
    the +1 is the reference's self-loop materialization + weight-padding-with-
    ones (conv.jl:26-34) folded into the degree.
    """
    if edge_weight is not None:
        d = degree(g, dir="in", edge_weight=edge_weight, dtype=dtype)
    elif use_edge_weight and g.edge_weight is not None:
        d = degree(g, dir="in", dtype=dtype)
    else:
        d = degree(g, dir="in", edge_weight=False, dtype=dtype)
    if add_self_loops:
        d = d + 1.0
    if norm_fn is not None:
        return norm_fn(d)
    return jnp.where(d > 0, jax.lax.rsqrt(jnp.maximum(d, 1e-12)), 0.0)


def _gcn_propagate(g: GraphTuple, x, c, *, edge_weight, use_edge_weight,
                   add_self_loops):
    """c .* A_hat^T (c .* x) with the virtual self-loop summand.

    Reference: conv.jl:59-67. The self-loop edge (weight 1) contributes
    ``c_i x_i`` to node i's aggregation — added analytically.
    """
    xj = x * c[:, None]
    if edge_weight is not None:
        agg = propagate(e_mul_xj, g, "sum", xj=xj, e=edge_weight)
    elif use_edge_weight and g.edge_weight is not None:
        agg = propagate(w_mul_xj, g, "sum", xj=xj, e=g.edge_weight)
    else:
        agg = propagate(copy_xj, g, "sum", xj=xj)
    if add_self_loops:
        agg = agg + xj
    return agg * c[:, None]


class GCNConv(GNNLayer):
    """Graph convolution (Kipf & Welling).

    Reference: GraphNeuralNetworks/src/layers/conv.jl:77-112 (surface) and
    GNNlib/src/layers/conv.jl:14-79 (math): ``σ(W (D̂^-1/2 Â D̂^-1/2 x) + b)``
    with optional edge weights and forward-time ``norm_fn``/``conv_weight``
    overrides. The in<out ordering trick (multiply by W on the cheaper side,
    conv.jl:36-40) is preserved.
    """

    def __init__(self, in_features: int, out_features: int,
                 act: Callable = None, *, add_self_loops: bool = True,
                 use_edge_weight: bool = False, use_bias: bool = True,
                 rngs: nnx.Rngs):
        self.weight = _init(rngs, (in_features, out_features))
        self.bias = _bias((out_features,)) if use_bias else None
        self.act = act
        self.add_self_loops = add_self_loops
        self.use_edge_weight = use_edge_weight
        self.in_features, self.out_features = in_features, out_features

    def __call__(self, g: GraphTuple, x=None, edge_weight=None, *,
                 norm_fn=None, conv_weight=None):
        if x is None:
            x = g.x
        W = self.weight[...] if conv_weight is None else conv_weight
        din, dout = W.shape
        if isinstance(x, (tuple, list)):
            return self._bipartite(g, x, W, norm_fn, edge_weight)
        if dout < din:
            x = x @ W
        c = _gcn_norm(g, edge_weight=edge_weight,
                      use_edge_weight=self.use_edge_weight,
                      add_self_loops=self.add_self_loops, norm_fn=norm_fn,
                      dtype=x.dtype)
        x = _gcn_propagate(g, x, c, edge_weight=edge_weight,
                           use_edge_weight=self.use_edge_weight,
                           add_self_loops=self.add_self_loops)
        if dout >= din:
            x = x @ W
        if self.bias is not None:
            x = x + self.bias[...]
        return self.act(x) if self.act is not None else x

    def _bipartite(self, g: GraphTuple, x, W, norm_fn, edge_weight=None):
        """Hetero-relation path (GNNlib conv.jl:45-70): separate *unweighted*
        in/out-degree norms (reference hetero degree passes edge_weight=
        nothing, gnnheterograph/query.jl:57-67), weight applied after
        propagation, no virtual self-loop (src and dst are different node
        sets). The message itself still honors ``edge_weight``/
        ``use_edge_weight`` (conv.jl:61-67 — not gated on homogeneity)."""
        xj, xi = _expand_srcdst(x)
        ones = jnp.ones((g.e_pad,), xj.dtype)
        dout_deg = segment_sum(ones, g.senders, xj.shape[0],
                               mask=g.edge_mask)
        din_deg = segment_sum(ones, g.receivers, xi.shape[0],
                              mask=g.edge_mask, sorted=g.sorted_by_receivers)
        nf = (norm_fn if norm_fn is not None else
              lambda d: jnp.where(d > 0,
                                  jax.lax.rsqrt(jnp.maximum(d, 1e-12)), 0.0))
        cout, cin = nf(dout_deg), nf(din_deg)
        xjc = xj * cout[:, None]
        if edge_weight is not None:
            m = propagate(e_mul_xj, g, "sum", xj=xjc, e=edge_weight)
        elif self.use_edge_weight and g.edge_weight is not None:
            m = propagate(w_mul_xj, g, "sum", xj=xjc, e=g.edge_weight)
        else:
            m = propagate(copy_xj, g, "sum", xj=xjc)
        m = m[: xi.shape[0]] * cin[:, None]
        out = m @ W
        if self.bias is not None:
            out = out + self.bias[...]
        return self.act(out) if self.act is not None else out


def _lap_operator(g: GraphTuple, dtype):
    """Matrix-free normalized-Laplacian action ``v -> (I - D^-1/2 A D^-1/2) v``
    through ``propagate`` (one SpMM per application; rides the Pallas kernel
    when the graph carries spmm_aux). Bidirected graphs assumed."""
    from .. import ops as _ops

    w_e = (g.edge_weight.astype(dtype) if g.edge_weight is not None
           else jnp.ones((g.e_pad,), dtype))
    w_e = jnp.where(g.edge_mask, w_e, 0)
    deg = _ops.segment_sum(w_e[:, None], g.receivers, g.n_pad)[:, 0]
    d_isqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0)
    n_mask = g.node_mask.astype(dtype)

    def lap(v):                                   # [N_pad, C] -> [N_pad, C]
        av = _ops.propagate(_ops.w_mul_xj, g, "sum",
                            xj=v * d_isqrt[:, None], e=w_e)
        return n_mask[:, None] * v - d_isqrt[:, None] * av

    return lap, n_mask


def cheb_lambda_max(g: GraphTuple, dtype=jnp.float32,
                    power_iters: int = 50) -> jax.Array:
    """Per-graph normalized-Laplacian λ_max, matrix-free ([G_pad]).

    Sparse per-graph blocked power iteration (the query.scaled_laplacian
    semantics, query.jl:474-487, without the dense matrix). Pass the result
    as ``ChebConv(..., lambda_max=...)`` — the ChebConv-based recurrent
    cells do this so the eigmax is computed ONCE per step instead of once
    per internal conv (GConvGRU at 65k nodes: 2517 -> ~110 ms/8-step scan,
    HETERO_TEMPORAL_r5).
    """
    lap, _ = _lap_operator(g, dtype)
    ng = g.g_pad
    sel = ((g.node_graph_id[:, None]
            == jnp.arange(ng, dtype=jnp.int32)[None])
           & g.node_mask[:, None]).astype(dtype)          # [N_pad, G]
    v0 = jax.random.normal(jax.random.key(20240607), (g.n_pad, ng),
                           dtype) * sel

    def body(_, v):
        w = lap(v) * sel
        return w / jnp.maximum(
            jnp.linalg.norm(w, axis=0, keepdims=True), 1e-12)

    v = jax.lax.fori_loop(0, power_iters, body, v0)
    return jnp.sum(v * lap(v), axis=0)                    # [G_pad]


def _scaled_laplacian_apply(g: GraphTuple, dtype, lambda_max=None,
                            power_iters: int = 50):
    """Matrix-free ``v -> (2 L / lambda_max - I) v`` for Chebyshev layers.

    ``lambda_max=None`` runs :func:`cheb_lambda_max`; a scalar or per-graph
    [G_pad] array skips it.
    """
    lap, n_mask = _lap_operator(g, dtype)
    if lambda_max is None:
        lam = cheb_lambda_max(g, dtype, power_iters)
        lam_node = lam[g.node_graph_id]
    else:
        lam = jnp.asarray(lambda_max, dtype)
        lam_node = (lam[g.node_graph_id] if lam.ndim == 1
                    else jnp.broadcast_to(lam, (g.n_pad,)))
    s_node = 2.0 / jnp.maximum(lam_node, 1e-12)

    def lhat(v):
        return s_node[:, None] * lap(v) - n_mask[:, None] * v

    return lhat


class ChebConv(GNNLayer):
    """Chebyshev spectral convolution.

    Reference: conv.jl:162-185 (surface), GNNlib conv.jl:83-98 (recursion on
    the scaled Laplacian). Dense Laplacian — intended for small padded
    graphs, as in the reference.
    """

    def __init__(self, in_features: int, out_features: int, k: int, *,
                 use_bias: bool = True, rngs: nnx.Rngs):
        self.weight = nnx.Param(glorot_uniform()(
            rngs.params(), (k, in_features, out_features), jnp.float32))
        self.bias = _bias((out_features,)) if use_bias else None
        self.k = k

    def __call__(self, g: GraphTuple, x=None, *, lambda_max=None):
        if x is None:
            x = g.x
        W = self.weight[...]
        if lambda_max is not None or g.n_pad > 2048:
            # sparse path (r5): the scaled-Laplacian ACTION via message
            # passing — never materializes L (the dense path is >8GB and
            # overflows its scatter index past 46341 nodes; ZOO_SWEEP_r5
            # caught ChebConv failing at production scale). Assumes a
            # bidirected graph (the spectral setting; reference graphs
            # are symmetrized on construction). ``lambda_max``: optional
            # scalar / per-graph [G_pad] override (e.g. the common 2.0)
            # skipping the per-call sparse power iteration.
            Lhat = _scaled_laplacian_apply(g, x.dtype, lambda_max)
            z_prev = x
            z = Lhat(x)
            y = z_prev @ W[0]
            if self.k > 1:
                y = y + z @ W[1]
            for k in range(2, self.k):
                z, z_prev = 2.0 * Lhat(z) - z_prev, z
                y = y + z @ W[k]
            return y + self.bias[...] if self.bias is not None else y
        L = scaled_laplacian(g, dtype=x.dtype)
        z_prev = x
        z = L @ x
        y = z_prev @ W[0]
        if self.k > 1:
            y = y + z @ W[1]
        for k in range(2, self.k):
            z, z_prev = 2.0 * (L @ z) - z_prev, z
            y = y + z @ W[k]
        return y + self.bias[...] if self.bias is not None else y


class GraphConv(GNNLayer):
    """W&L GNN conv: σ(W1 x_i + W2 Σ_j x_j + b).

    Reference: conv.jl:226-254; math GNNlib conv.jl:102-108.
    """

    def __init__(self, in_features: int, out_features: int,
                 act: Callable = None, *, aggr="sum", use_bias: bool = True,
                 rngs: nnx.Rngs):
        self.weight1 = _init(rngs, (in_features, out_features))
        self.weight2 = _init(rngs, (in_features, out_features))
        self.bias = _bias((out_features,)) if use_bias else None
        self.act = act
        self.aggr = aggr

    def __call__(self, g: GraphTuple, x=None):
        if x is None:
            x = g.x
        xj, xi = _expand_srcdst(x)
        m = propagate(copy_xj, g, self.aggr, xj=xj)
        if m.shape[0] != xi.shape[0]:
            m = m[: xi.shape[0]]
        out = xi @ self.weight1[...] + m @ self.weight2[...]
        if self.bias is not None:
            out = out + self.bias[...]
        return self.act(out) if self.act is not None else out


# ---------------------------------------------------------------------------
# attention family
# ---------------------------------------------------------------------------

def _attn_dropout_masks(dropout_module, g, n_dst, h, deterministic,
                        with_self):
    """Multiplicative dropout masks for attention alphas (or None)."""
    if dropout_module is None or deterministic:
        return None
    m_e = dropout_module(jnp.ones((g.e_pad, h), jnp.float32),
                         deterministic=False)
    m_s = (dropout_module(jnp.ones((n_dst, h), jnp.float32),
                          deterministic=False) if with_self else None)
    return (m_e, m_s)


class GATConv(GNNLayer):
    """Graph attention (Velickovic et al.).

    Reference: conv.jl:309-411 (surface incl. trainable set conv.jl:324) and
    GNNlib conv.jl:112-167 (gat_message SDDMM + edge-softmax). Self-loops are
    virtual (see module docstring) — same math as the reference's
    ``add_self_loops(g)``.
    """

    def __init__(self, in_features, out_features, act: Callable = None, *,
                 heads: int = 1, concat: bool = True,
                 negative_slope: float = 0.2, add_self_loops: bool = True,
                 dropout: float = 0.0, use_bias: bool = True,
                 edge_features: int = 0, rngs: nnx.Rngs):
        if add_self_loops and edge_features > 0:
            raise ValueError("edge features + add_self_loops unsupported "
                             "(reference conv.jl:332)")
        self.dense_x = nnx.Linear(in_features, out_features * heads,
                                  use_bias=False,
                                  kernel_init=glorot_uniform(), rngs=rngs)
        self.dense_e = (nnx.Linear(edge_features, out_features * heads,
                                   use_bias=False,
                                   kernel_init=glorot_uniform(), rngs=rngs)
                        if edge_features > 0 else None)
        k = 3 if edge_features > 0 else 2
        self.a = _init(rngs, (k * out_features, heads))
        self.bias = (_bias((out_features * heads if concat else out_features,))
                     if use_bias else None)
        self.attn_dropout = (nnx.Dropout(dropout, rngs=rngs)
                             if dropout > 0 else None)
        self.act = act
        self.heads, self.concat = heads, concat
        self.negative_slope = negative_slope
        self.add_self_loops = add_self_loops
        self.out_features = out_features

    def __call__(self, g: GraphTuple, x=None, e=None, *,
                 deterministic: bool = True):
        if x is None:
            x = g.x
        xj, xi = _expand_srcdst(x)
        H, O = self.heads, self.out_features
        Wxj = self.dense_x(xj).reshape(-1, H, O)
        Wxi = (Wxj if xi is xj
               else self.dense_x(xi).reshape(-1, H, O))
        # GAT's score is linear in the concatenated endpoints
        # (GNNlib conv.jl:152-167: leakyrelu(a' [Wxi; Wxj; We])), so the
        # ``a`` contraction happens at NODE level and only the [E, H]
        # scalar projections get gathered — never the [E, H, O] features.
        a = self.a[...]
        pi = jnp.einsum("nhf,fh->nh", Wxi, a[:O])         # [N_dst, H]
        pj = jnp.einsum("nhf,fh->nh", Wxj, a[O:2 * O])    # [N_src, H]
        if self.add_self_loops:
            pj_self = (pi + pj if xi is xj
                       else pi + jnp.einsum("nhf,fh->nh", Wxi, a[O:2 * O]))
            self_logits = jax.nn.leaky_relu(pj_self, self.negative_slope)
            self_values = Wxi
        else:
            self_logits = self_values = None
        masks = _attn_dropout_masks(self.attn_dropout, g, Wxi.shape[0],
                                    self.heads, deterministic,
                                    self.add_self_loops)
        if e is None and self.dense_e is None:
            # affine logits -> in-kernel path (zero edge-space logit arrays)
            out = gat_attention(g, pi, pj, Wxj, self.negative_slope,
                                self_logits=self_logits,
                                self_values=self_values,
                                dropout_masks=masks,
                                num_segments=Wxi.shape[0],
                                pj_weight=a[O:2 * O])
        else:
            if e is None or self.dense_e is None:
                raise ValueError("edge features required/not configured")
            We = self.dense_e(e).reshape(-1, H, O)
            raw = (gather(pi, g.receivers)
                   + gather(to_src_space(g, pj), g.senders)
                   + jnp.einsum("ehf,fh->eh", We, a[2 * O:]))
            logits = jax.nn.leaky_relu(raw, self.negative_slope)
            out = attention_aggregate(g, logits, Wxj,
                                      self_logits=self_logits,
                                      self_values=self_values,
                                      dropout_masks=masks,
                                      num_segments=Wxi.shape[0],
                                      node_values=True)
        out = (out.reshape(-1, H * O) if self.concat else out.mean(axis=1))
        if self.bias is not None:
            out = out + self.bias[...]
        return self.act(out) if self.act is not None else out


class GATv2Conv(GNNLayer):
    """GATv2 (Brody et al., "How Attentive are GATs?").

    Reference: conv.jl:413-512; math GNNlib conv.jl:171-214 (leakyrelu before
    the ``a`` contraction, separate dense_i/dense_j).
    """

    def __init__(self, in_features, out_features, act: Callable = None, *,
                 heads: int = 1, concat: bool = True,
                 negative_slope: float = 0.2, add_self_loops: bool = True,
                 dropout: float = 0.0, use_bias: bool = True,
                 edge_features: int = 0, rngs: nnx.Rngs):
        if add_self_loops and edge_features > 0:
            raise ValueError("edge features + add_self_loops unsupported")
        mk = lambda din, b: nnx.Linear(din, out_features * heads, use_bias=b,
                                       kernel_init=glorot_uniform(),
                                       rngs=rngs)
        self.dense_i = mk(in_features, use_bias)
        self.dense_j = mk(in_features, False)
        self.dense_e = mk(edge_features, False) if edge_features > 0 else None
        self.a = _init(rngs, (out_features, heads))
        self.bias = (_bias((out_features * heads if concat else out_features,))
                     if use_bias else None)
        self.attn_dropout = (nnx.Dropout(dropout, rngs=rngs)
                             if dropout > 0 else None)
        self.act = act
        self.heads, self.concat = heads, concat
        self.negative_slope = negative_slope
        self.add_self_loops = add_self_loops
        self.out_features = out_features

    def _logits(self, wx):
        z = jax.nn.leaky_relu(wx, self.negative_slope)
        return jnp.einsum("...hf,fh->...h", z, self.a[...])

    def __call__(self, g: GraphTuple, x=None, e=None, *,
                 deterministic: bool = True):
        if x is None:
            x = g.x
        xj, xi = _expand_srcdst(x)
        H, O = self.heads, self.out_features
        Wxi = self.dense_i(xi).reshape(-1, H, O)
        Wxj = self.dense_j(xj).reshape(-1, H, O)
        if self.add_self_loops:
            # self edge: dense_i(x_i) + dense_j(x_i)
            Wji = self.dense_j(xi).reshape(-1, H, O)
            self_logits = self._logits(Wxi + Wji)
            self_values = Wji
        else:
            self_logits = self_values = None
        masks = _attn_dropout_masks(self.attn_dropout, g, Wxi.shape[0],
                                    self.heads, deterministic,
                                    self.add_self_loops)
        if e is None and self.dense_e is None:
            # fused path: one grouped gather for the whole layer
            out = gatv2_attention(g, Wxi, Wxj, self.a[...],
                                  self.negative_slope,
                                  self_logits=self_logits,
                                  self_values=self_values,
                                  dropout_masks=masks,
                                  num_segments=Wxi.shape[0])
        else:
            if e is None or self.dense_e is None:
                raise ValueError("edge features required/not configured")
            wx = (gather(Wxi, g.receivers)
                  + gather(to_src_space(g, Wxj), g.senders)
                  + self.dense_e(e).reshape(-1, H, O))
            logits = self._logits(wx)
            out = attention_aggregate(g, logits, Wxj,
                                      self_logits=self_logits,
                                      self_values=self_values,
                                      dropout_masks=masks,
                                      num_segments=Wxi.shape[0],
                                      node_values=True)
        out = (out.reshape(-1, H * O) if self.concat else out.mean(axis=1))
        if self.bias is not None:
            out = out + self.bias[...]
        return self.act(out) if self.act is not None else out


class AGNNConv(GNNLayer):
    """Attention-based GNN (Thekumparampil et al.).

    Reference: conv.jl:988-1002; math GNNlib conv.jl:337-352 — cosine
    similarity attention with trainable temperature β. Virtual self-loop.
    """

    def __init__(self, *, init_beta: float = 1.0, add_self_loops: bool = True,
                 trainable: bool = True, rngs: nnx.Rngs | None = None):
        beta = jnp.full((1,), init_beta, jnp.float32)
        self.beta = nnx.Param(beta) if trainable else beta
        self.add_self_loops = add_self_loops

    def __call__(self, g: GraphTuple, x=None):
        if x is None:
            x = g.x
        beta = self.beta[...] if isinstance(self.beta, nnx.Param) else self.beta
        norm = jnp.sqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True), 1e-24))
        xn = x / norm
        if self.add_self_loops:
            self_logits = (beta[0] * jnp.sum(xn * xn, -1))[:, None]  # [N, 1]
            self_values = x[:, None, :]
        else:
            self_logits = self_values = None
        # β folds into the query so the cosine logits compute in-kernel
        return dot_attention(g, (beta[0] * xn)[:, None, :], xn[:, None, :],
                             x[:, None, :], 1.0, self_logits=self_logits,
                             self_values=self_values)[:, 0, :]


class TransformerConv(GNNLayer):
    """UniMP transformer conv (Shi et al.).

    Reference: conv.jl:1473-1547 (surface) and GNNlib conv.jl:553-629 (math:
    scaled dot-product attention, optional root weight W1, gating W5, edge
    projection W6, skip connection, batch norms, feed-forward block).
    """

    def __init__(self, in_features, out_features, *, heads: int = 1,
                 concat: bool = True, add_self_loops: bool = False,
                 bias_qkv: bool = True, bias_root: bool = True,
                 root_weight: bool = True, gating: bool = False,
                 skip_connection: bool = False, batch_norm: bool = False,
                 ff_channels: int = 0, edge_features: int = 0,
                 rngs: nnx.Rngs):
        if add_self_loops and edge_features > 0:
            raise ValueError("edge features + add_self_loops unsupported")
        O, H = out_features, heads
        mk = lambda din, dout, b: nnx.Linear(
            din, dout, use_bias=b, kernel_init=glorot_uniform(), rngs=rngs)
        out_mha = O * (H if concat else 1)
        self.W1 = mk(in_features, out_mha, bias_root) if root_weight else None
        self.W2 = mk(in_features, O * H, bias_qkv)
        self.W3 = mk(in_features, O * H, bias_qkv)
        self.W4 = mk(in_features, O * H, bias_qkv)
        self.W5 = mk(3 * out_mha, 1, False) if gating else None
        self.W6 = (mk(edge_features, O * H, bias_qkv)
                   if edge_features > 0 else None)
        self.FF = (MLP([out_mha, ff_channels, out_mha], jax.nn.relu,
                       rngs=rngs) if ff_channels > 0 else None)
        self.BN1 = (nnx.BatchNorm(out_mha, rngs=rngs) if batch_norm else None)
        self.BN2 = (nnx.BatchNorm(out_mha, rngs=rngs)
                    if batch_norm and ff_channels > 0 else None)
        self.heads, self.concat = H, concat
        self.out_features = O
        self.add_self_loops = add_self_loops
        self.skip_connection = skip_connection
        self.sqrt_out = math.sqrt(O)

    def __call__(self, g: GraphTuple, x=None, e=None, *,
                 deterministic: bool = True):
        if x is None:
            x = g.x
        H, O = self.heads, self.out_features
        W1x = self.W1(x) if self.W1 is not None else None
        W2x = self.W2(x).reshape(-1, H, O)
        W3x = self.W3(x).reshape(-1, H, O)
        W4x = self.W4(x).reshape(-1, H, O)
        # values stay node-level (W2x) unless edge features shift them
        # per-edge; node-level values fuse the sender-gather into the
        # aggregation kernel, and edge-feature-free logits ride the SDDMM
        # kernel (receiver side never gathered).
        if e is not None:
            if self.W6 is None:
                raise ValueError("edge features not configured")
            W6e = self.W6(e).reshape(-1, H, O)
            key = gather(to_src_space(g, W4x), g.senders) + W6e
            val = gather(to_src_space(g, W2x), g.senders) + W6e
            node_vals = False
            logits = (jnp.sum(gather(W3x, g.receivers) * key, -1)
                      / self.sqrt_out)                        # [E, H]
        else:
            val, node_vals, logits = W2x, True, None
        if self.add_self_loops:
            self_logits = jnp.sum(W3x * W4x, -1) / self.sqrt_out
            self_values = W2x
        else:
            self_logits = self_values = None
        if logits is None:
            h = dot_attention(g, W3x, W4x, val, 1.0 / self.sqrt_out,
                              self_logits=self_logits,
                              self_values=self_values)
        else:
            h = attention_aggregate(g, logits, val, self_logits=self_logits,
                                    self_values=self_values,
                                    node_values=node_vals)
        h = h.reshape(-1, H * O) if self.concat else h.mean(axis=1)
        if W1x is not None:
            if self.W5 is not None:
                beta = jax.nn.sigmoid(
                    self.W5(jnp.concatenate([h, W1x, h - W1x], -1)))
                h = beta * W1x + (1.0 - beta) * h
            else:
                h = h + W1x
        if self.skip_connection:
            h = h + x
        if self.BN1 is not None:
            h = self.BN1(h, use_running_average=deterministic)
        if self.FF is not None:
            h1 = h
            h = self.FF(h)
            if self.skip_connection:
                h = h + h1
            if self.BN2 is not None:
                h = self.BN2(h, use_running_average=deterministic)
        return h


# ---------------------------------------------------------------------------
# aggregation-MLP family
# ---------------------------------------------------------------------------

class GatedGraphConv(GNNLayer):
    """Gated graph sequence NN (Li et al.).

    Reference: conv.jl:515-539; math GNNlib conv.jl:218-233 — num_layers GRU
    steps over propagated messages; input zero-padded to ``out`` channels.
    """

    def __init__(self, out_features: int, num_layers: int, *, aggr="sum",
                 rngs: nnx.Rngs):
        self.weight = nnx.Param(glorot_uniform()(
            rngs.params(), (num_layers, out_features, out_features), jnp.float32))
        self.gru = nnx.GRUCell(out_features, out_features, rngs=rngs)
        self.out_features = out_features
        self.num_layers = num_layers
        self.aggr = aggr

    def __call__(self, g: GraphTuple, x=None):
        if x is None:
            x = g.x
        din = x.shape[-1]
        if din > self.out_features:
            raise ValueError("input features must be <= out_features")
        if din < self.out_features:
            x = jnp.pad(x, ((0, 0), (0, self.out_features - din)))
        h = x
        for i in range(self.num_layers):
            m = h @ self.weight[...][i]
            m = propagate(copy_xj, g, self.aggr, xj=m)
            h, _ = self.gru(h, m)
        return h


class EdgeConv(GNNLayer):
    """Dynamic edge conv (Wang et al., DGCNN).

    Reference: conv.jl:575-590; math GNNlib conv.jl:237-246:
    ``aggr_j nn([x_i; x_j - x_i])`` with default max aggregation.
    """

    def __init__(self, nn_module, *, aggr="max"):
        self.nn = nn_module
        self.aggr = aggr

    def __call__(self, g: GraphTuple, x=None):
        if x is None:
            x = g.x
        xj, xi = _expand_srcdst(x)

        def msg(xi_e, xj_e, e):
            return self.nn(jnp.concatenate([xi_e, xj_e - xi_e], -1))

        m = apply_edges(msg, g, xi=xi, xj=xj)
        return aggregate_neighbors(g, self.aggr, m,
                                   num_segments=xi.shape[0])


class GINConv(GNNLayer):
    """Graph isomorphism network (Xu et al.).

    Reference: conv.jl:628-645; math GNNlib conv.jl:250-256:
    ``nn((1 + ε) x_i + aggr_j x_j)``. Only ``nn`` is trainable (ε is a fixed
    hyperparameter, conv.jl:635).
    """

    def __init__(self, nn_module, eps: float = 0.0, *, aggr="sum"):
        self.nn = nn_module
        self.eps = eps
        self.aggr = aggr

    def __call__(self, g: GraphTuple, x=None):
        if x is None:
            x = g.x
        xj, xi = _expand_srcdst(x)
        m = propagate(copy_xj, g, self.aggr, xj=xj)
        if m.shape[0] != xi.shape[0]:
            m = m[: xi.shape[0]]
        return self.nn((1.0 + self.eps) * xi + m)


class NNConv(GNNLayer):
    """Edge-conditioned conv (Gilmer MPNN / Simonovsky).

    Reference: conv.jl:701-730; math GNNlib conv.jl:260-273 — ``nn`` maps
    edge features to an (in x out) matrix applied per edge (batched matmul on
    the MXU).
    """

    def __init__(self, in_features: int, out_features: int, nn_module,
                 act: Callable = None, *, aggr="sum", use_bias: bool = True,
                 rngs: nnx.Rngs):
        self.weight = _init(rngs, (in_features, out_features))
        self.bias = _bias((out_features,)) if use_bias else None
        self.nn = nn_module
        self.act = act
        self.aggr = aggr
        self.in_features, self.out_features = in_features, out_features

    def __call__(self, g: GraphTuple, x=None, e=None):
        if x is None:
            x = g.x
        if e is None:
            e = g.e

        def msg(xi_e, xj_e, ee):
            W = self.nn(ee).reshape(-1, self.in_features, self.out_features)
            return jnp.einsum("ei,eio->eo", xj_e, W)

        m = propagate(msg, g, self.aggr, xj=x, e=e)
        out = x @ self.weight[...] + m
        if self.bias is not None:
            out = out + self.bias[...]
        return self.act(out) if self.act is not None else out


class SAGEConv(GNNLayer):
    """GraphSAGE (Hamilton et al.).

    Reference: conv.jl:770-795; math GNNlib conv.jl:277-283:
    ``σ(W [x_i; aggr_j x_j] + b)`` with mean aggregation default.
    """

    def __init__(self, in_features: int, out_features: int,
                 act: Callable = None, *, aggr="mean", use_bias: bool = True,
                 rngs: nnx.Rngs):
        self.weight = _init(rngs, (2 * in_features, out_features))
        self.bias = _bias((out_features,)) if use_bias else None
        self.act = act
        self.aggr = aggr

    def __call__(self, g: GraphTuple, x=None):
        if x is None:
            x = g.x
        xj, xi = _expand_srcdst(x)
        m = propagate(copy_xj, g, self.aggr, xj=xj)
        if m.shape[0] != xi.shape[0]:
            m = m[: xi.shape[0]]
        out = jnp.concatenate([xi, m], -1) @ self.weight[...]
        if self.bias is not None:
            out = out + self.bias[...]
        return self.act(out) if self.act is not None else out


class ResGatedGraphConv(GNNLayer):
    """Residual gated graph conv (Bresson & Laurent).

    Reference: conv.jl:838-867; math GNNlib conv.jl:287-300:
    ``σ(U x_i + Σ_j η_ij ⊙ V x_j + b)``, η = sigmoid(A x_i + B x_j).
    """

    def __init__(self, in_features: int, out_features: int,
                 act: Callable = None, *, use_bias: bool = True,
                 rngs: nnx.Rngs):
        self.A = _init(rngs, (in_features, out_features))
        self.B = _init(rngs, (in_features, out_features))
        self.U = _init(rngs, (in_features, out_features))
        self.V = _init(rngs, (in_features, out_features))
        self.bias = _bias((out_features,)) if use_bias else None
        self.act = act

    def __call__(self, g: GraphTuple, x=None):
        if x is None:
            x = g.x
        xj, xi = _expand_srcdst(x)
        Ax = xi @ self.A[...]
        Bx = xj @ self.B[...]
        Vx = xj @ self.V[...]

        def msg(xi_e, xj_e, e):
            return jax.nn.sigmoid(xi_e["Ax"] + xj_e["Bx"]) * xj_e["Vx"]

        m = propagate(msg, g, "sum", xi={"Ax": Ax}, xj={"Bx": Bx, "Vx": Vx})
        if m.shape[0] != xi.shape[0]:
            m = m[: xi.shape[0]]
        out = xi @ self.U[...] + m
        if self.bias is not None:
            out = out + self.bias[...]
        return self.act(out) if self.act is not None else out


class CGConv(GNNLayer):
    """Crystal graph conv (Xie & Grossman).

    Reference: conv.jl:914-943; math GNNlib conv.jl:304-333:
    ``x + Σ_j σ(Wf z) ⊙ act(Ws z)``, z = [x_i; x_j; e].
    """

    def __init__(self, in_features: int, out_features: int,
                 act: Callable = None, *, edge_features: int = 0,
                 residual: bool = False, use_bias: bool = True,
                 rngs: nnx.Rngs):
        zdim = 2 * in_features + edge_features
        mk = lambda: nnx.Linear(zdim, out_features, use_bias=use_bias,
                                kernel_init=glorot_uniform(), rngs=rngs)
        self.dense_f = mk()
        self.dense_s = mk()
        self.act = act
        self.residual = residual

    def __call__(self, g: GraphTuple, x=None, e=None):
        if x is None:
            x = g.x
        xj, xi = _expand_srcdst(x)

        def msg(xi_e, xj_e, ee):
            parts = [xi_e, xj_e] + ([ee] if ee is not None else [])
            z = jnp.concatenate(parts, -1)
            s = self.dense_s(z)
            if self.act is not None:
                s = self.act(s)
            return jax.nn.sigmoid(self.dense_f(z)) * s

        m = propagate(msg, g, "sum", xi=xi, xj=xj, e=e)
        if m.shape[0] != xi.shape[0]:
            m = m[: xi.shape[0]]
        if self.residual and xi.shape[-1] == m.shape[-1]:
            m = m + xi
        return m


class MEGNetConv(GNNLayer):
    """MEGNet conv (Chen et al.) — returns updated (x, e).

    Reference: conv.jl:1035-1061; math GNNlib conv.jl:356-368.
    """

    def __init__(self, in_features: int = None, out_features: int = None, *,
                 phi_e=None, phi_v=None, aggr="mean", rngs: nnx.Rngs = None):
        if phi_e is None:
            phi_e = MLP([3 * in_features, out_features, out_features],
                        jax.nn.relu, rngs=rngs)
        if phi_v is None:
            phi_v = MLP([in_features + out_features, out_features,
                         out_features], jax.nn.relu, rngs=rngs)
        self.phi_e, self.phi_v = phi_e, phi_v
        self.aggr = aggr

    def __call__(self, g: GraphTuple, x=None, e=None):
        if x is None:
            x = g.x
        if e is None:
            e = g.e

        def msg(xi_e, xj_e, ee):
            return self.phi_e(jnp.concatenate([xi_e, xj_e, ee], -1))

        ebar = apply_edges(msg, g, xi=x, xj=x, e=e)
        xe = aggregate_neighbors(g, self.aggr, ebar)
        xbar = self.phi_v(jnp.concatenate([x, xe], -1))
        return xbar, ebar


class GMMConv(GNNLayer):
    """Gaussian mixture model conv (Monti et al., MoNet).

    Reference: conv.jl:1111-1148; math GNNlib conv.jl:372-401. Note: we use
    the paper's ``exp(-1/2 ...)`` Gaussian kernel by default; the reference
    computes ``exp(+1/2 ...)`` (conv.jl:381-383), which appears to be a sign
    slip — the test suite there only checks shapes/gradients. Pass
    ``reference_exact=True`` to reproduce the reference's ``exp(+...)``
    bit-for-bit (for allclose-vs-reference validation).
    """

    def __init__(self, in_features: int, out_features: int,
                 act: Callable = None, *, edge_features: int = 1, K: int = 1,
                 residual: bool = False, use_bias: bool = True,
                 reference_exact: bool = False,
                 rngs: nnx.Rngs):
        self.reference_exact = reference_exact
        self.mu = _init(rngs, (K, edge_features))
        self.sigma_inv = _init(rngs, (K, edge_features))
        self.bias = _bias((out_features,)) if use_bias else None
        self.dense_x = nnx.Linear(in_features, out_features * K,
                                  use_bias=False,
                                  kernel_init=glorot_uniform(), rngs=rngs)
        self.act = act
        self.K = K
        self.residual = residual
        self.out_features = out_features

    def __call__(self, g: GraphTuple, x=None, e=None):
        if x is None:
            x = g.x
        if e is None:
            e = g.e
        K, O = self.K, self.out_features
        # w_k(e) = exp(-1/2 sum_d ((e_d - mu_kd) * sigma_inv_kd)^2): [E, K]
        # (reference_exact flips the exponent sign, GNNlib conv.jl:381-383)
        diff = e[:, None, :] - self.mu[...][None, :, :]
        sign = 0.5 if self.reference_exact else -0.5
        w = jnp.exp(sign * jnp.sum(
            (diff * self.sigma_inv[...][None, :, :]) ** 2, -1))
        xj = self.dense_x(x).reshape(-1, K, O)
        m = propagate(e_mul_xj, g, "mean", xj=xj, e=w)
        m = m.mean(axis=1)                                 # mean over K
        if self.bias is not None:
            m = m + self.bias[...]
        if self.act is not None:
            m = self.act(m)
        if self.residual and x.shape[-1] == m.shape[-1]:
            m = m + x
        return m


# ---------------------------------------------------------------------------
# multi-hop family
# ---------------------------------------------------------------------------

class SGConv(GNNLayer):
    """Simplified GCN (Wu et al.): W (D̂^-1/2 Â D̂^-1/2)^k x + b.

    Reference: conv.jl:1197-1225; math GNNlib conv.jl:501-549.
    """

    def __init__(self, in_features: int, out_features: int, k: int = 1, *,
                 add_self_loops: bool = True, use_edge_weight: bool = False,
                 use_bias: bool = True, rngs: nnx.Rngs):
        self.weight = _init(rngs, (in_features, out_features))
        self.bias = _bias((out_features,)) if use_bias else None
        self.k = k
        self.add_self_loops = add_self_loops
        self.use_edge_weight = use_edge_weight

    def __call__(self, g: GraphTuple, x=None, edge_weight=None):
        if x is None:
            x = g.x
        W = self.weight[...]
        din, dout = W.shape
        if dout < din:
            x = x @ W
        c = _gcn_norm(g, edge_weight=edge_weight,
                      use_edge_weight=self.use_edge_weight,
                      add_self_loops=self.add_self_loops, norm_fn=None,
                      dtype=x.dtype)
        for _ in range(self.k):
            x = _gcn_propagate(g, x, c, edge_weight=edge_weight,
                               use_edge_weight=self.use_edge_weight,
                               add_self_loops=self.add_self_loops)
        if dout >= din:
            x = x @ W
        return x + self.bias[...] if self.bias is not None else x


class TAGConv(GNNLayer):
    """Topology-adaptive GCN (Du et al.).

    Reference: conv.jl:1265-1293; math GNNlib conv.jl:634-692 (including its
    cumulative ``sum_pow`` accumulation, reproduced exactly).
    """

    def __init__(self, in_features: int, out_features: int, k: int = 3, *,
                 add_self_loops: bool = True, use_edge_weight: bool = False,
                 use_bias: bool = True, rngs: nnx.Rngs):
        self.weight = _init(rngs, (in_features, out_features))
        self.bias = _bias((out_features,)) if use_bias else None
        self.k = k
        self.add_self_loops = add_self_loops
        self.use_edge_weight = use_edge_weight

    def __call__(self, g: GraphTuple, x=None, edge_weight=None):
        if x is None:
            x = g.x
        c = _gcn_norm(g, edge_weight=edge_weight,
                      use_edge_weight=self.use_edge_weight,
                      add_self_loops=self.add_self_loops, norm_fn=None,
                      dtype=x.dtype)
        W = self.weight[...]
        sum_pow = None
        sum_total = None
        for _ in range(self.k):
            x = _gcn_propagate(g, x, c, edge_weight=edge_weight,
                               use_edge_weight=self.use_edge_weight,
                               add_self_loops=self.add_self_loops)
            sum_pow = x if sum_pow is None else sum_pow + x
            inc = sum_pow @ W
            sum_total = inc if sum_total is None else sum_total + inc
        if self.bias is not None:
            sum_total = sum_total + self.bias[...]
        return sum_total


class DConv(GNNLayer):
    """Diffusion conv (Li et al., DCRNN).

    Reference: conv.jl:1574-1595; math GNNlib conv.jl:696-725. We use the
    standard diffusion transition (inverse out/in degree) by default; the
    reference multiplies by the raw degree (conv.jl:705-712), which diverges
    for dense graphs — its tests only check shapes/gradients. Pass
    ``reference_exact=True`` to reproduce the reference's raw-degree multiply
    (including its loop bounds, which re-apply the order-2 weights) exactly.
    """

    def __init__(self, in_features: int, out_features: int, k: int, *,
                 use_bias: bool = True, reference_exact: bool = False,
                 rngs: nnx.Rngs):
        self.weights = nnx.Param(glorot_uniform()(
            rngs.params(), (2, k, in_features, out_features), jnp.float32))
        self.bias = _bias((out_features,)) if use_bias else None
        self.k = k
        self.reference_exact = reference_exact

    def __call__(self, g: GraphTuple, x=None):
        if x is None:
            x = g.x
        W = self.weights[...]
        gt = g.reverse()

        def prop(graph, xj):
            # e=None lets each graph view supply ITS OWN edge weights
            # (msgpass.jl:223-238 get_edge_weight semantics): for a plain
            # GraphTuple reverse() keeps edge order so this equals passing
            # g.edge_weight; for a mesh-sharded view the reverse partition
            # carries re-ordered weights that an explicit pass would break.
            return propagate(w_mul_xj, graph, "sum", xj=xj)

        h = x @ W[0, 0] + x @ W[1, 0]
        T0 = x
        if self.reference_exact:
            # GNNlib conv.jl:705-723 verbatim: raw-degree node scaling,
            # unclamped degrees, and the `for i in 2:l.k` loop that revisits
            # the order-2 weight slot.
            d_out = degree(g, dir="out", dtype=x.dtype)
            d_in = degree(g, dir="in", dtype=x.dtype)
            if self.k > 1:
                T1_out = prop(g, T0 * d_out[:, None])
                T1_in = prop(gt, T0 * d_in[:, None])
                h = h + T1_in @ W[0, 1] + T1_out @ W[1, 1]
                for i in range(1, self.k):   # 1-based 2:k
                    T2_in = 2.0 * prop(gt, T1_in * d_in[:, None]) - T0
                    T2_out = 2.0 * prop(g, T1_out * d_out[:, None]) - T0
                    h = h + T2_in @ W[0, i] + T2_out @ W[1, i]
                    T1_in, T1_out = T2_in, T2_out
            return h + self.bias[...] if self.bias is not None else h
        d_out = jnp.maximum(degree(g, dir="out", dtype=x.dtype), 1.0)
        d_in = jnp.maximum(degree(g, dir="in", dtype=x.dtype), 1.0)
        if self.k > 1:
            T1_out = prop(g, T0 / d_out[:, None])
            T1_in = prop(gt, T0 / d_in[:, None])
            h = h + T1_in @ W[0, 1] + T1_out @ W[1, 1]
            for i in range(2, self.k):
                T2_in = 2.0 * prop(gt, T1_in / d_in[:, None]) - T0
                T2_out = 2.0 * prop(g, T1_out / d_out[:, None]) - T0
                h = h + T2_in @ W[0, i] + T2_out @ W[1, i]
                T1_in, T1_out = T2_in, T2_out
        return h + self.bias[...] if self.bias is not None else h


class EGNNConv(GNNLayer):
    """E(n)-equivariant GNN (Satorras et al.) — returns (h', coords').

    Reference: conv.jl:1349-1399; math GNNlib conv.jl:459-495.
    """

    def __init__(self, in_features: int, out_features: int, *,
                 edge_features: int = 0, hidden_size: int = None,
                 residual: bool = False, rngs: nnx.Rngs):
        hid = hidden_size if hidden_size is not None else 2 * in_features
        act = jax.nn.swish
        self.phi_e = MLP([2 * in_features + edge_features + 1, hid, hid],
                         act, final_act=act, rngs=rngs)
        self.phi_h = MLP([in_features + hid, hid, out_features], act,
                         rngs=rngs)
        # last layer of phi_x has no bias (reference conv.jl:1377)
        self.phi_x_hidden = nnx.Linear(hid, hid,
                                       kernel_init=glorot_uniform(),
                                       rngs=rngs)
        self.phi_x_out = nnx.Linear(hid, 1, use_bias=False,
                                    kernel_init=glorot_uniform(), rngs=rngs)
        self.residual = residual
        if residual and in_features != out_features:
            raise ValueError("residual requires in == out")

    def __call__(self, g: GraphTuple, h=None, x=None, e=None):
        if h is None:
            h = g.nodes["h"]
        if x is None:
            x = g.x
        x_diff = apply_edges(xi_sub_xj, g, xi=x, xj=x)
        sqnorm = jnp.sum(x_diff ** 2, -1, keepdims=True)
        x_diff = x_diff / (jnp.sqrt(sqnorm) + 1e-6)

        def msg(xi_e, xj_e, ee):
            parts = [xi_e["h"], xj_e["h"], ee["sqnorm"]]
            if ee["e"] is not None:
                parts.append(ee["e"])
            mh = self.phi_e(jnp.concatenate(parts, -1))
            mx = self.phi_x_out(jax.nn.swish(self.phi_x_hidden(mh))) \
                * ee["x_diff"]
            return {"h": mh, "x": mx}

        m = apply_edges(msg, g, xi={"h": h}, xj={"h": h},
                        e={"e": e, "x_diff": x_diff, "sqnorm": sqnorm})
        h_aggr = aggregate_neighbors(g, "sum", m["h"])
        x_aggr = aggregate_neighbors(g, "mean", m["x"])
        hnew = self.phi_h(jnp.concatenate([h, h_aggr], -1))
        h = h + hnew if self.residual else hnew
        return h, x + x_aggr
