"""Temporal recurrent graph layers: GNNRecurrence + cells.

Reference parity: GraphNeuralNetworks/src/layers/temporalconv.jl — `scan`
driver (:1-19), `GNNRecurrence` (:121-139), `GConvGRUCell` (:200-258),
`GConvLSTMCell` (:355-441), `DCGRUCell` (:537-579), `EvolveGCNOCell`
(:678-709), `TGCNCell` (:809-853), sugar constructors (:293,477,613,752,884);
`A3TGCN` from GNNLux/src/layers/temporalconv.jl:149-183.

TPU-first: time is a leading axis — features are [T, N_pad, D] — and the
recurrence over a *static* graph runs under `jax.lax.scan` with the graph
held constant (SURVEY §3.5). For time-varying snapshot graphs
(`TemporalGraph`), cells are applied per-snapshot in an unrolled loop (or a
scan over stacked uniform snapshots).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..graph import GraphTuple
from ..temporal import TemporalGraph
from .basic import GNNChain, GNNLayer, glorot_uniform
from .conv import ChebConv, cheb_lambda_max, DConv, GCNConv

__all__ = [
    "GNNRecurrence", "GConvGRUCell", "GConvLSTMCell", "DCGRUCell",
    "EvolveGCNOCell", "TGCNCell", "GConvGRU", "GConvLSTM", "DCGRU",
    "EvolveGCNO", "TGCN", "A3TGCN",
]


class GNNRecurrence(GNNLayer):
    """Apply a graph recurrent cell over a temporal sequence.

    Reference: temporalconv.jl:121-139. ``layer(g, x [T, N_pad, D])`` with a
    static `GraphTuple` returns stacked outputs [T, N_pad, out] via
    `lax.scan`; with a `TemporalGraph` returns a list of per-snapshot
    outputs (the reference's vector-of-matrices form).
    """

    def __init__(self, cell):
        self.cell = cell

    def initial_state(self, g, x):
        return self.cell.initial_state(g, x)

    def __call__(self, g, x, state=None):
        if isinstance(g, TemporalGraph):
            xs = x if not isinstance(x, jnp.ndarray) else list(x)
            state = (self.cell.initial_state(g.snapshots[0], xs[0])
                     if state is None else state)
            outs = []
            for gt, xt in zip(g.snapshots, xs):
                yt, state = self.cell(gt, xt, state)
                outs.append(yt)
            return outs
        if state is None:
            state = self.cell.initial_state(g, x[0])
        cell = self.cell

        # loop-invariant per-graph context, computed ONCE before the scan
        # (XLA does not hoist it out of the scan body): e.g. the ChebConv
        # cells' eigmax — 2470 -> 412 ms for a timed 10x(T=8) run at 65k
        # nodes (HETERO_TEMPORAL_r5)
        prep = getattr(cell, "static_context", None)
        ctx = prep(g, x[0]) if prep is not None else {}

        graphdef, params, rest = nnx.split(cell, nnx.Param, ...)

        def step(carry, xt):
            m = nnx.merge(graphdef, params, rest)
            yt, new_state = m(g, xt, carry, **ctx)
            return new_state, yt

        _, ys = jax.lax.scan(step, state, x)
        return ys


def _cheb_lam(g, dtype, lambda_max):
    """Shared per-step eigmax for ChebConv-based cells (None -> computed
    once, matrix-free; see conv.cheb_lambda_max)."""
    if lambda_max is not None:
        return lambda_max
    return cheb_lambda_max(g, dtype)


class GConvGRUCell(GNNLayer):
    """ChebConv-based GRU cell (Seo et al.).

    Reference: temporalconv.jl:200-258. State: h [N_pad, out].
    """

    def __init__(self, in_features: int, out_features: int, k: int, *,
                 use_bias: bool = True, rngs: nnx.Rngs):
        mk = lambda i, o: ChebConv(i, o, k, use_bias=use_bias, rngs=rngs)
        self.conv_x_r, self.conv_h_r = mk(in_features, out_features), \
            mk(out_features, out_features)
        self.conv_x_z, self.conv_h_z = mk(in_features, out_features), \
            mk(out_features, out_features)
        self.conv_x_h, self.conv_h_h = mk(in_features, out_features), \
            mk(out_features, out_features)
        self.out_features = out_features

    def initial_state(self, g, x):
        return jnp.zeros((x.shape[0], self.out_features), x.dtype)

    def static_context(self, g, x):
        """Loop-invariant context for GNNRecurrence: the shared eigmax."""
        return {"lambda_max": cheb_lambda_max(g, x.dtype)}

    def __call__(self, g: GraphTuple, x, h=None, *, lambda_max=None):
        if h is None:
            h = self.initial_state(g, x)
        # one eigmax for all six internal ChebConvs (and, via lax.scan
        # closure-hoisting, effectively once per sequence on a static
        # graph): the per-conv default re-ran the sparse power iteration
        # six times per step — 2517 -> ~110 ms for an 8-step scan at 65k
        # nodes (HETERO_TEMPORAL_r5)
        lam = _cheb_lam(g, x.dtype, lambda_max)
        r = jax.nn.sigmoid(self.conv_x_r(g, x, lambda_max=lam)
                           + self.conv_h_r(g, h, lambda_max=lam))
        z = jax.nn.sigmoid(self.conv_x_z(g, x, lambda_max=lam)
                           + self.conv_h_z(g, h, lambda_max=lam))
        htilde = jnp.tanh(self.conv_x_h(g, x, lambda_max=lam)
                          + self.conv_h_h(g, r * h, lambda_max=lam))
        h = (1.0 - z) * htilde + z * h
        return h, h


class GConvLSTMCell(GNNLayer):
    """ChebConv-based LSTM cell with peephole weights (Seo et al.).

    Reference: temporalconv.jl:355-441. State: (h, c).
    """

    def __init__(self, in_features: int, out_features: int, k: int, *,
                 use_bias: bool = True, rngs: nnx.Rngs):
        mk = lambda i, o: ChebConv(i, o, k, use_bias=use_bias, rngs=rngs)
        for gate in ("i", "f", "c", "o"):
            setattr(self, f"conv_x_{gate}", mk(in_features, out_features))
            setattr(self, f"conv_h_{gate}", mk(out_features, out_features))
            setattr(self, f"w_{gate}", nnx.Param(
                glorot_uniform()(rngs.params(), (out_features, 1), jnp.float32)[:, 0]))
            setattr(self, f"b_{gate}",
                    nnx.Param(jnp.zeros((out_features,), jnp.float32))
                    if use_bias
                    else None)
        self.out_features = out_features

    def initial_state(self, g, x):
        z = jnp.zeros((x.shape[0], self.out_features), x.dtype)
        return (z, z)

    def static_context(self, g, x):
        """Loop-invariant context for GNNRecurrence: the shared eigmax."""
        return {"lambda_max": cheb_lambda_max(g, x.dtype)}

    def _gate(self, name, g, x, h, c, lam):
        out = getattr(self, f"conv_x_{name}")(g, x, lambda_max=lam) \
            + getattr(self, f"conv_h_{name}")(g, h, lambda_max=lam) \
            + getattr(self, f"w_{name}")[...] * c
        b = getattr(self, f"b_{name}")
        return out + b[...] if b is not None else out

    def __call__(self, g: GraphTuple, x, state=None, *, lambda_max=None):
        if state is None:
            state = self.initial_state(g, x)
        h, c = state
        lam = _cheb_lam(g, x.dtype, lambda_max)   # one eigmax per step
        i = jax.nn.sigmoid(self._gate("i", g, x, h, c, lam))
        f = jax.nn.sigmoid(self._gate("f", g, x, h, c, lam))
        c = f * c + i * jnp.tanh(self._gate("c", g, x, h, c, lam))
        o = jax.nn.sigmoid(self._gate("o", g, x, h, c, lam))
        h = o * jnp.tanh(c)
        return h, (h, c)


class DCGRUCell(GNNLayer):
    """Diffusion-convolutional GRU (DCRNN, Li et al.).

    Reference: temporalconv.jl:537-579 — gates via DConv on [x; h].
    """

    def __init__(self, in_features: int, out_features: int, k: int, *,
                 use_bias: bool = True, rngs: nnx.Rngs):
        mk = lambda: DConv(in_features + out_features, out_features, k,
                           use_bias=use_bias, rngs=rngs)
        self.dconv_u = mk()
        self.dconv_r = mk()
        self.dconv_c = mk()
        self.out_features = out_features

    def initial_state(self, g, x):
        return jnp.zeros((x.shape[0], self.out_features), x.dtype)

    def __call__(self, g: GraphTuple, x, h=None):
        if h is None:
            h = self.initial_state(g, x)
        xh = jnp.concatenate([x, h], -1)
        z = jax.nn.sigmoid(self.dconv_u(g, xh))
        r = jax.nn.sigmoid(self.dconv_r(g, xh))
        c = jnp.tanh(self.dconv_c(g, jnp.concatenate([x, h * r], -1)))
        h = z * h + (1.0 - z) * c
        return h, h


class EvolveGCNOCell(GNNLayer):
    """EvolveGCN-O: GCN whose weights evolve through an LSTM (Pareja et al.).

    Reference: temporalconv.jl:678-709. Works on time-varying snapshot
    graphs — the state is the flattened conv weight + LSTM state.
    """

    def __init__(self, in_features: int, out_features: int, *,
                 use_bias: bool = True, rngs: nnx.Rngs):
        self.conv = GCNConv(in_features, out_features, use_bias=use_bias,
                            rngs=rngs)
        self.lstm = nnx.OptimizedLSTMCell(in_features * out_features,
                                          in_features * out_features,
                                          rngs=rngs)
        self.in_features, self.out_features = in_features, out_features

    def initial_state(self, g, x):
        w = self.conv.weight[...].reshape(-1)
        z = jnp.zeros((w.shape[0],), jnp.float32)
        return {"weight": w, "lstm": (z, z)}  # (c, h) zeros carry

    def __call__(self, g: GraphTuple, x, state=None):
        if state is None:
            state = self.initial_state(g, x)
        # the evolved weight is the LSTM's *input* each step
        # (temporalconv.jl:703-705)
        carry, weight = self.lstm(state["lstm"], state["weight"])
        W = weight.reshape(self.in_features, self.out_features)
        y = self.conv(g, x, conv_weight=W)
        return y, {"weight": weight, "lstm": carry}


class TGCNCell(GNNLayer):
    """T-GCN cell: stacked GCNConvs + GRU-style gating (Zhao et al.).

    Reference: temporalconv.jl:809-853.
    """

    def __init__(self, in_features: int, out_features: int, *,
                 add_self_loops: bool = True, use_bias: bool = True,
                 rngs: nnx.Rngs):
        def conv_pair():
            return GNNChain(
                GCNConv(in_features, out_features, jax.nn.relu,
                        add_self_loops=add_self_loops, use_bias=use_bias,
                        rngs=rngs),
                GCNConv(out_features, out_features,
                        add_self_loops=add_self_loops, use_bias=use_bias,
                        rngs=rngs))

        mk_dense = lambda: nnx.Linear(2 * out_features, out_features,
                                      kernel_init=glorot_uniform(),
                                      use_bias=use_bias, rngs=rngs)
        self.conv_z, self.dense_z = conv_pair(), mk_dense()
        self.conv_r, self.dense_r = conv_pair(), mk_dense()
        self.conv_h, self.dense_h = conv_pair(), mk_dense()
        self.out_features = out_features

    def initial_state(self, g, x):
        return jnp.zeros((x.shape[0], self.out_features), x.dtype)

    def __call__(self, g: GraphTuple, x, h=None):
        if h is None:
            h = self.initial_state(g, x)
        z = jax.nn.sigmoid(self.dense_z(
            jnp.concatenate([self.conv_z(g, x), h], -1)))
        r = jax.nn.sigmoid(self.dense_r(
            jnp.concatenate([self.conv_r(g, x), h], -1)))
        htilde = jnp.tanh(self.dense_h(
            jnp.concatenate([self.conv_h(g, x), r * h], -1)))
        h = (1.0 - z) * h + z * htilde
        return h, h


def GConvGRU(in_features, out_features, k, **kw) -> GNNRecurrence:
    """temporalconv.jl:293."""
    return GNNRecurrence(GConvGRUCell(in_features, out_features, k, **kw))


def GConvLSTM(in_features, out_features, k, **kw) -> GNNRecurrence:
    """temporalconv.jl:477."""
    return GNNRecurrence(GConvLSTMCell(in_features, out_features, k, **kw))


def DCGRU(in_features, out_features, k, **kw) -> GNNRecurrence:
    """temporalconv.jl:613."""
    return GNNRecurrence(DCGRUCell(in_features, out_features, k, **kw))


def EvolveGCNO(in_features, out_features, **kw) -> GNNRecurrence:
    """temporalconv.jl:752."""
    return GNNRecurrence(EvolveGCNOCell(in_features, out_features, **kw))


def TGCN(in_features, out_features, **kw) -> GNNRecurrence:
    """temporalconv.jl:884."""
    return GNNRecurrence(TGCNCell(in_features, out_features, **kw))


class A3TGCN(GNNLayer):
    """Attention temporal GCN: soft attention over TGCN outputs.

    Reference: GNNLux/src/layers/temporalconv.jl:149-183 (the Flux frontend
    lacks it): run TGCN over the sequence, score each timestep with two Dense
    layers, softmax **over time**, and return the attention-weighted sum
    [N_pad, out].
    """

    def __init__(self, in_features: int, out_features: int, *,
                 rngs: nnx.Rngs, **kw):
        self.tgcn = TGCN(in_features, out_features, rngs=rngs, **kw)
        self.dense1 = nnx.Linear(out_features, out_features,
                                 kernel_init=glorot_uniform(), rngs=rngs)
        self.dense2 = nnx.Linear(out_features, out_features,
                                 kernel_init=glorot_uniform(), rngs=rngs)

    def __call__(self, g: GraphTuple, x, state=None):
        h = self.tgcn(g, x, state)               # [T, N, out]
        if isinstance(h, (list, tuple)):
            # TemporalGraph inputs: GNNRecurrence returns a per-snapshot
            # list (the reference's vector-of-matrices form); the attention
            # needs one [T, N, out] tensor, so the snapshots must share a
            # padded capacity (build with uniform n_pad, or via
            # TemporalGraph.stacked())
            shapes = {tuple(t.shape) for t in h}
            if len(shapes) != 1:
                raise ValueError(
                    "A3TGCN over a TemporalGraph needs uniform per-snapshot "
                    f"shapes for the time-softmax; got {sorted(shapes)}")
            h = jnp.stack(h)
        e = self.dense2(self.dense1(h))
        a = jax.nn.softmax(e, axis=0)            # attention over time
        return jnp.sum(a * h, axis=0)            # [N, out]
