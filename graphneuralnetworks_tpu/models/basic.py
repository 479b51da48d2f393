"""Model basics: GNNLayer base, GNNChain, WithGraph, DotDecoder.

Reference parity: GraphNeuralNetworks/src/layers/basic.jl — `GNNLayer`
abstract type (:8), graph-in/graph-out call wrapping ndata (:12), `WithGraph`
(:40-52), `GNNChain` graph-aware chain with indexing/naming and Parallel
handling (:106-185), `DotDecoder` (:210-212).

Layers are flax.nnx modules (explicit-parameter style like the GNNLux
frontend, GNNLux/src/layers/basic.jl) with features-last arrays [N_pad, D].
"""

from __future__ import annotations

import inspect

import jax
import jax.numpy as jnp
from flax import nnx

from ..graph import GraphTuple
from ..ops import apply_edges, xi_dot_xj

__all__ = ["GNNLayer", "GNNChain", "WithGraph", "DotDecoder", "Precision",
           "glorot_uniform"]

glorot_uniform = nnx.initializers.glorot_uniform


class GNNLayer(nnx.Module):
    """Base class for graph layers: ``layer(g, x, ...) -> array``.

    ``layer(g)`` (graph-in/graph-out, reference basic.jl:12) is provided via
    :meth:`on_graph`, returning ``g`` with updated node features.
    """

    def on_graph(self, g: GraphTuple, key: str = "x", **kw) -> GraphTuple:
        out = self(g, g.nodes[key], **kw)
        return g.replace(nodes={**g.nodes, key: out})


class GNNChain(nnx.Module):
    """Sequential container aware of the graph argument.

    Reference: GraphNeuralNetworks/src/layers/basic.jl:106-185. GNN layers
    (anything deriving :class:`GNNLayer` or taking ``(g, x)``) get the graph;
    plain callables (nnx.Linear, activations, dropout...) are applied to the
    features only — mirroring `_applylayer` dispatch (basic.jl:136-150).
    """

    def __init__(self, *layers, **named_layers):
        if layers and named_layers:
            raise ValueError("pass layers positionally or by name, not both")
        items = (list(enumerate(layers)) if layers
                 else list(named_layers.items()))
        self._names = [str(k) for k, _ in items]
        self.layers = nnx.List([v for _, v in items])

    def __getitem__(self, i):
        if isinstance(i, str):
            return self.layers[self._names.index(i)]
        if isinstance(i, slice):
            chain = GNNChain()
            chain._names = self._names[i]
            chain.layers = nnx.List(list(self.layers)[i])
            return chain
        return self.layers[i]

    def __len__(self):
        return len(self.layers)

    def __call__(self, g: GraphTuple, x=None, **kw):
        """Forward; extra kwargs (e.g. ``deterministic=False``) are threaded
        to every layer whose signature accepts them — the analog of the
        reference's `_applylayer` passing layer-specific args through
        (basic.jl:136-150)."""
        if x is None:
            x = g.x
        for layer in self.layers:
            x = _apply_layer(layer, g, x, **kw)
        return x


def _filter_kw(fn, kw: dict) -> dict:
    """Subset of ``kw`` that ``fn`` accepts (by name or **kwargs)."""
    if not kw:
        return kw
    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return {}
    params = sig.parameters
    if any(p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()):
        return kw
    return {k: v for k, v in kw.items() if k in params}


def _apply_layer(layer, g, x, **kw):
    if isinstance(layer, GNNChain):
        return layer(g, x, **kw)
    if isinstance(layer, GNNLayer):
        return layer(g, x, **_filter_kw(layer.__call__, kw))
    # Parallel-style tuple of branches concatenated on features
    if isinstance(layer, (tuple, list)):
        return jnp.concatenate([_apply_layer(b, g, x, **kw) for b in layer],
                               -1)
    return layer(x, **_filter_kw(layer, kw))


class WithGraph(nnx.Module):
    """Close a model over a fixed graph: ``WithGraph(model, g)(x)``.

    Reference: basic.jl:40-52. ``traingraph=True`` lifts the graph's feature
    arrays into trainable parameters (`Flux.trainable(l::WithGraph)` includes
    `l.g` when traingraph, basic.jl:51); the index structure stays
    non-trainable data either way. Calling with an explicit graph
    (``wg(g2, x2)``) bypasses the stored one (basic.jl:52)."""

    def __init__(self, model, g: GraphTuple, *, traingraph: bool = False):
        self.model = model
        self.traingraph = traingraph
        if traingraph:
            # feature arrays become Params; the structural skeleton is data
            self._nfeat = nnx.Dict(
                {k: nnx.Param(v) for k, v in g.nodes.items()})
            self._efeat = nnx.Dict(
                {k: nnx.Param(v) for k, v in g.edges.items()})
            self._gfeat = nnx.Dict(
                {k: nnx.Param(v) for k, v in g.globals_.items()})
            self.g = nnx.data(g.replace(nodes={}, edges={}, globals_={}))
        else:
            # Stored as plain attribute: the graph rides along as data.
            self.g = nnx.data(g)

    def _graph(self) -> GraphTuple:
        if not self.traingraph:
            return self.g
        return self.g.replace(
            nodes={k: v[...] for k, v in self._nfeat.items()},
            edges={k: v[...] for k, v in self._efeat.items()},
            globals_={k: v[...] for k, v in self._gfeat.items()})

    def __call__(self, x=None, *args, **kw):
        if isinstance(x, GraphTuple):  # explicit graph overrides stored one
            return self.model(x, *args, **kw)
        return self.model(self._graph(), x, *args, **kw)


class Precision(GNNLayer):
    """Mixed-precision wrapper: run any layer (or chain) in ``dtype``.

    TPU-native mixed precision (the Flux-analog of ``f16(model)``, but with
    f32 MASTER parameters — the standard large-scale training recipe):
    at call time float parameters and float array inputs are cast to
    ``dtype`` (bfloat16 by default — the MXU-native type), the wrapped
    module runs entirely in that dtype (the fused Pallas kernels keep their
    softmax state in f32 internally, see ops/pallas/edge_softmax.py), and
    gradients flow back through the casts so optimizer state and updates
    stay f32.

    Example::

        model = Precision(GNNChain(GCNConv(16, 32, relu, rngs=rngs),
                                   GATConv(32, 8, rngs=rngs)))
        y = model(g, x)            # bf16 compute, ~half the HBM traffic
        loss = f(y.astype(jnp.float32))
    """

    def __init__(self, module: nnx.Module, dtype=jnp.bfloat16):
        self.module = module
        self.dtype = dtype

    def _cast(self, v):
        if isinstance(v, (jax.Array, nnx.Param)) and jnp.issubdtype(
                jnp.asarray(v).dtype, jnp.floating):
            return jnp.asarray(v).astype(self.dtype)
        return v

    def __call__(self, g, x=None, *args, **kw):
        gd, state = nnx.split(self.module)
        low = jax.tree.map(self._cast, state)
        x = jax.tree.map(self._cast, x) if x is not None else None
        args = jax.tree.map(self._cast, args)
        kw = jax.tree.map(self._cast, kw)
        return nnx.merge(gd, low)(g, x, *args, **kw)


class DotDecoder(GNNLayer):
    """Per-edge dot product of endpoint features -> [E_pad, 1].

    Reference: basic.jl:210-212 / GNNlib/src/layers/basic.jl:1-3
    (`dot_decoder`). Used for link prediction on positive/negative graphs.
    """

    def __call__(self, g: GraphTuple, x=None):
        if x is None:
            x = g.x
        return apply_edges(xi_dot_xj, g, xi=x, xj=x)
