"""GraphTuple — the TPU-native graph container.

Reference parity: GNNGraphs/src/gnngraph.jl:108-345 (`GNNGraph`) and
GNNGraphs/src/datastore.jl:59-200 (`DataStore`). Unlike the reference's
dynamically-sized COO container, `GraphTuple` is a **static-shape, padded,
donation-friendly pytree** so every op under `jax.jit` sees fixed shapes:

- ``senders``/``receivers``: int32[E_pad] COO endpoints, padded entries point at
  node 0 and are masked out via ``edge_mask`` (derived from ``num_edges``).
- ``num_nodes``/``num_edges``/``num_graphs``: *traced* int32 scalars holding the
  true counts; the padded capacities are the array shapes (static under jit).
- ``nodes``/``edges``/``globals_``: immutable dict-of-arrays feature stores with
  leading dims N_pad / E_pad / G_pad (the reference's ndata/edata/gdata).
- ``node_graph_id``: int32[N_pad] graph indicator for batched graphs
  (GNNGraphs/src/query.jl:500-512); padded nodes point at graph G_pad-1.
- Edges are (optionally) sorted by receiver at construction so aggregation can
  use ``indices_are_sorted=True`` segment ops and the Pallas CSR/SpMM kernels.

Graphs are built host-side with numpy (``graph``, ``batch``) and then live on
device as a frozen pytree. All index-structure arrays are integers and are
treated as non-differentiable (the reference fences them with
``@non_differentiable``, GNNGraphs/src/query.jl:612-621).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "GraphTuple",
    "graph",
    "from_dense_adjacency",
    "pad_sizes",
    "round_up",
]

FeatureDict = dict[str, jax.Array]


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to a multiple of ``m`` (TPU lane/sublane alignment)."""
    return ((int(x) + m - 1) // m) * m


def pad_sizes(num_nodes: int, num_edges: int, *, node_multiple: int = 8,
              edge_multiple: int = 128) -> tuple[int, int]:
    """Default padded capacities: next multiple, with at least one pad slot.

    One spare node slot is always kept so padded edges can target a dummy node
    without touching real rows; one spare edge slot keeps E_pad > 0.
    """
    n_pad = round_up(max(num_nodes + 1, 1), node_multiple)
    e_pad = round_up(max(num_edges, 1), edge_multiple)
    return n_pad, e_pad


def _freeze_dict(d: Mapping[str, Any] | None) -> FeatureDict:
    return dict(d) if d else {}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphTuple:
    """Padded static-shape graph (possibly a batch of graphs).

    See module docstring. ``num_graphs_static`` and ``sorted_by_receivers`` are
    static metadata (shape-determining / dispatch-determining), everything else
    is traced data.
    """

    senders: jax.Array                     # int32[E_pad]
    receivers: jax.Array                   # int32[E_pad]
    num_nodes: jax.Array                   # int32[] true node count
    num_edges: jax.Array                   # int32[] true edge count
    num_graphs: jax.Array                  # int32[] true graph count
    node_graph_id: jax.Array               # int32[N_pad]
    nodes: FeatureDict = dataclasses.field(default_factory=dict)
    edges: FeatureDict = dataclasses.field(default_factory=dict)
    globals_: FeatureDict = dataclasses.field(default_factory=dict)
    edge_weight: jax.Array | None = None   # float[E_pad] or None
    # (aux_fwd, aux_rev) SpmmAux pair enabling the Pallas scatter-matmul
    # fast path (ops/pallas/spmm.py); built host-side on request.
    spmm_aux: tuple | None = None
    # optional bool[E_pad] per-edge validity for graphs whose INVALID edges
    # are scattered rather than a trailing prefix (the device-side sampler:
    # edge slots are structural constants, isolated-node slots get
    # edge_valid=False). ANDed into edge_mask, so every mask-respecting op
    # (segment mean/max, attention softmax, weighted SpMM) excludes them.
    edge_valid: jax.Array | None = None
    num_graphs_static: int = dataclasses.field(
        default=1, metadata=dict(static=True))
    sorted_by_receivers: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    # when not None, senders[t] == offset + t for every REAL edge (the
    # device sampler's layer-major slot layout): sender-side node gathers
    # become pure row slices (and their VJPs free slices instead of
    # scatter-adds) on the segment aggregation path (ops/msgpass.py).
    senders_iota_offset: int | None = dataclasses.field(
        default=None, metadata=dict(static=True))

    # ---- static capacities -------------------------------------------------
    @property
    def n_pad(self) -> int:
        return self.node_graph_id.shape[0]

    @property
    def e_pad(self) -> int:
        return self.senders.shape[0]

    @property
    def g_pad(self) -> int:
        return self.num_graphs_static

    @property
    def src_pad(self) -> int:
        """Size of the sender index space. For a plain graph this is the node
        capacity; a mesh-sharded view (parallel.ShardGraph) overrides it with
        the halo-buffer size — ops use it so one code path serves both."""
        return self.n_pad

    # ---- masks -------------------------------------------------------------
    @property
    def node_mask(self) -> jax.Array:
        """bool[N_pad] — True for real nodes."""
        return jnp.arange(self.n_pad, dtype=jnp.int32) < self.num_nodes

    @property
    def edge_mask(self) -> jax.Array:
        """bool[E_pad] — True for real edges."""
        m = jnp.arange(self.e_pad, dtype=jnp.int32) < self.num_edges
        if self.edge_valid is not None:
            m = m & self.edge_valid
        return m

    @property
    def graph_mask(self) -> jax.Array:
        """bool[G_pad] — True for real graphs in the batch."""
        return jnp.arange(self.g_pad, dtype=jnp.int32) < self.num_graphs

    # ---- feature access (reference: g.x resolves through ndata) ------------
    @property
    def x(self) -> jax.Array | None:
        return self.nodes.get("x")

    @property
    def e(self) -> jax.Array | None:
        return self.edges.get("e")

    def edge_index(self) -> tuple[jax.Array, jax.Array]:
        """COO (senders, receivers) — reference ``edge_index`` query.jl:12-14."""
        return self.senders, self.receivers

    def get_edge_weight(self) -> jax.Array | None:
        return self.edge_weight

    # ---- functional updates ------------------------------------------------
    def replace(self, **kw) -> "GraphTuple":
        return dataclasses.replace(self, **kw)

    def with_nodes(self, **feats) -> "GraphTuple":
        return self.replace(nodes={**self.nodes, **feats})

    def with_edges(self, **feats) -> "GraphTuple":
        return self.replace(edges={**self.edges, **feats})

    def with_globals(self, **feats) -> "GraphTuple":
        return self.replace(globals_={**self.globals_, **feats})

    def reverse(self) -> "GraphTuple":
        """Swap edge direction (senders <-> receivers). The receiver-sorted
        invariant no longer holds, so segment ops fall back to unsorted mode;
        the SpMM aux pair simply swaps (the reverse grouping is already
        receiver-sorted for the reversed graph)."""
        aux = None
        if self.spmm_aux is not None:
            aux = (self.spmm_aux[1], self.spmm_aux[0])
        return self.replace(senders=self.receivers, receivers=self.senders,
                            sorted_by_receivers=False, spmm_aux=aux)

    def __repr__(self) -> str:  # concrete values only outside jit
        def _n(v):
            try:
                return int(v)
            except Exception:
                return "?"
        return (f"GraphTuple(num_nodes={_n(self.num_nodes)}/{self.n_pad}, "
                f"num_edges={_n(self.num_edges)}/{self.e_pad}, "
                f"num_graphs={_n(self.num_graphs)}/{self.g_pad}, "
                f"nodes={list(self.nodes)}, edges={list(self.edges)}, "
                f"globals={list(self.globals_)})")


def _normalize_feats(feats, n: int, n_pad: int, what: str,
                     pad_graph_count: int | None = None) -> FeatureDict:
    """Validate leading dim == n, pad leading dim to n_pad with zeros.

    The reference enforces trailing-dim == n in DataStore
    (GNNGraphs/src/datastore.jl:59-106); we use the leading dim (row-major,
    TPU-friendly feature-minor layout).
    """
    if feats is None:
        return {}
    if not isinstance(feats, Mapping):
        feats = {"x" if what == "node" else ("e" if what == "edge" else "u"):
                 feats}
    out = {}
    for k, v in feats.items():
        v = np.asarray(v)
        if what == "global" and v.ndim == 0:
            v = v[None]
        if v.shape[0] != n:
            raise ValueError(
                f"{what} feature {k!r}: leading dim {v.shape[0]} != {n}")
        if n_pad > n:
            pad = [(0, n_pad - n)] + [(0, 0)] * (v.ndim - 1)
            v = np.pad(v, pad)
        out[k] = jnp.asarray(v)
    return out


def graph(senders, receivers, *, num_nodes=None, nodes=None, edges=None,
          globals_=None, edge_weight=None, n_pad: int | None = None,
          e_pad: int | None = None, sort: bool = True,
          node_graph_id=None, num_graphs: int = 1,
          g_pad: int | None = None,
          build_spmm_aux: bool = False,
          spmm_fixed_eblk: int | None = None) -> GraphTuple:
    """Host-side GraphTuple builder (numpy in, device pytree out).

    Reference parity: the `GNNGraph((s, t, w); ndata, edata, gdata)` COO
    constructor (GNNGraphs/src/gnngraph.jl:108-200). Directedness follows the
    reference: edges are directed; callers wanting undirected semantics add
    reverse edges (as the reference does for Graphs.jl inputs).
    """
    s = np.asarray(senders, dtype=np.int32).reshape(-1)
    r = np.asarray(receivers, dtype=np.int32).reshape(-1)
    if s.shape != r.shape:
        raise ValueError("senders/receivers length mismatch")
    ne = int(s.shape[0])
    if num_nodes is None:
        num_nodes = int(max(s.max(initial=-1), r.max(initial=-1)) + 1)
    nn = int(num_nodes)
    if ne and (s.max() >= nn or r.max() >= nn or s.min() < 0 or r.min() < 0):
        raise ValueError("edge index out of range")

    if edge_weight is not None:
        edge_weight = np.asarray(edge_weight).reshape(-1)
        if edge_weight.shape[0] != ne:
            raise ValueError("edge_weight length mismatch")

    ef = edges
    if ef is not None and not isinstance(ef, Mapping):
        ef = {"e": ef}
    ef = dict(ef) if ef else {}

    if sort and ne:
        order = np.argsort(r, kind="stable")
        s, r = s[order], r[order]
        if edge_weight is not None:
            edge_weight = edge_weight[order]
        ef = {k: np.asarray(v)[order] for k, v in ef.items()}

    npad, epad_default = pad_sizes(nn, ne)
    n_pad = n_pad if n_pad is not None else npad
    e_pad = e_pad if e_pad is not None else epad_default
    if n_pad < nn or e_pad < ne:
        raise ValueError("padded capacity smaller than true size")

    # Padded edges self-loop on the last (dummy) node slot so they never read
    # or write real rows even if a mask is dropped.
    dummy = n_pad - 1
    s_p = np.full((e_pad,), dummy, dtype=np.int32)
    r_p = np.full((e_pad,), dummy, dtype=np.int32)
    s_p[:ne], r_p[:ne] = s, r

    if node_graph_id is None:
        # device-side fill — never ships an all-zeros array host->device
        # (matters in the minibatch pipeline where every batch builds one)
        gid = jnp.zeros((n_pad,), dtype=jnp.int32)
    else:
        gid = np.asarray(node_graph_id, dtype=np.int32)
        if gid.shape[0] == nn and n_pad > nn:
            gid = np.pad(gid, (0, n_pad - nn),
                         constant_values=num_graphs - 1)
        elif gid.shape[0] != n_pad:
            raise ValueError("node_graph_id length mismatch")
    g_pad = g_pad if g_pad is not None else int(num_graphs)

    ew = None
    if edge_weight is not None:
        ew = np.zeros((e_pad,), dtype=np.asarray(edge_weight).dtype)
        ew[:ne] = edge_weight
        ew = jnp.asarray(ew)

    aux = None
    if build_spmm_aux:
        if not sort:
            raise ValueError("build_spmm_aux requires sort=True")
        from .ops.pallas.spmm import build_spmm_aux as _build
        aux_fwd = _build(r_p, s_p, ne, n_pad,
                         fixed_n_eblk=spmm_fixed_eblk)
        rev_order = np.argsort(s, kind="stable")
        rev_r = np.full((e_pad,), dummy, np.int32)
        rev_s = np.full((e_pad,), dummy, np.int32)
        rev_r[:ne] = s[rev_order]   # reverse graph's receivers
        rev_s[:ne] = r[rev_order]
        aux_rev = _build(rev_r, rev_s, ne, n_pad,
                         orig_ids=rev_order.astype(np.int32),
                         fixed_n_eblk=spmm_fixed_eblk)
        aux = (aux_fwd, aux_rev)

    return GraphTuple(
        spmm_aux=aux,
        senders=jnp.asarray(s_p),
        receivers=jnp.asarray(r_p),
        num_nodes=jnp.int32(nn),
        num_edges=jnp.int32(ne),
        num_graphs=jnp.int32(num_graphs),
        node_graph_id=jnp.asarray(gid),
        nodes=_normalize_feats(nodes, nn, n_pad, "node"),
        edges=_normalize_feats(ef, ne, e_pad, "edge"),
        globals_=_normalize_feats(globals_, int(num_graphs), g_pad, "global"),
        edge_weight=ew,
        num_graphs_static=g_pad,
        sorted_by_receivers=bool(sort),
    )


def from_dense_adjacency(adj, **kw) -> GraphTuple:
    """Build from a dense (or scipy-like) adjacency matrix.

    Reference parity: `GNNGraph(::AbstractMatrix)` via ``to_coo``
    (GNNGraphs/src/convert.jl:60-100). Nonzero A[i, j] is an edge i -> j with
    weight A[i, j].
    """
    A = np.asarray(adj)
    if A.ndim != 2 or A.shape[0] != A.shape[1]:
        raise ValueError("adjacency must be square")
    s, r = np.nonzero(A)
    w = A[s, r]
    if not np.all(w == 1):
        kw.setdefault("edge_weight", w.astype(np.float32))
    return graph(s, r, num_nodes=A.shape[0], **kw)
