"""Heterogeneous graphs: typed node sets + typed relations.

Reference parity: GNNGraphs/src/gnnheterograph/gnnheterograph.jl:85-297
(`GNNHeteroGraph`: `graph::Dict{(srcT, relT, dstT) => COO}`, per-type
`num_nodes`, per-type ndata / per-relation edata, `edge_type_subgraph`,
indexing by node/edge type) plus the hetero transforms
(gnnheterograph/transform.jl: add_self_loops :20-76, add_edges :92-163,
batch :165-230) and generators (gnnheterograph/generate.jl:26-123).

TPU-first design: the relation set and node-type set are **static** (dict
keys), so layers unroll over relations under jit (SURVEY §3.5); each node
type and relation is padded independently. Relations are bipartite edge
lists: ``senders`` index the source type's padded node array, ``receivers``
the destination type's.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .graph import GraphTuple, pad_sizes

EType = tuple[str, str, str]

__all__ = ["Relation", "HeteroGraphTuple", "heterograph", "rand_heterograph",
           "rand_bipartite_heterograph", "batch_hetero"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Relation:
    """One typed edge set (bipartite COO, padded, receiver-sorted)."""

    senders: jax.Array            # int32[E_pad] into src type's node array
    receivers: jax.Array          # int32[E_pad] into dst type's node array
    num_edges: jax.Array          # int32[]
    data: dict = dataclasses.field(default_factory=dict)
    edge_weight: jax.Array | None = None
    # (aux_fwd, aux_rev) SpmmAux pair for the Pallas kernels (fwd groups by
    # receiver over the DST type's pad, rev by sender over the SRC type's).
    spmm_aux: tuple | None = None
    sorted_by_receivers: bool = dataclasses.field(
        default=True, metadata=dict(static=True))

    @property
    def e_pad(self) -> int:
        return self.senders.shape[0]

    @property
    def edge_mask(self) -> jax.Array:
        return jnp.arange(self.e_pad, dtype=jnp.int32) < self.num_edges


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HeteroGraphTuple:
    """Typed graph: per-type padded node sets + dict of relations."""

    num_nodes: dict            # ntype -> int32[]
    node_mask: dict            # ntype -> bool[N_pad_t] (carries capacity)
    node_data: dict            # ntype -> {name: [N_pad_t, ...]}
    relations: dict            # (srcT, relT, dstT) -> Relation
    graph_data: dict = dataclasses.field(default_factory=dict)

    # ---- queries (gnnheterograph.jl:180-297) -------------------------------
    @property
    def ntypes(self) -> list[str]:
        return list(self.num_nodes.keys())

    @property
    def etypes(self) -> list[EType]:
        return list(self.relations.keys())

    @property
    def num_node_types(self) -> int:
        return len(self.num_nodes)

    @property
    def num_edge_types(self) -> int:
        return len(self.relations)

    def n_pad(self, ntype: str) -> int:
        return self.node_mask[ntype].shape[0]

    def __getitem__(self, key):
        """g["ntype"] -> node feature dict; g[(s, r, d)] -> Relation
        (gnnheterograph.jl:289-297)."""
        if isinstance(key, tuple):
            return self.relations[key]
        return self.node_data.get(key, {})

    def edge_index(self, etype: EType):
        rel = self.relations[etype]
        return rel.senders, rel.receivers

    def edge_type_subgraph(self, etypes: Sequence[EType] | EType):
        """Keep only the given relations (+ their endpoint types)
        (gnnheterograph.jl:250-271)."""
        if isinstance(etypes, tuple) and len(etypes) == 3 and \
                all(isinstance(t, str) for t in etypes):
            etypes = [etypes]
        keep_nt = set()
        for (s, _, d) in etypes:
            keep_nt.add(s)
            keep_nt.add(d)
        return HeteroGraphTuple(
            num_nodes={t: v for t, v in self.num_nodes.items()
                       if t in keep_nt},
            node_mask={t: v for t, v in self.node_mask.items()
                       if t in keep_nt},
            node_data={t: v for t, v in self.node_data.items()
                       if t in keep_nt},
            relations={et: self.relations[et] for et in etypes},
            graph_data=self.graph_data,
        )

    def relation_graph(self, etype: EType) -> GraphTuple:
        """View one relation as a (bipartite) GraphTuple for the layer zoo.

        ``n_pad``/masks refer to the *destination* type; layers receive
        ``(x_src, x_dst)`` tuples and aggregate onto destinations, matching
        the reference's `expand_srcdst` convention (GNNlib/src/utils.jl:123).
        """
        src_t, _, dst_t = etype
        rel = self.relations[etype]
        dst_pad = self.n_pad(dst_t)
        return GraphTuple(
            senders=rel.senders,
            receivers=rel.receivers,
            num_nodes=self.num_nodes[dst_t],
            num_edges=rel.num_edges,
            num_graphs=jnp.int32(1),
            node_graph_id=jnp.zeros((dst_pad,), jnp.int32),
            edges=rel.data,
            edge_weight=rel.edge_weight,
            sorted_by_receivers=rel.sorted_by_receivers,
            spmm_aux=rel.spmm_aux,
        )

    def degree(self, etype: EType, *, dir: str = "in",
               dtype=jnp.float32) -> jax.Array:
        """Per-relation degree on src (out) or dst (in) type nodes."""
        from .ops.segment import segment_sum
        rel = self.relations[etype]
        src_t, _, dst_t = etype
        w = jnp.ones((rel.e_pad,), dtype)
        if dir == "in":
            return segment_sum(w, rel.receivers, self.n_pad(dst_t),
                               mask=rel.edge_mask)
        return segment_sum(w, rel.senders, self.n_pad(src_t),
                           mask=rel.edge_mask)

    def replace_node_data(self, ntype: str, **feats) -> "HeteroGraphTuple":
        nd = dict(self.node_data)
        nd[ntype] = {**nd.get(ntype, {}), **feats}
        return dataclasses.replace(self, node_data=nd)


def heterograph(relations: Mapping[EType, tuple], *, num_nodes=None,
                node_data=None, edge_data=None, graph_data=None,
                node_pad=None, edge_pad=None,
                bidirected_pairs: bool = False,
                build_spmm_aux: bool = False) -> HeteroGraphTuple:
    """Host-side builder.

    ``relations``: {(srcT, relT, dstT): (senders, receivers[, weight])}.
    ``num_nodes``: {ntype: n} (inferred from max index otherwise).
    Mirrors the `GNNHeteroGraph(pairs...)` constructor
    (gnnheterograph.jl:85-160); only COO is supported, like the reference
    (gnnheterograph.jl:118).
    """
    num_nodes = dict(num_nodes or {})
    rels_np = {}
    for et, val in relations.items():
        s = np.asarray(val[0], np.int32).reshape(-1)
        r = np.asarray(val[1], np.int32).reshape(-1)
        w = np.asarray(val[2]).reshape(-1) if len(val) > 2 else None
        src_t, _, dst_t = et
        num_nodes.setdefault(src_t, 0)
        num_nodes.setdefault(dst_t, 0)
        num_nodes[src_t] = max(num_nodes[src_t], int(s.max(initial=-1)) + 1)
        num_nodes[dst_t] = max(num_nodes[dst_t], int(r.max(initial=-1)) + 1)
        rels_np[et] = (s, r, w)

    node_pad = dict(node_pad or {})
    masks, nums, ndata = {}, {}, {}
    node_data = dict(node_data or {})
    for t, n in num_nodes.items():
        npad = node_pad.get(t) or pad_sizes(n, 0)[0]
        mask = np.zeros(npad, bool)
        mask[:n] = True
        masks[t] = jnp.asarray(mask)
        nums[t] = jnp.int32(n)
        feats = {}
        for k, v in (node_data.get(t) or {}).items():
            v = np.asarray(v)
            if v.shape[0] != n:
                raise ValueError(f"node feature {t}.{k} leading dim mismatch")
            feats[k] = jnp.asarray(
                np.pad(v, [(0, npad - n)] + [(0, 0)] * (v.ndim - 1)))
        ndata[t] = feats

    edge_data = dict(edge_data or {})
    edge_pad = dict(edge_pad or {})
    rels = {}
    for et, (s, r, w) in rels_np.items():
        ne = len(s)
        epad = edge_pad.get(et) or pad_sizes(0, ne)[1]
        order = np.argsort(r, kind="stable")
        s, r = s[order], r[order]
        if w is not None:
            w = w[order]
        dst_pad = masks[et[2]].shape[0]
        dummy_src = masks[et[0]].shape[0] - 1
        sp = np.full(epad, dummy_src, np.int32)
        rp = np.full(epad, dst_pad - 1, np.int32)
        sp[:ne], rp[:ne] = s, r
        feats = {}
        for k, v in (edge_data.get(et) or {}).items():
            v = np.asarray(v)[order]
            feats[k] = jnp.asarray(
                np.pad(v, [(0, epad - ne)] + [(0, 0)] * (v.ndim - 1)))
        wp = None
        if w is not None:
            wp = np.zeros(epad, w.dtype)
            wp[:ne] = w
            wp = jnp.asarray(wp)
        aux = None
        if build_spmm_aux:
            from .ops.pallas.spmm import build_spmm_aux as _build
            src_pad = masks[et[0]].shape[0]
            aux_fwd = _build(rp, sp, ne, dst_pad)
            rev_order = np.argsort(s, kind="stable")
            rev_r = np.zeros(epad, np.int32)
            rev_s = np.zeros(epad, np.int32)
            rev_r[:ne] = s[rev_order]   # reverse graph's receivers = senders
            rev_s[:ne] = r[rev_order]
            aux_rev = _build(rev_r, rev_s, ne, src_pad,
                             orig_ids=rev_order.astype(np.int32))
            aux = (aux_fwd, aux_rev)
        rels[et] = Relation(senders=jnp.asarray(sp), receivers=jnp.asarray(rp),
                            num_edges=jnp.int32(ne), data=feats,
                            edge_weight=wp, spmm_aux=aux)

    return HeteroGraphTuple(num_nodes=nums, node_mask=masks, node_data=ndata,
                            relations=rels,
                            graph_data={k: jnp.asarray(v) for k, v in
                                        (graph_data or {}).items()})


def rand_heterograph(num_nodes: Mapping[str, int],
                     num_edges: Mapping[EType, int], *,
                     node_data=None, seed: int = 0,
                     bidirected: bool = False,
                     build_spmm_aux: bool = False) -> HeteroGraphTuple:
    """Random hetero graph (gnnheterograph/generate.jl:26-66)."""
    rng = np.random.default_rng(seed)
    rels = {}
    for et, ne in num_edges.items():
        src_t, _, dst_t = et
        s = rng.integers(0, num_nodes[src_t], ne).astype(np.int32)
        r = rng.integers(0, num_nodes[dst_t], ne).astype(np.int32)
        rels[et] = (s, r)
        if bidirected:
            rev = (et[2], et[1] + "_rev", et[0])
            rels[rev] = (r.copy(), s.copy())
    return heterograph(rels, num_nodes=dict(num_nodes), node_data=node_data,
                       build_spmm_aux=build_spmm_aux)


def rand_bipartite_heterograph(n1: int, n2: int, num_edges, *,
                               node_types=("A", "B"), rel=("to", "rev_to"),
                               bidirected: bool = True,
                               seed: int = 0,
                               build_spmm_aux: bool = False
                               ) -> HeteroGraphTuple:
    """gnnheterograph/generate.jl:110-123."""
    a, b = node_types
    if isinstance(num_edges, int):
        e12 = e21 = num_edges
    else:
        e12, e21 = num_edges
    rng = np.random.default_rng(seed)
    rels = {(a, rel[0], b): (rng.integers(0, n1, e12),
                             rng.integers(0, n2, e12))}
    if bidirected:
        s, r = rels[(a, rel[0], b)]
        rels[(b, rel[1], a)] = (r.copy(), s.copy())
    else:
        rels[(b, rel[1], a)] = (rng.integers(0, n2, e21),
                                rng.integers(0, n1, e21))
    return heterograph(rels, num_nodes={a: n1, b: n2},
                       build_spmm_aux=build_spmm_aux)


def add_self_loops_hetero(g: HeteroGraphTuple,
                          etype: EType) -> HeteroGraphTuple:
    """Add i->i edges for one relation whose src and dst types match
    (gnnheterograph/transform.jl:20-76)."""
    src_t, _, dst_t = etype
    if src_t != dst_t:
        raise ValueError("self loops need src type == dst type "
                         "(transform.jl:20-41)")
    rel = g.relations[etype]
    ne = int(rel.num_edges)
    n = int(g.num_nodes[src_t])
    s = np.concatenate([np.asarray(rel.senders)[:ne], np.arange(n)])
    r = np.concatenate([np.asarray(rel.receivers)[:ne], np.arange(n)])
    w = rel.edge_weight
    tup = (s, r)
    if w is not None:
        tup = tup + (np.concatenate([np.asarray(w)[:ne], np.ones(n)]),)
    rels = _rels_as_tuples(g)
    rels[etype] = tup
    edata = _edata_dict(g)
    if edata.get(etype):
        # new self-loop edges get zero features (the reference carries the
        # old edata unchanged, leaving it shorter than the edge list —
        # transform.jl:56; the static-shape invariant here requires
        # leading-dim == num_edges, so zero-fill instead)
        edata[etype] = {
            k: np.concatenate([v, np.zeros((n,) + v.shape[1:], v.dtype)])
            for k, v in edata[etype].items()}
    return heterograph(
        rels,
        num_nodes={t: int(v) for t, v in g.num_nodes.items()},
        node_data=_ndata_dict(g), edge_data=edata,
        graph_data=g.graph_data)


def _rels_as_tuples(g: HeteroGraphTuple) -> dict:
    """Unpad every relation back to (s, r[, w]) host tuples."""
    return {et: ((np.asarray(rr.senders)[: int(rr.num_edges)],
                  np.asarray(rr.receivers)[: int(rr.num_edges)])
                 + ((np.asarray(rr.edge_weight)[: int(rr.num_edges)],)
                    if rr.edge_weight is not None else ()))
            for et, rr in g.relations.items()}


def _edata_dict(g: HeteroGraphTuple) -> dict:
    """Unpad per-relation edge features (sorted order, matching
    :func:`_rels_as_tuples`)."""
    return {et: {k: np.asarray(v)[: int(rr.num_edges)]
                 for k, v in rr.data.items()}
            for et, rr in g.relations.items()}


def _ndata_dict(g: HeteroGraphTuple) -> dict:
    return {t: {k: np.asarray(v)[: int(g.num_nodes[t])]
                for k, v in d.items()}
            for t, d in g.node_data.items()}


def add_edges_hetero(g: HeteroGraphTuple, etype: EType, senders, receivers,
                     *, edge_weight=None, edata=None) -> HeteroGraphTuple:
    """Append edges to one relation (creating it if absent)
    (gnnheterograph/transform.jl:92-163). ``edata``: optional feature dict
    (or single array -> ``"e"``) for the NEW edges; concatenated with the
    relation's existing features, zero-filling whichever side lacks a key
    (the reference cat_features semantics, transform.jl:130-136)."""
    rels = _rels_as_tuples(g)
    all_edata = _edata_dict(g)
    s2 = np.asarray(senders, np.int32)
    r2 = np.asarray(receivers, np.int32)
    if edata is not None and not isinstance(edata, Mapping):
        edata = {"e": edata}
    new_edata = {k: np.asarray(v) for k, v in (edata or {}).items()}
    for k, v in new_edata.items():
        if v.shape[0] != len(s2):
            raise ValueError(f"edata {k!r} leading dim {v.shape[0]} != "
                             f"{len(s2)} new edges")
    if etype in rels:
        old = rels[etype]
        ne_old = len(old[0])
        s = np.concatenate([old[0], s2])
        r = np.concatenate([old[1], r2])
        if len(old) > 2 or edge_weight is not None:
            ow = old[2] if len(old) > 2 else np.ones(len(old[0]))
            nw = (np.asarray(edge_weight) if edge_weight is not None
                  else np.ones(len(s2)))
            rels[etype] = (s, r, np.concatenate([ow, nw]))
        else:
            rels[etype] = (s, r)
        old_edata = all_edata.get(etype, {})
        merged = {}
        for k in {*old_edata, *new_edata}:
            ov = old_edata.get(k)
            nv = new_edata.get(k)
            if ov is None:
                ov = np.zeros((ne_old,) + nv.shape[1:], nv.dtype)
            if nv is None:
                nv = np.zeros((len(s2),) + ov.shape[1:], ov.dtype)
            merged[k] = np.concatenate([ov, nv])
        all_edata[etype] = merged
    else:
        rels[etype] = ((s2, r2) if edge_weight is None
                       else (s2, r2, np.asarray(edge_weight)))
        all_edata[etype] = new_edata
    return heterograph(
        rels,
        num_nodes={t: int(v) for t, v in g.num_nodes.items()},
        node_data=_ndata_dict(g), edge_data=all_edata,
        graph_data=g.graph_data)


def batch_hetero(graphs: Sequence[HeteroGraphTuple]) -> HeteroGraphTuple:
    """Disjoint union of hetero graphs (gnnheterograph/transform.jl:165-230).

    Host-side; per-type node offsets, per-relation edge concatenation.
    """
    if not graphs:
        raise ValueError("empty batch")
    ntypes = graphs[0].ntypes
    etypes = graphs[0].etypes
    rels, nnodes, ndata = {}, {}, {}
    for t in ntypes:
        counts = [int(g.num_nodes[t]) for g in graphs]
        nnodes[t] = sum(counts)
        feats = {}
        for k in graphs[0].node_data.get(t, {}):
            feats[k] = np.concatenate(
                [np.asarray(g.node_data[t][k])[: int(g.num_nodes[t])]
                 for g in graphs])
        ndata[t] = feats
    edata = {}
    for et in etypes:
        src_t, _, dst_t = et
        ss, rs, ws = [], [], []
        s_off = d_off = 0
        any_w = any(g.relations[et].edge_weight is not None for g in graphs)
        efeats = {k: [] for k in graphs[0].relations[et].data}
        for g in graphs:
            rel = g.relations[et]
            ne = int(rel.num_edges)
            ss.append(np.asarray(rel.senders)[:ne] + s_off)
            rs.append(np.asarray(rel.receivers)[:ne] + d_off)
            if any_w:
                w = (np.asarray(rel.edge_weight)[:ne]
                     if rel.edge_weight is not None else np.ones(ne))
                ws.append(w)
            for k, acc in efeats.items():
                acc.append(np.asarray(rel.data[k])[:ne])
            s_off += int(g.num_nodes[src_t])
            d_off += int(g.num_nodes[dst_t])
        tup = (np.concatenate(ss), np.concatenate(rs))
        if any_w:
            tup = tup + (np.concatenate(ws),)
        rels[et] = tup
        if efeats:
            edata[et] = {k: np.concatenate(v) for k, v in efeats.items()}
    # graph-level features concatenate on the leading (graph) axis
    # (transform.jl:228 cat_features over gdata)
    gdata = {}
    for k in graphs[0].graph_data:
        gdata[k] = np.concatenate(
            [np.atleast_1d(np.asarray(g.graph_data[k])) for g in graphs])
    return heterograph(rels, num_nodes=nnodes, node_data=ndata,
                       edge_data=edata or None, graph_data=gdata or None)
