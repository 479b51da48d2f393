"""ShardGraph — a shard-local graph view that runs the REAL layer zoo
under a device mesh.

Net-new vs the reference (no distributed execution exists there, SURVEY
§2.6). Inside ``shard_map`` each shard holds a :class:`ShardGraph` built from
its :class:`~..parallel.partition.PartitionedGraph` slice. The view
duck-types the :class:`~..graph.GraphTuple` surface the ops layer consumes
(``receivers``/``senders``/``edge_mask``/``n_pad``/``e_pad``/``spmm_aux``…)
with one twist: **the sender index space is the halo buffer**. Sender-side
node arrays are converted into that space by :meth:`ShardGraph.src_space` —
a single ``all_to_all`` over the mesh axis shipping exactly the boundary
rows each shard needs (communication = edge-cut, not O(N)).

Because every shard owns ALL in-edges of its owned nodes (edges are
partitioned by receiver, partition.py:120-122), everything receiver-keyed is
local math: in-degree, segment mean/max/min, per-destination edge-softmax.
That is why unmodified layers — GCNConv's degree norm, SAGEConv's mean,
GATConv's softmax (GNNlib/src/msgpass.jl:145-156, utils.jl:84-97 semantics)
— produce bit-identical results to the single-device run.

AD: the transpose of ``all_to_all`` is ``all_to_all`` and the transpose of
the halo gather is a scatter-add, so gradients flow through ``src_space``
with no custom rules.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .partition import PartitionedGraph

__all__ = ["ShardGraph", "shard_graph_local"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardGraph:
    """One shard's local graph view (valid only inside ``shard_map``).

    ``senders`` index the HALO BUFFER (``[num_parts * h_max]`` rows produced
    by :meth:`src_space`), ``receivers`` index owned-local node slots.
    """

    senders: jax.Array                    # int32[e_local] halo-buffer index
    receivers: jax.Array                  # int32[e_local] local receiver
    edge_mask: jax.Array                  # bool[e_local]
    node_mask: jax.Array                  # bool[n_local]
    halo_send: jax.Array                  # int32[P, h_max] local ids to ship
    num_nodes: jax.Array                  # int32[] true owned count
    num_edges: jax.Array                  # int32[] true local edge count
    edge_weight: jax.Array | None = None  # float[e_local]
    nodes: dict = dataclasses.field(default_factory=dict)
    # per-shard (aux_fwd, aux_rev) SpmmAux slice: fwd groups local edges by
    # local receiver with halo-buffer value rows (partition.py builds it)
    spmm_aux: tuple | None = None
    # the REVERSED graph's shard view (same node ownership; built when the
    # partition was created with with_reverse=True) — reverse() swaps to it
    reverse_view: "ShardGraph | None" = None
    axis: str = dataclasses.field(default="graph", metadata=dict(static=True))
    num_parts: int = dataclasses.field(default=1, metadata=dict(static=True))
    h_max: int = dataclasses.field(default=1, metadata=dict(static=True))
    # edges inherit the global receiver sort (owned ids are ascending and
    # glob2loc preserves order), so sorted segment ops stay valid
    sorted_by_receivers: bool = dataclasses.field(
        default=True, metadata=dict(static=True))

    # ---- GraphTuple-compatible surface --------------------------------------
    @property
    def n_pad(self) -> int:
        return self.node_mask.shape[0]

    @property
    def e_pad(self) -> int:
        return self.receivers.shape[0]

    @property
    def src_pad(self) -> int:
        """Rows of the halo buffer = the sender index space."""
        return self.num_parts * self.h_max

    @property
    def x(self):
        return self.nodes.get("x")

    @property
    def node_graph_id(self):
        return jnp.zeros((self.n_pad,), jnp.int32)

    @property
    def num_graphs(self):
        return jnp.int32(1)

    def reverse(self):
        """The reversed graph's shard view (same owned nodes, reverse edges
        partitioned by THEIR receiver = the original sender), sharing this
        view's node features. Requires the partition to have been built
        with ``partition_graph(..., with_reverse=True)`` — unlocks
        DConv/DCGRU bidirectional diffusion under the mesh."""
        if self.reverse_view is None:
            raise NotImplementedError(
                "ShardGraph.reverse: partition the graph with "
                "partition_graph(..., with_reverse=True) to enable "
                "reverse-direction propagation under the mesh")
        return dataclasses.replace(self.reverse_view, nodes=self.nodes)

    # ---- the halo exchange ---------------------------------------------------
    def src_space(self, v: jax.Array) -> jax.Array:
        """Owned-node array [n_local, ...] -> halo buffer [P * h_max, ...].

        One ``all_to_all`` over ``axis``: shard q ships rows
        ``v[halo_send[p]]`` to every shard p; the received buffer row block q
        holds the rows shard q owns that this shard's edges reference
        (including this shard's own block — a local copy). ``senders`` index
        this buffer directly.
        """
        send = v[self.halo_send]                      # [P, h_max, ...]
        recv = jax.lax.all_to_all(send, self.axis, split_axis=0,
                                  concat_axis=0)
        return recv.reshape((self.src_pad,) + v.shape[1:])


def shard_graph_local(pg_local: PartitionedGraph, axis: str,
                      *, use_spmm_aux: bool = True,
                      nodes: dict | None = None) -> ShardGraph:
    """Build this shard's :class:`ShardGraph` inside ``shard_map``.

    ``pg_local`` is the shard's :class:`PartitionedGraph` slice — its array
    leaves carry a leading singleton shard axis (the result of sharding the
    stacked pytree with ``P(axis)``).
    """
    n_local = pg_local.node_mask.shape[-1]
    if pg_local.num_parts * pg_local.h_max == n_local:
        # ops.to_src_space infers "needs the halo all_to_all" from leading
        # dim == n_pad; if the halo buffer had the same row count, an
        # already-converted operand would be converted twice (silently wrong)
        raise ValueError(
            f"halo-buffer rows (num_parts*h_max = {pg_local.num_parts}*"
            f"{pg_local.h_max}) equal n_local ({n_local}); repartition with "
            "h_max+1 (partition_graph avoids this automatically)")
    aux = None
    if use_spmm_aux and pg_local.spmm_aux is not None:
        aux = jax.tree.map(lambda a: a[0], pg_local.spmm_aux)
    rev = None
    if pg_local.reverse_pg is not None:
        rev = shard_graph_local(pg_local.reverse_pg, axis,
                                use_spmm_aux=use_spmm_aux)
    return ShardGraph(
        reverse_view=rev,
        senders=pg_local.send_halo_idx[0],
        receivers=pg_local.recv_local[0],
        edge_mask=pg_local.edge_mask[0],
        node_mask=pg_local.node_mask[0],
        halo_send=pg_local.halo_send[0],
        num_nodes=jnp.sum(pg_local.node_mask[0].astype(jnp.int32)),
        num_edges=jnp.sum(pg_local.edge_mask[0].astype(jnp.int32)),
        edge_weight=(None if pg_local.edge_weight is None
                     else pg_local.edge_weight[0]),
        nodes=dict(nodes) if nodes else {},
        spmm_aux=aux,
        axis=axis,
        num_parts=pg_local.num_parts,
        h_max=pg_local.h_max,
    )
