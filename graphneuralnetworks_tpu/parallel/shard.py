"""Mesh-parallel message passing and training via shard_map.

Net-new vs the reference (no distributed execution exists there — SURVEY
§2.6): **edge-partitioned propagate with halo exchange**. Each shard owns a
node range and the edges pointing into it; one `all_to_all` over the ICI
"graph" axis ships exactly the boundary-node features each shard needs
(the halo buffer built host-side by parallel/partition.py), then a local
receiver-sorted segment-sum aggregates. Communication volume = the edge-cut
of the partition, not O(N).

Gradients flow through collectives by JAX AD (the transpose of all_to_all is
all_to_all), so the same definition serves forward and backward. Data
parallelism over batched padded graphs composes on an outer "data" mesh axis
(see __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.segment import segment_sum
from .partition import PartitionedGraph
from .shardgraph import shard_graph_local

__all__ = ["halo_propagate_local", "make_sharded_propagate",
           "make_sharded_apply", "shard_partitioned"]


def halo_propagate_local(x_local: jax.Array, pg_local: PartitionedGraph,
                         axis: str, *, edge_weight=None) -> jax.Array:
    """One shard's propagate(copy_xj/w_mul_xj, +) step, inside shard_map.

    Args:
      x_local: [n_local, D] features of owned nodes.
      pg_local: this shard's partition slice (leaves carry a leading
        singleton shard axis, as produced by sharding a
        :class:`PartitionedGraph` with ``P(axis)``).
      axis: mesh axis name for the halo all_to_all.

    Returns [n_local, D] aggregated features on owned nodes.
    """
    send_ids = pg_local.halo_send[0]                      # [P, h_max]
    send = x_local[send_ids]                              # [P, h_max, D]
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
    buf = recv.reshape(pg_local.num_parts * pg_local.h_max, -1)
    w = edge_weight
    if w is None and pg_local.edge_weight is not None:
        w = pg_local.edge_weight[0]
    if pg_local.spmm_aux is not None:
        # local aggregation on the Pallas scatter-matmul: the grouping's
        # "senders" are halo-buffer slots, so the whole shard step is
        # all_to_all + one kernel (ops/pallas/spmm.py)
        from ..ops.pallas.spmm import spmm_gather_scatter
        aux_pair = jax.tree.map(lambda a: a[0], pg_local.spmm_aux)
        w_ext = None
        if w is not None:
            w_ext = jnp.concatenate(
                [jnp.where(pg_local.edge_mask[0], w, 0).astype(buf.dtype),
                 jnp.zeros((1,), buf.dtype)])
        return spmm_gather_scatter(buf, w_ext, aux_pair,
                                   (pg_local.n_local, buf.shape[0]))
    m = buf[pg_local.send_halo_idx[0]]                    # [e_local, D]
    m = jnp.where(pg_local.edge_mask[0][:, None], m, 0)
    if w is not None:
        m = m * w[:, None]
    return segment_sum(m, pg_local.recv_local[0], pg_local.n_local)


def shard_partitioned(pg: PartitionedGraph, axis: str = "graph"):
    """PartitionSpec pytree sharding every array leaf on its shard axis."""
    return jax.tree_util.tree_map(lambda _: P(axis), pg)


def make_sharded_propagate(mesh: Mesh, pg: PartitionedGraph,
                           axis: str = "graph") -> Callable:
    """Build ``f(x_stacked [P, n_local, D], pg) -> [P, n_local, D]`` running
    the halo propagate under shard_map on ``mesh``. Call as ``f(x, pg)`` —
    pass the same ``pg`` (its array leaves are sharded on ``axis``)."""
    specs = shard_partitioned(pg, axis)

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation, and every output here is trivially sharded on `axis`
    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(axis), specs), out_specs=P(axis),
                       check_vma=False)
    def run(x_stacked, pg_local):
        y = halo_propagate_local(x_stacked[0], pg_local, axis)
        return y[None]

    return run


def make_sharded_apply(mesh: Mesh, pg: PartitionedGraph,
                       fn: Callable, axis: str = "graph", *,
                       use_spmm_aux: bool = True) -> Callable:
    """Run an UNMODIFIED layer/model per shard on the mesh.

    ``fn(aux_tree, sg, x_own)`` is the per-shard computation: ``sg`` is this
    shard's :class:`~.shardgraph.ShardGraph` (duck-typed GraphTuple — real
    layers like ``models.GCNConv`` consume it directly; every sender-side
    operand rides ONE halo ``all_to_all``), ``x_own`` is ``[n_local, D]``
    owned-node features, and ``aux_tree`` is any replicated pytree (model
    parameters / nnx state). Returns

        ``run(aux_tree, x_stacked [P, n_local, D], pg) -> [P, n_local, D']``

    jit/grad-compatible: gradients flow to ``aux_tree`` and ``x_stacked``
    through the collectives (the transpose of all_to_all is all_to_all).

    This is the net-new distributed execution the reference lacks (SURVEY
    §2.6): the full §3.1/§3.2 call stacks (GNNlib/src/msgpass.jl:69-156,
    utils.jl:84-97) run sharded with identical numerics.
    """
    specs = shard_partitioned(pg, axis)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(), P(axis), specs), out_specs=P(axis),
                       check_vma=False)
    def run(aux_tree, x_stacked, pg_local):
        sg = shard_graph_local(pg_local, axis, use_spmm_aux=use_spmm_aux)
        y = fn(aux_tree, sg, x_stacked[0])
        return jax.tree.map(lambda a: a[None], y)

    return run
