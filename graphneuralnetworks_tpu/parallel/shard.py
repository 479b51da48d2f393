"""Mesh-parallel message passing and training via shard_map.

Net-new vs the reference (no distributed execution exists there — SURVEY
§2.6): **edge-partitioned propagate with halo exchange**. Each shard owns a
node set and the edges pointing into it; one `all_to_all` over the ICI
"graph" axis ships exactly the boundary-node features each shard needs
(the halo buffer built host-side by parallel/partition.py), then a local
receiver-sorted segment-sum aggregates. Communication volume = the edge-cut
of the partition, not O(N). With the partition's owned/remote edge split
(the default), the owned-sender half of the aggregation has no data
dependence on the collective, so XLA's latency-hiding scheduler overlaps
the all_to_all with it (`_halo_propagate_split`).

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
           "make_sharded_apply", "shard_partitioned", "stack_partitions",
           "make_mesh_train_step"]


def halo_propagate_local(x_local: jax.Array, pg_local: PartitionedGraph,
                         axis: str, *, edge_weight=None) -> jax.Array:
    """One shard's propagate(copy_xj/w_mul_xj, +) step, inside shard_map.

    When the partition carries the owned/remote edge split (the
    ``split_local=True`` default of :func:`~.partition.partition_graph`),
    owned-sender edges aggregate straight from ``x_local`` with no data
    dependence on the collective — XLA's latency-hiding scheduler runs that
    segment-sum while the (off-diagonal-only) ``all_to_all`` is in flight,
    and the remote buffer's row count is set by the true edge cut instead
    of total fan-in (SURVEY §7.3.4's overlap requirement).

    Args:
      x_local: [n_local, D] features of owned nodes.
      pg_local: this shard's partition slice (leaves carry a leading
        singleton shard axis, as produced by sharding a
        :class:`PartitionedGraph` with ``P(axis)``).
      axis: mesh axis name for the halo all_to_all.
      edge_weight: optional [e_local] per-edge weights in COMBINED edge
        order — forces the combined (non-overlap) path; weights carried by
        the partition itself ride the split path fine.

    Returns [n_local, D] aggregated features on owned nodes.
    """
    if pg_local.own_recv is not None and edge_weight is None:
        return _halo_propagate_split(x_local, pg_local, axis)
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


def _halo_propagate_split(x_local: jax.Array, pg: PartitionedGraph,
                          axis: str) -> jax.Array:
    """Overlapped shard step: off-diagonal all_to_all || owned segment-sum.

    ``y = Σ_own w_e x_local[s_e] + Σ_rem w_e buf[s_e]`` — the owned half
    has no dependence on ``buf``, so the compiler hides the collective
    behind it. Bit-equality with the combined path is NOT guaranteed (the
    two halves sum in a different order); tests compare with allclose.
    """
    send = x_local[pg.halo_send_rem[0]]                   # [P, h_rem, D]
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
    w_own = None if pg.own_weight is None else pg.own_weight[0]
    w_rem = None if pg.rem_weight is None else pg.rem_weight[0]

    if pg.split_aux is not None:
        from ..ops.pallas.spmm import spmm_gather_scatter
        a_of, a_or, a_rf, a_rr = (
            jax.tree.map(lambda a: a[0], t) for t in pg.split_aux)

        def wext(wm, mask):
            if wm is None:
                return None
            return jnp.concatenate(
                [jnp.where(mask, wm, 0).astype(x_local.dtype),
                 jnp.zeros((1,), x_local.dtype)])

        # owned half first in program order; dataflow keeps it independent
        # of the collective either way
        y = spmm_gather_scatter(x_local, wext(w_own, pg.own_mask[0]),
                                (a_of, a_or),
                                (pg.n_local, x_local.shape[0]))
        buf = recv.reshape(pg.num_parts * pg.h_rem, -1)
        y = y + spmm_gather_scatter(buf, wext(w_rem, pg.rem_mask[0]),
                                    (a_rf, a_rr),
                                    (pg.n_local, buf.shape[0]))
        return y

    m_own = x_local[pg.own_send[0]]                       # [e_own, D]
    m_own = jnp.where(pg.own_mask[0][:, None], m_own, 0)
    if w_own is not None:
        m_own = m_own * w_own[:, None]
    y = segment_sum(m_own, pg.own_recv[0], pg.n_local)
    buf = recv.reshape(pg.num_parts * pg.h_rem, -1)
    m_rem = jnp.where(pg.rem_mask[0][:, None], buf[pg.rem_send[0]], 0)
    if w_rem is not None:
        m_rem = m_rem * w_rem[:, None]
    return y + segment_sum(m_rem, pg.rem_recv[0], pg.n_local)


def shard_partitioned(pg: PartitionedGraph, axis: str = "graph"):
    """PartitionSpec pytree sharding every array leaf on its shard axis."""
    return jax.tree_util.tree_map(lambda _: P(axis), pg)


def make_sharded_propagate(mesh: Mesh, pg: PartitionedGraph,
                           axis: str = "graph") -> Callable:
    """Build ``f(x_stacked [P, n_local, D], pg) -> [P, n_local, D]`` running
    the halo propagate under shard_map on ``mesh``. Call as ``f(x, pg)`` —
    pass the same ``pg`` (its array leaves are sharded on ``axis``). The
    returned function is jitted: eager shard_map would re-trace (and
    re-run interpret-mode kernels) on every call — measured 7 s/call vs
    16 ms jitted on the 8-device CPU mesh."""
    specs = shard_partitioned(pg, axis)

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation, and every output here is trivially sharded on `axis`
    @jax.jit
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

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(), P(axis), specs), out_specs=P(axis),
                       check_vma=False)
    def run(aux_tree, x_stacked, pg_local):
        sg = shard_graph_local(pg_local, axis, use_spmm_aux=use_spmm_aux)
        y = fn(aux_tree, sg, x_stacked[0])
        return jax.tree.map(lambda a: a[None], y)

    return run


def stack_partitions(pgs):
    """Stack per-replica :class:`PartitionedGraph`\\ s on a leading data
    axis (all must share (num_parts, n_local, e_local, h_max) — pass the
    forced-capacity kwargs to :func:`~.partition.partition_graph`)."""
    return jax.tree.map(lambda *a: jnp.stack(a), *pgs)


def make_mesh_train_step(model, tx, mesh, pg, local_loss, *,
                         data_axis: str | None = "data",
                         graph_axis: str = "graph",
                         use_spmm_aux: bool = True,
                         donate: bool = True):
    """Public dp x graph-partitioned training step (SURVEY §2.6 item 3).

    Composes **batch data parallelism** over independent partitioned graphs
    (mesh axis ``data_axis``) with **edge-partitioned message passing**
    (halo all_to_all over ``graph_axis``) into one jitted step — the
    pattern previously hand-rolled in ``__graft_entry__.dryrun_multichip``,
    promoted to a reusable API. The reference has no distributed execution
    (SURVEY §2.6); this is the net-new capability.

    Args:
      model: an nnx module (e.g. ``models.GNNChain``) — consumed via
        ``nnx.split``; parameters are replicated across the mesh.
      tx: an optax transformation.
      mesh: a ``jax.sharding.Mesh`` whose axis names include ``graph_axis``
        and (unless ``data_axis=None``) ``data_axis``.
      pg: a template :class:`~.partition.PartitionedGraph` — stacked on a
        leading data axis via :func:`stack_partitions` when ``data_axis``
        is set. Only its pytree STRUCTURE is read here; pass the actual
        (identically-structured) graph to every ``step`` call — graphs ride
        as jit *arguments*, never closure constants.
      local_loss: ``local_loss(model, sg, *batch_local) -> (loss_sum,
        weight)`` — this shard's un-normalized loss contribution and its
        weight (e.g. masked node count). The step psums both over all mesh
        axes and minimizes ``sum(loss_sum) / max(sum(weight), 1)``.
      donate: donate the params/opt-state buffers to the step (no
        re-allocation per step; default on).

    Returns ``(step, params, opt_state)`` with
    ``step(params, opt_state, pg, *batch) -> (params, opt_state, loss)``.
    Batch arrays carry leading mesh axes ``[dp, P, n_local, ...]`` (or
    ``[P, n_local, ...]`` with ``data_axis=None``); build them with
    ``np.stack([pg_i.scatter_nodes(x_i) for ...])``.

    Gradients flow through the halo collectives by JAX AD; because the loss
    is psum'd *inside* ``value_and_grad`` of replicated params, the
    resulting grads are already identical on every device — no separate
    pmean.
    """
    from flax import nnx
    import optax

    if graph_axis not in mesh.axis_names:
        raise ValueError(f"mesh has no axis {graph_axis!r}")
    if data_axis is not None and data_axis not in mesh.axis_names:
        raise ValueError(f"mesh has no axis {data_axis!r} "
                         "(pass data_axis=None for graph-only sharding)")
    axes = ((data_axis, graph_axis) if data_axis is not None
            else (graph_axis,))
    batch_spec = P(*axes)
    pg_specs = jax.tree_util.tree_map(lambda _: batch_spec, pg)
    all_axes = axes
    n_outer = len(axes) - 1   # leading axes to strip before the graph axis

    graphdef, params = nnx.split(model)
    opt_state = tx.init(params)

    def train_step(params, opt_state, pg_l, *batch_l):
        def strip(a):
            for _ in range(n_outer):
                a = a[0]
            return a

        pg_local = jax.tree_util.tree_map(strip, pg_l)
        sg = shard_graph_local(pg_local, graph_axis,
                               use_spmm_aux=use_spmm_aux)
        batch_local = tuple(jax.tree.map(lambda a: strip(a)[0], b)
                            for b in batch_l)

        def loss_fn(p):
            m = nnx.merge(graphdef, p)
            loss_sum, weight = local_loss(m, sg, *batch_local)
            loss_sum = jax.lax.psum(loss_sum, all_axes)
            weight = jax.lax.psum(weight, all_axes)
            return loss_sum / jnp.maximum(weight, 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # inside shard_map, AD through the psum'd loss leaves device i with
        # N/W * d(s_i)/dθ — its LOCAL contribution scaled by the device
        # count (the transpose of psum is psum: the 1/W cotangent is
        # re-summed to N/W before flowing into each local summand). pmean
        # therefore reconstructs the exact global gradient (1/W) * dS/dθ
        # and makes every replica's update identical.
        grads = jax.tree.map(lambda t: jax.lax.pmean(t, all_axes), grads)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, loss

    def make(nbatch):
        sm = functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(), P(), pg_specs) + (batch_spec,) * nbatch,
            out_specs=(P(), P(), P()), check_vma=False)
        return jax.jit(sm(train_step),
                       donate_argnums=(0, 1) if donate else ())

    cache: dict[int, Callable] = {}

    def step(params, opt_state, pg_arg, *batch):
        fn = cache.get(len(batch))
        if fn is None:
            fn = cache[len(batch)] = make(len(batch))
        return fn(params, opt_state, pg_arg, *batch)

    return step, params, opt_state
