"""Temporal graphs: sequences of snapshots (and static-graph time series).

Reference parity: GNNGraphs/src/temporalsnapshotsgnngraph.jl:56-244
(`TemporalSnapshotsGNNGraph`: vector of snapshots + per-snapshot counts +
temporal-global `tgdata`, time indexing, add/remove_snapshot, property
broadcast over snapshots).

TPU-first: two representations —

- **static graph, time-varying features**: one `GraphTuple` + features shaped
  [T, N_pad, D]; recurrences run under `jax.lax.scan` (SURVEY §3.5).
- **varying graphs**: `TemporalGraph` holding a *list* of padded snapshots
  (a pytree); cells iterate snapshots in an unrolled Python loop — each
  distinct (n_pad, e_pad) bucket compiles once. Building snapshots with
  shared capacities (`from_snapshots(..., uniform=True)`) also enables a
  stacked scan.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from .graph import GraphTuple

__all__ = ["TemporalGraph"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TemporalGraph:
    """A sequence of graph snapshots + temporal-global features ``tgdata``."""

    snapshots: list            # list[GraphTuple]
    tgdata: dict = dataclasses.field(default_factory=dict)

    # ---- queries (temporalsnapshotsgnngraph.jl:100-244) --------------------
    @property
    def num_snapshots(self) -> int:
        return len(self.snapshots)

    @property
    def num_nodes(self) -> list:
        return [g.num_nodes for g in self.snapshots]

    @property
    def num_edges(self) -> list:
        return [g.num_edges for g in self.snapshots]

    def __len__(self) -> int:
        return len(self.snapshots)

    def __getitem__(self, t):
        """Time indexing: int -> snapshot; slice/list -> TemporalGraph
        (temporalsnapshotsgnngraph.jl:106-130)."""
        if isinstance(t, int):
            return self.snapshots[t]
        if isinstance(t, slice):
            return dataclasses.replace(self, snapshots=self.snapshots[t])
        return dataclasses.replace(
            self, snapshots=[self.snapshots[i] for i in t])

    def add_snapshot(self, t: int, g: GraphTuple) -> "TemporalGraph":
        """Insert snapshot at time t (temporalsnapshotsgnngraph.jl:132-166)."""
        snaps = list(self.snapshots)
        snaps.insert(t, g)
        return dataclasses.replace(self, snapshots=snaps)

    def remove_snapshot(self, t: int) -> "TemporalGraph":
        """temporalsnapshotsgnngraph.jl:168-201."""
        snaps = list(self.snapshots)
        snaps.pop(t)
        return dataclasses.replace(self, snapshots=snaps)

    def node_features(self, key: str = "x") -> list:
        """Property broadcast over snapshots
        (temporalsnapshotsgnngraph.jl:219-225)."""
        return [g.nodes.get(key) for g in self.snapshots]

    def with_tgdata(self, **feats) -> "TemporalGraph":
        return dataclasses.replace(self, tgdata={**self.tgdata, **feats})

    # ---- constructors ------------------------------------------------------
    @staticmethod
    def from_snapshots(snapshots: Sequence[GraphTuple], *, tgdata=None,
                       uniform: bool = False) -> "TemporalGraph":
        """Wrap snapshots; with ``uniform=True`` re-pad all snapshots to the
        max (n_pad, e_pad) so their pytrees share one treedef/shape (enables
        `lax.scan` over stacked snapshots)."""
        snaps = list(snapshots)
        if uniform and snaps:
            from .transform import _unpack, _repack
            n_pad = max(g.n_pad for g in snaps)
            e_pad = max(g.e_pad for g in snaps)
            snaps = [_repack(_unpack(g), n_pad=n_pad, e_pad=e_pad)
                     for g in snaps]
        return TemporalGraph(snapshots=snaps, tgdata=dict(tgdata or {}))

    def stacked(self) -> GraphTuple:
        """Stack uniform snapshots into one GraphTuple with a leading time
        axis on every array (for `lax.scan` over time-varying graphs)."""
        shapes = {(g.n_pad, g.e_pad) for g in self.snapshots}
        if len(shapes) != 1:
            raise ValueError("snapshots must be uniformly padded; build with "
                             "from_snapshots(..., uniform=True)")
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                      *self.snapshots)
