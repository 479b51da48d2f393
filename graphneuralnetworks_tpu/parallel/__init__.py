"""Multi-chip execution: graph partitioning + shard_map message passing."""

from .partition import PartitionedGraph, partition_graph
from .shard import (halo_propagate_local, make_sharded_propagate,
                    shard_partitioned)

__all__ = ["PartitionedGraph", "partition_graph", "halo_propagate_local",
           "make_sharded_propagate", "shard_partitioned"]
