"""Multi-chip execution: graph partitioning + shard_map message passing."""

from .partition import (PartitionedGraph, partition_graph,
                        partition_nodes, union_capacities)
from .shard import (halo_propagate_local, make_sharded_propagate,
                    make_sharded_apply, shard_partitioned, stack_partitions,
                    make_mesh_train_step)
from .shardgraph import ShardGraph, shard_graph_local

__all__ = ["PartitionedGraph", "partition_graph", "partition_nodes", "union_capacities", "halo_propagate_local",
           "make_sharded_propagate", "make_sharded_apply",
           "shard_partitioned", "stack_partitions", "make_mesh_train_step",
           "ShardGraph", "shard_graph_local"]
