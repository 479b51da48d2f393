"""graphneuralnetworks_tpu — a TPU-native graph neural network framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
GraphNeuralNetworks.jl (see SURVEY.md): static-shape padded graph pytrees,
a propagate/apply_edges/aggregate_neighbors message-passing core, Pallas
scatter-matmul kernels for the SpMM/edge-softmax hot paths, a full layer zoo,
hetero/temporal graphs, neighbor sampling, and mesh-parallel execution.

Typical use::

    import graphneuralnetworks_tpu as gnn
    g = gnn.rand_graph(100, 400, nodes=x)
    y = gnn.ops.propagate(gnn.ops.copy_xj, g, "sum", xj=g.x)
"""

from . import ops
from .graph import GraphTuple, graph, from_dense_adjacency, pad_sizes
from .query import (degree, adjacency_matrix, laplacian_matrix,
                    normalized_adjacency, normalized_laplacian,
                    scaled_laplacian, laplacian_lambda_max, graph_indicator,
                    has_self_loops, has_multi_edges, is_bidirected, has_edge,
                    has_isolated_nodes, is_directed, get_graph_type, khop_adj,
                    node_features, edge_features, graph_features,
                    adjacency_list, inneighbors, outneighbors)
from .transform import (add_self_loops, remove_self_loops, remove_edges,
                        remove_multi_edges, remove_nodes, add_edges, add_nodes,
                        perturb_edges, set_edge_weight, to_bidirected,
                        to_unidirected, blockdiag, batch, unbatch, getgraph,
                        negative_sample, rand_edge_split, random_walk_pe,
                        ppr_diffusion, sort_edge_index)
from .generate import (rand_graph, knn_graph, radius_graph,
                       rand_temporal_radius_graph,
                       rand_temporal_hyperbolic_graph)
from .utils import (edge_encoding, edge_decoding, color_refinement,
                    check_num_nodes, check_num_edges, normalize_graphdata)
from .heterograph import (HeteroGraphTuple, Relation, heterograph,
                          rand_heterograph, rand_bipartite_heterograph,
                          batch_hetero, add_self_loops_hetero,
                          add_edges_hetero)
from .temporal import TemporalGraph
from .datastore import DataStore
from .sampling import sample_neighbors, induced_subgraph, NeighborLoader
from .device_sampler import DeviceSampler, apply_blocks
from .operators import intersect_graphs
from .convert import (from_adjacency_list, to_scipy_sparse,
                      from_scipy_sparse, to_dense_adjacency)
from .checkpoint import save_checkpoint, restore_checkpoint, latest_step
from . import models
from .models.pool import topk_index
from . import data
from . import training
from . import parallel
from . import profiling

__version__ = "0.1.0"
