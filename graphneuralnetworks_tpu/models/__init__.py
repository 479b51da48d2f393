"""Layer zoo: basics, conv, pooling, temporal, hetero (flax.nnx modules)."""

from .basic import (GNNLayer, GNNChain, WithGraph, DotDecoder, Precision)
from .conv import (GCNConv, ChebConv, cheb_lambda_max, GraphConv,
                   GATConv, GATv2Conv,
                   GatedGraphConv, EdgeConv, GINConv, NNConv, SAGEConv,
                   ResGatedGraphConv, CGConv, AGNNConv, MEGNetConv, GMMConv,
                   SGConv, TAGConv, EGNNConv, TransformerConv, DConv, MLP)
from .pool import (GlobalPool, GlobalAttentionPool, TopKPool, Set2Set,
                   topk_index)
from .heteroconv import HeteroGraphConv
from .temporalconv import (GNNRecurrence, GConvGRUCell, GConvLSTMCell,
                           DCGRUCell, EvolveGCNOCell, TGCNCell, GConvGRU,
                           GConvLSTM, DCGRU, EvolveGCNO, TGCN, A3TGCN)

__all__ = [
    "GNNLayer", "GNNChain", "WithGraph", "DotDecoder", "Precision",
    "GCNConv", "ChebConv", "cheb_lambda_max", "GraphConv", "GATConv", "GATv2Conv",
    "GatedGraphConv", "EdgeConv", "GINConv", "NNConv", "SAGEConv",
    "ResGatedGraphConv", "CGConv", "AGNNConv", "MEGNetConv", "GMMConv",
    "SGConv", "TAGConv", "EGNNConv", "TransformerConv", "DConv", "MLP",
    "GlobalPool", "GlobalAttentionPool", "TopKPool", "Set2Set",
    "topk_index",
    "HeteroGraphConv",
    "GNNRecurrence", "GConvGRUCell", "GConvLSTMCell", "DCGRUCell",
    "EvolveGCNOCell", "TGCNCell", "GConvGRU", "GConvLSTM", "DCGRU",
    "EvolveGCNO", "TGCN", "A3TGCN",
]
