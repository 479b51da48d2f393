"""Datasets and loaders (host-side)."""

from .datasets import (LargeGraphData, TemporalBrainsData,
                       TemporalSignalData, load_cora,
                       load_metrla, load_ogbn_products, mldataset_to_graph,
                       load_temporalbrains, metrla_from_files,
                       ogbn_from_files, temporalbrains_from_files,
                       planetoid_from_files, planetoid_from_raw,
                       synthetic_cora, synthetic_tudataset,
                       tudataset_from_files)
from .loader import DataLoader

__all__ = ["synthetic_cora", "synthetic_tudataset", "mldataset_to_graph",
           "planetoid_from_files", "planetoid_from_raw",
           "tudataset_from_files", "load_cora",
           "LargeGraphData", "ogbn_from_files", "load_ogbn_products",
           "TemporalSignalData", "metrla_from_files", "load_metrla",
           "TemporalBrainsData", "temporalbrains_from_files",
           "load_temporalbrains", "DataLoader"]
