"""Datasets and loaders (host-side)."""

from .datasets import (synthetic_cora, synthetic_tudataset,
                       mldataset_to_graph, planetoid_from_files)
from .loader import DataLoader

__all__ = ["synthetic_cora", "synthetic_tudataset", "mldataset_to_graph",
           "planetoid_from_files", "DataLoader"]
