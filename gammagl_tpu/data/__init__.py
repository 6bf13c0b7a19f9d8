"""Graph data structures and dataset lifecycle."""

from gammagl_tpu.data.graph import Graph, BaseGraph
from gammagl_tpu.data.heterograph import HeteroGraph
from gammagl_tpu.data.batch import BatchGraph
from gammagl_tpu.data.dataset import Dataset, InMemoryDataset
from gammagl_tpu.data.padding import pad_graph, size_bucket, pad_to
from gammagl_tpu.data.download import (download_url, extract_zip,
                                       extract_tar, extract_gz)
from gammagl_tpu.data.feature_store import (TensorAttr, FeatureStore,
                                            InMemoryFeatureStore)
from gammagl_tpu.data.graph_store import (EdgeLayout, EdgeAttr, GraphStore,
                                          InMemoryGraphStore)
from gammagl_tpu.data.config import get_config, get_dataset_root
from gammagl_tpu.data.edge_index import EdgeIndex

__all__ = [
    "Graph",
    "BaseGraph",
    "HeteroGraph",
    "BatchGraph",
    "Dataset",
    "InMemoryDataset",
    "pad_graph",
    "size_bucket",
    "pad_to",
    "download_url",
    "extract_zip",
    "extract_tar",
    "extract_gz",
    "TensorAttr",
    "FeatureStore",
    "InMemoryFeatureStore",
    "EdgeLayout",
    "EdgeAttr",
    "GraphStore",
    "InMemoryGraphStore",
    "get_config",
    "get_dataset_root",
    "EdgeIndex",
]
