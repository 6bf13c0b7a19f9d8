"""Loader layer (reference: gammagl/loader/)."""

from gammagl_tpu.loader.dataloader import DataLoader, Collater
from gammagl_tpu.loader.node_loader import (NodeLoader, NodeNeighborLoader,
                                            filter_graph)
from gammagl_tpu.loader.link_loader import LinkLoader, LinkNeighborLoader
from gammagl_tpu.loader.graph_saint import (GraphSAINTSampler,
                                            GraphSAINTNodeSampler,
                                            GraphSAINTRandomWalkSampler)
from gammagl_tpu.loader.random_walk import random_walk, RandomWalkLoader

__all__ = [
    "DataLoader",
    "Collater",
    "NodeLoader",
    "NodeNeighborLoader",
    "filter_graph",
    "LinkLoader",
    "LinkNeighborLoader",
    "GraphSAINTSampler",
    "GraphSAINTNodeSampler",
    "GraphSAINTRandomWalkSampler",
    "random_walk",
    "RandomWalkLoader",
]
