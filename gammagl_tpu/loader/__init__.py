"""Loader layer (reference: gammagl/loader/)."""

from gammagl_tpu.loader.dataloader import DataLoader, Collater
from gammagl_tpu.loader.node_loader import (NodeLoader, NodeNeighborLoader,
                                            filter_graph)
from gammagl_tpu.loader.link_loader import LinkLoader, LinkNeighborLoader
from gammagl_tpu.loader.graph_saint import (GraphSAINTSampler,
                                            GraphSAINTNodeSampler,
                                            GraphSAINTRandomWalkSampler)
from gammagl_tpu.loader.random_walk import random_walk, RandomWalkLoader
from gammagl_tpu.loader.neighbor_sampler import Adj, NeighborSamplerLoader
from gammagl_tpu.loader.hetero_sampler import (HeteroNeighborSampler,
                                               HeteroNeighborLoader)
from gammagl_tpu.loader.prefetch import (PrefetchLoader, prefetch_to_device, pipeline)
from gammagl_tpu.loader.epoch_cache import EpochCache

from gammagl_tpu.loader.feature_cache import (DeviceFeatureCache, ShardedFeatureStore)
from gammagl_tpu.loader.rgt_loader import (ExtractNodeLoader, ExtractLinkLoader, build_structure_batch)
from gammagl_tpu.loader.multihost import (MultiHostNodeLoader, shard_seeds,
                                          make_global_batch,
                                          pad_sampled_graph)

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
    "Adj",
    "NeighborSamplerLoader",
    "HeteroNeighborSampler",
    "HeteroNeighborLoader",
    "PrefetchLoader",
    "prefetch_to_device",
    "pipeline",
    "EpochCache",
    "ExtractNodeLoader",
    "ExtractLinkLoader",
    "build_structure_batch",
    "DeviceFeatureCache",
    "ShardedFeatureStore",
    "NeighborSampler",
    "RandomWalk",
    "MultiHostNodeLoader",
    "shard_seeds",
    "make_global_batch",
    "pad_sampled_graph",
]

# reference spellings (gammagl/loader/__init__.py)
NeighborSampler = NeighborSamplerLoader
RandomWalk = RandomWalkLoader
