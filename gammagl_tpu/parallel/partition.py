"""Graph partitioning for multi-chip full-graph training.

The graph-world analog of context parallelism (SURVEY.md section 5): edges
are partitioned across devices; each device owns a contiguous destination-row
range plus the full (replicated or gathered) source features. Aggregation is
local SpMM + a psum/reduce_scatter across the edge-parallel axis.

Partition strategies:
  * `partition_edges_by_dst` -- 1D edge cut: device d owns edges whose dst
    falls in its row block; dst-local aggregates need no cross-device reduce,
    only the gather of src features crosses chips (done as replication at
    small scale, halo exchange at large scale).
  * `partition_edges_uniform` -- balanced edge count regardless of dst; local
    partial aggregates are summed with `psum` (scatter-add over ICI).
"""

from typing import NamedTuple

import numpy as np

__all__ = ["EdgePartition", "partition_edges_by_dst",
           "partition_edges_uniform"]


class EdgePartition(NamedTuple):
    """Padded per-device edge shards, stackable to (P, 2, E_shard)."""

    edge_index: np.ndarray   # (P, 2, E_shard) padded with num_nodes
    edge_weight: np.ndarray  # (P, E_shard) padded with 0 (or None)
    row_start: np.ndarray    # (P,) first dst row owned (dst strategy only)
    num_parts: int
    num_nodes: int


def _pad_shards(shards, wshards, num_nodes, num_parts):
    e_max = max(s.shape[1] for s in shards)
    # round up to 128 for TPU-friendly lane alignment
    e_max = -(-e_max // 128) * 128
    ei = np.full((num_parts, 2, e_max), num_nodes, dtype=np.int32)
    w = np.zeros((num_parts, e_max), dtype=np.float32)
    for p, s in enumerate(shards):
        ei[p, :, :s.shape[1]] = s
        if wshards[p] is not None:
            w[p, :s.shape[1]] = wshards[p]
        else:
            w[p, :s.shape[1]] = 1.0
    return ei, w


def partition_edges_by_dst(edge_index, num_nodes, num_parts,
                           edge_weight=None):
    """Edge cut by destination row blocks of size ceil(N / P)."""
    ei = np.asarray(edge_index)
    w = None if edge_weight is None else np.asarray(edge_weight)
    rows_per = -(-num_nodes // num_parts)
    owner = np.minimum(ei[1] // rows_per, num_parts - 1)
    shards, wshards, starts = [], [], []
    for p in range(num_parts):
        mask = owner == p
        shards.append(ei[:, mask])
        wshards.append(None if w is None else w[mask])
        starts.append(p * rows_per)
    ei_p, w_p = _pad_shards(shards, wshards, num_nodes, num_parts)
    return EdgePartition(ei_p, w_p, np.asarray(starts, np.int32),
                         num_parts, num_nodes)


def partition_edges_uniform(edge_index, num_nodes, num_parts,
                            edge_weight=None):
    """Balanced edge-count shards (dst arbitrary; requires cross-device sum)."""
    ei = np.asarray(edge_index)
    w = None if edge_weight is None else np.asarray(edge_weight)
    E = ei.shape[1]
    bounds = np.linspace(0, E, num_parts + 1).astype(np.int64)
    shards, wshards = [], []
    for p in range(num_parts):
        sl = slice(bounds[p], bounds[p + 1])
        shards.append(ei[:, sl])
        wshards.append(None if w is None else w[sl])
    ei_p, w_p = _pad_shards(shards, wshards, num_nodes, num_parts)
    return EdgePartition(ei_p, w_p, np.zeros(num_parts, np.int32),
                         num_parts, num_nodes)
