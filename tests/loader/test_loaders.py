"""Loader / sampler behavior (reference: tests/loader/)."""

import numpy as np
import pytest

from gammagl_tpu.data import Graph
from gammagl_tpu.datasets import synthetic_community_graph
from gammagl_tpu.loader import (DataLoader, NodeNeighborLoader,
                                LinkNeighborLoader, GraphSAINTNodeSampler,
                                GraphSAINTRandomWalkSampler, random_walk,
                                RandomWalkLoader)
from gammagl_tpu.sampler import NeighborSampler, sample_neighbors_padded


def _graphs(k=7):
    return [synthetic_community_graph(20 + i, 2, 6, seed=i)
            for i in range(k)]


def test_dataloader_batching():
    gs = _graphs()
    loader = DataLoader(gs, batch_size=3)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0].num_graphs == 3
    assert batches[0].num_nodes == sum(g.num_nodes for g in gs[:3])
    # drop_last
    assert len(list(DataLoader(gs, batch_size=3, drop_last=True))) == 2


def test_dataloader_padded():
    gs = _graphs()
    loader = DataLoader(gs, batch_size=3, pad=True)
    b = next(iter(loader))
    assert "node_mask" in b
    assert b.x.shape[0] % 64 == 0


def test_neighbor_sampler_fanout():
    g = synthetic_community_graph(60, 2, 4, avg_degree=8, seed=0)
    samp = NeighborSampler(np.asarray(g.edge_index), g.num_nodes, [3, 2],
                           seed=0)
    out = samp.sample_from_nodes([0, 1, 2])
    assert out.batch_size == 3
    assert (out.node[:3] == [0, 1, 2]).all()
    # every edge endpoint is a valid local id
    assert out.row.max() < len(out.node)
    assert out.col.max() < len(out.node)
    # fanout bound: seeds have at most 3 in-edges each in hop 1
    assert out.num_sampled_edges[0] <= 3 * 3
    # global edge ids map back to real edges
    ei = np.asarray(g.edge_index)
    for r, c, e in zip(out.row, out.col, out.edge):
        assert ei[0, e] == out.node[r]
        assert ei[1, e] == out.node[c]


def test_neighbor_sampler_full_neighborhood():
    g = synthetic_community_graph(30, 2, 4, seed=1)
    samp = NeighborSampler(np.asarray(g.edge_index), g.num_nodes, [-1],
                           seed=0)
    out = samp.sample_from_nodes([5])
    ei = np.asarray(g.edge_index)
    true_in = (ei[1] == 5).sum()
    assert out.num_sampled_edges[0] == true_in


def test_padded_sampling():
    g = synthetic_community_graph(60, 2, 4, seed=0)
    samp = NeighborSampler(np.asarray(g.edge_index), g.num_nodes, [3, 2],
                           seed=0)
    out = sample_neighbors_padded(samp, [0, 1], node_budget=64,
                                  edge_budget=128)
    assert out["n_id"].shape == (64,)
    assert out["edge_index"].shape == (2, 128)
    assert out["node_mask"].sum() < 64
    # padded edges point at the OOB local id
    assert (out["edge_index"][:, out["edge_mask"].sum():] == 64).all()


def test_node_neighbor_loader():
    g = synthetic_community_graph(50, 2, 4, seed=0)
    loader = NodeNeighborLoader(g, [3], batch_size=10, seed=0)
    batches = list(loader)
    assert len(batches) == 5
    b = batches[0]
    assert b.batch_size == 10
    assert b.x.shape[0] == len(b.n_id)
    # seed features come first
    np.testing.assert_allclose(np.asarray(b.x)[:10],
                               np.asarray(g.x)[b.n_id[:10]])


def test_link_neighbor_loader():
    g = synthetic_community_graph(40, 2, 4, seed=0)
    loader = LinkNeighborLoader(g, [2], batch_size=8,
                                neg_sampling_ratio=1.0, seed=0)
    b = next(iter(loader))
    assert b.edge_label_index.shape[1] == 16
    assert (b.edge_label[:8] == 1).all() and (b.edge_label[8:] == 0).all()


def test_graph_saint():
    g = synthetic_community_graph(60, 2, 4, seed=0)
    sub = next(iter(GraphSAINTNodeSampler(g, batch_size=20, num_steps=2,
                                          seed=0)))
    assert sub.num_nodes <= 20
    assert sub.x.shape[0] == sub.num_nodes
    sub = next(iter(GraphSAINTRandomWalkSampler(
        g, batch_size=5, walk_length=3, num_steps=1, seed=0)))
    assert sub.num_nodes >= 5


def test_random_walk():
    ei = np.array([[0, 1, 2, 3], [1, 2, 3, 0]])  # cycle
    walks = random_walk(ei, 4, [0, 1], walk_length=4,
                        rng=np.random.default_rng(0))
    assert walks.shape == (2, 5)
    np.testing.assert_array_equal(walks[0], [0, 1, 2, 3, 0])

    loader = RandomWalkLoader(ei, 4, batch_size=2, walk_length=3,
                              seed=0)
    pos, neg = next(iter(loader))
    assert pos.shape == (2, 4)
    assert neg.shape == (2, 1, 4)
