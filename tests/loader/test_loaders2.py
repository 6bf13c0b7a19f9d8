"""Legacy bipartite sampler + hetero loader + prefetch + stores tests."""

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.data import (HeteroGraph, InMemoryFeatureStore,
                              InMemoryGraphStore, EdgeLayout)
from gammagl_tpu.datasets import synthetic_community_graph
from gammagl_tpu.loader import (NeighborSamplerLoader, HeteroNeighborLoader,
                                PrefetchLoader)
from gammagl_tpu.models import GraphSAGESampleModel
from gammagl_tpu.sparse import SparseGraph, CSRAdj


def test_neighbor_sampler_loader_with_sage():
    g = synthetic_community_graph(60, 2, 8, avg_degree=8, seed=0)
    loader = NeighborSamplerLoader(np.asarray(g.edge_index),
                                   node_idx=np.arange(60),
                                   sample_lists=[5, 3], batch_size=16,
                                   seed=0)
    bs, n_id, adjs = next(iter(loader))
    assert bs == 16
    assert len(adjs) == 2
    # outermost hop first: sizes shrink toward seeds
    assert adjs[0].size[1] >= adjs[1].size[1] == 16

    # feed through the sampled GraphSAGE model
    x = jnp.asarray(np.asarray(g.x)[n_id])
    model_adjs = [(jnp.asarray(a.edge_index), a.size[1]) for a in adjs]
    model = GraphSAGESampleModel(hidden_dim=8, num_class=2, num_layers=2,
                                 drop_rate=0.0)
    params = model.init(jax.random.PRNGKey(0), x, model_adjs)
    out = model.apply(params, x, model_adjs)
    assert out.shape == (16, 2)


def test_hetero_neighbor_loader():
    hg = HeteroGraph()
    rng = np.random.default_rng(0)
    hg["paper"].x = rng.normal(size=(30, 4)).astype(np.float32)
    hg["author"].x = rng.normal(size=(20, 4)).astype(np.float32)
    hg[("author", "writes", "paper")].edge_index = np.stack(
        [rng.integers(0, 20, 60), rng.integers(0, 30, 60)])
    hg[("paper", "cites", "paper")].edge_index = np.stack(
        [rng.integers(0, 30, 50), rng.integers(0, 30, 50)])
    loader = HeteroNeighborLoader(hg, [3, 2],
                                  input_nodes=("paper", np.arange(30)),
                                  batch_size=10, seed=0)
    sub = next(iter(loader))
    assert sub["paper"].batch_size == 10
    assert sub["paper"].x.shape[0] == sub["paper"].num_nodes
    for et in sub.edge_types:
        ei = np.asarray(sub[et].edge_index)
        assert ei[0].max() < (sub[et[0]].num_nodes or 1)


def test_prefetch_loader():
    g = synthetic_community_graph(30, 2, 4, seed=0)
    batches = [{"x": np.ones((4, 2)) * i} for i in range(5)]
    out = list(PrefetchLoader(batches, size=2))
    assert len(out) == 5
    assert float(out[3]["x"][0, 0]) == 3.0
    assert isinstance(out[0]["x"], jax.Array)


def test_sparse_graph_formats():
    ei = np.array([[2, 0, 1, 1], [0, 1, 2, 0]])
    sg = SparseGraph.from_edge_index(ei, sparse_sizes=(3, 3))
    rowptr, col, perm = sg.csr()
    np.testing.assert_array_equal(rowptr, [0, 1, 3, 4])
    colptr, row, perm_c = sg.csc()
    np.testing.assert_array_equal(colptr, [0, 2, 3, 4])
    t = sg.t()
    assert t.sparse_sizes() == (3, 3)
    block, n_id = sg.sample_adj([0, 1], num_neighbors=2,
                                rng=np.random.default_rng(0))
    assert (n_id[:2] == [0, 1]).all()
    assert block.sparse_sizes()[1] == 2

    adj = CSRAdj.from_edges(ei[0], ei[1])
    np.testing.assert_array_equal(adj.degree(), [1, 2, 1])


def test_feature_and_graph_store():
    fs = InMemoryFeatureStore()
    fs.put_tensor(np.arange(12).reshape(4, 3), "paper", "x")
    out = fs.get_tensor("paper", "x", index=[1, 2])
    np.testing.assert_array_equal(out, [[3, 4, 5], [6, 7, 8]])
    fs["paper", "y"] = np.ones(4)
    assert len(fs.get_all_tensor_attrs()) == 2
    assert fs.remove_tensor("paper", "y")

    gs = InMemoryGraphStore()
    ei = np.array([[0, 1, 2], [1, 2, 0]])
    gs.put_edge_index(ei, "e", layout="coo", size=(3, 3))
    rowptr, col = gs.get_edge_index("e", layout=EdgeLayout.CSR)
    np.testing.assert_array_equal(rowptr, [0, 1, 2, 3])
    coo = gs.get_edge_index("e", layout="coo")
    np.testing.assert_array_equal(coo, ei)


def test_hetero_full_neighborhood_sampling():
    """fanout=-1 (full neighborhood) must not overflow the native caps
    (regression: the old caps treated negative fanouts as 0), and the
    native and numpy samplers must agree on per-type node sets."""
    hg = HeteroGraph()
    rng = np.random.default_rng(1)
    hg["paper"].x = rng.normal(size=(40, 4)).astype(np.float32)
    hg["author"].x = rng.normal(size=(25, 4)).astype(np.float32)
    hg[("author", "writes", "paper")].edge_index = np.stack(
        [rng.integers(0, 25, 120), rng.integers(0, 40, 120)])
    hg[("paper", "cites", "paper")].edge_index = np.stack(
        [rng.integers(0, 40, 100), rng.integers(0, 40, 100)])
    from gammagl_tpu.loader.hetero_sampler import HeteroNeighborSampler
    outs = {}
    for use_ext in (True, False):
        s = HeteroNeighborSampler(hg, [-1, -1], seed=0, use_ext=use_ext)
        node_d, row_d, col_d, eid_d, bs = s.sample_from_nodes(
            {"paper": np.arange(12)})
        outs[use_ext] = (node_d, eid_d)
    if outs[True][0] is not None and outs[False][0] is not None:
        for nt in ("paper", "author"):
            # full neighborhood is deterministic: same node SETS
            np.testing.assert_array_equal(
                np.sort(np.unique(outs[True][0][nt])),
                np.sort(np.unique(outs[False][0][nt])))
        for et in outs[True][1]:
            np.testing.assert_array_equal(
                np.sort(np.asarray(outs[True][1][et])),
                np.sort(np.asarray(outs[False][1][et])))


def test_hetero_sampling_featureless_node_type():
    """Node types without x/num_nodes must get their size inferred from
    edges (code-review regression: caps treated them as empty -> native
    path raised 'capacity exceeded')."""
    hg = HeteroGraph()
    rng = np.random.default_rng(2)
    hg["paper"].x = rng.normal(size=(30, 4)).astype(np.float32)
    # 'author' has NO features and NO num_nodes — only edges
    hg[("author", "writes", "paper")].edge_index = np.stack(
        [rng.integers(0, 22, 80), rng.integers(0, 30, 80)])
    from gammagl_tpu.loader.hetero_sampler import HeteroNeighborSampler
    s = HeteroNeighborSampler(hg, [-1], seed=0, use_ext=True)
    node_d, row_d, col_d, eid_d, bs = s.sample_from_nodes(
        {"paper": np.arange(10)})
    assert len(node_d["author"]) > 0
