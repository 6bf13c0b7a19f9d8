"""Transform behavior (reference: gammagl/transforms tests)."""

import numpy as np

from gammagl_tpu.data import Graph, HeteroGraph
from gammagl_tpu.datasets import synthetic_community_graph
from gammagl_tpu.transforms import (
    Compose, NormalizeFeatures, AddSelfLoops, DropEdge,
    SVDFeatureReduction, SIGN, RandomLinkSplit, AddMetaPaths)


def test_normalize_features():
    g = Graph(x=np.array([[1.0, 3.0], [2.0, 2.0]]))
    g = NormalizeFeatures()(g)
    np.testing.assert_allclose(np.asarray(g.x).sum(1), [1.0, 1.0])


def test_add_self_loops_and_compose():
    g = synthetic_community_graph(20, 2, 4)
    e0 = g.num_edges
    g = Compose([NormalizeFeatures(), AddSelfLoops()])(g)
    assert g.num_edges == e0 + 20


def test_drop_edge():
    g = synthetic_community_graph(30, 2, 4)
    e0 = g.num_edges
    g = DropEdge(p=0.5, seed=0)(g)
    assert g.num_edges < e0


def test_svd_reduction():
    g = Graph(x=np.random.default_rng(0).random((10, 8)).astype(np.float32))
    g = SVDFeatureReduction(3)(g)
    assert g.x.shape == (10, 3)


def test_sign():
    g = synthetic_community_graph(20, 2, 4)
    g = SIGN(K=2)(g)
    assert "x1" in g and "x2" in g
    assert g.x1.shape == g.x.shape


def test_random_link_split():
    g = synthetic_community_graph(40, 2, 4, avg_degree=10)
    train, val, test = RandomLinkSplit(num_val=0.1, num_test=0.2,
                                      seed=0)(g)
    assert train.edge_label_index.shape[1] > 0
    assert (val.edge_label == 1).sum() > 0 and (val.edge_label == 0).sum() > 0
    # supervision edges of val/test are not message edges of train
    train_set = set(map(tuple, np.asarray(train.edge_index).T.tolist()))
    val_pos = np.asarray(val.edge_label_index)[:, np.asarray(
        val.edge_label) == 1]
    for e in map(tuple, val_pos.T.tolist()):
        assert e not in train_set


def test_add_metapaths():
    hg = HeteroGraph()
    hg["a"].num_nodes = 3
    hg["b"].num_nodes = 2
    hg[("a", "ab", "b")].edge_index = np.array([[0, 1, 2], [0, 1, 1]])
    hg[("b", "ba", "a")].edge_index = np.array([[0, 1], [1, 2]])
    hg = AddMetaPaths([[("a", "ab", "b"), ("b", "ba", "a")]])(hg)
    new = [et for et in hg.edge_types if "metapath" in et[1]]
    assert len(new) == 1
    ei = np.asarray(hg[new[0]].edge_index)
    # a0 -ab-> b0 -ba-> a1
    assert (ei.T == [0, 1]).all(axis=1).any()
