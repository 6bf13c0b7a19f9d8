"""Dataset lifecycle tests using fabricated raw files (no network)."""

import os
import os.path as osp
import pickle

import numpy as np
import pytest

from gammagl_tpu.data import InMemoryDataset
from gammagl_tpu.datasets import (Planetoid, TUDataset,
                                  StochasticBlockModelDataset,
                                  synthetic_community_graph)


def _make_planetoid_raw(raw_dir, name="cora", n_lab=40, n_test=20, f=8,
                        c=3):
    """Fabricate the 8 Planetoid files (scipy matrices + adjacency dict)."""
    import scipy.sparse as sp
    os.makedirs(raw_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    # the reader hardcodes 500 validation nodes after the labeled block
    n_allx = n_lab + 520
    n = n_allx + n_test

    def onehot(k):
        y = np.zeros((k, c))
        y[np.arange(k), rng.integers(0, c, k)] = 1
        return y

    data = {
        "x": sp.csr_matrix(rng.random((n_lab, f))),
        "tx": sp.csr_matrix(rng.random((n_test, f))),
        "allx": sp.csr_matrix(rng.random((n_allx, f))),
        "y": onehot(n_lab),
        "ty": onehot(n_test),
        "ally": onehot(n_allx),
        "graph": {i: [int(v) for v in rng.integers(0, n, 3)]
                  for i in range(n)},
    }
    for k, v in data.items():
        with open(osp.join(raw_dir, f"ind.{name}.{k}"), "wb") as fh:
            pickle.dump(v, fh)
    test_idx = np.arange(n_allx, n)
    rng.shuffle(test_idx)
    with open(osp.join(raw_dir, f"ind.{name}.test.index"), "w") as fh:
        fh.write("\n".join(str(i) for i in test_idx))
    return n, f, c


def test_planetoid_lifecycle(tmp_path):
    root = str(tmp_path)
    n, f, c = _make_planetoid_raw(osp.join(root, "cora", "raw"))
    ds = Planetoid(root=root, name="cora")
    g = ds[0]
    assert g.num_nodes == n
    assert g.x.shape == (n, f)
    assert np.asarray(g.train_mask).sum() == 40
    assert np.asarray(g.test_mask).sum() == 20
    assert ds.num_classes == c
    # processed cache reload
    ds2 = Planetoid(root=root, name="cora")
    np.testing.assert_allclose(np.asarray(ds2[0].x), np.asarray(g.x))


def _make_tu_raw(raw_dir, name="FAKE"):
    os.makedirs(raw_dir, exist_ok=True)
    # 2 graphs: triangle (3 nodes) + edge pair (2 nodes)
    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1), (4, 5), (5, 4)]
    with open(osp.join(raw_dir, f"{name}_A.txt"), "w") as f:
        f.write("\n".join(f"{a}, {b}" for a, b in edges))
    with open(osp.join(raw_dir, f"{name}_graph_indicator.txt"), "w") as f:
        f.write("1\n1\n1\n2\n2")
    with open(osp.join(raw_dir, f"{name}_graph_labels.txt"), "w") as f:
        f.write("1\n-1")
    with open(osp.join(raw_dir, f"{name}_node_labels.txt"), "w") as f:
        f.write("0\n1\n0\n1\n0")


def test_tu_dataset_lifecycle(tmp_path):
    root = str(tmp_path)
    _make_tu_raw(osp.join(root, "FAKE", "raw"))
    ds = TUDataset(root=root, name="FAKE")
    assert len(ds) == 2
    g0, g1 = ds[0], ds[1]
    assert g0.num_nodes == 3 and g0.num_edges == 6
    assert g1.num_nodes == 2 and g1.num_edges == 2
    assert int(np.asarray(g1.edge_index).max()) <= 1  # relabeled
    assert g0.x.shape == (3, 2)  # one-hot node labels
    assert ds.num_classes == 2


def test_sbm_dataset():
    ds = StochasticBlockModelDataset(num_nodes=80, num_classes=4,
                                     feat_dim=8, force_reload=True)
    g = ds[0]
    assert g.num_nodes == 80
    assert set(np.unique(np.asarray(g.y))) == {0, 1, 2, 3}
    assert np.asarray(g.train_mask).sum() > 0


def test_dataset_indexing_shuffle():
    ds = StochasticBlockModelDataset(num_nodes=80, feat_dim=8)
    assert len(ds) == 1
    assert ds.num_node_features == 8


def test_synthetic_graph_masks_disjoint():
    g = synthetic_community_graph(100, 4, 8)
    tr = np.asarray(g.train_mask)
    va = np.asarray(g.val_mask)
    te = np.asarray(g.test_mask)
    assert not (tr & va).any() and not (tr & te).any()
    assert (tr | va | te).all()


def test_custom_dataset():
    from gammagl_tpu.datasets import CustomDataset
    gs = [synthetic_community_graph(10 + i, 2, 4, seed=i) for i in range(3)]
    ds = CustomDataset(gs)
    assert len(ds) == 3
    assert ds[1].num_nodes == 11
