"""OgbNodeDataset against synthesized fixtures of both OGB on-disk
layouts (csv.gz like ogbn-arxiv, npy fast path like a staged
papers100M shard). Reference protocol: profiler/mpops/complete_test/
README.md (ogbn-arxiv), SURVEY.md §2.4."""

import gzip
import json
import os
import os.path as osp

import numpy as np
import pytest

from gammagl_tpu.datasets import OgbNodeDataset


def _write_csv_gz(path, arr, fmt):
    with gzip.open(path, "wt") as f:
        for row in np.atleast_2d(arr):
            f.write(",".join(fmt % v for v in np.atleast_1d(row)) + "\n")


@pytest.fixture
def arxiv_fixture(tmp_path):
    root = str(tmp_path)
    raw = osp.join(root, "ogbn_arxiv", "raw")
    split = osp.join(root, "ogbn_arxiv", "split", "time")
    os.makedirs(raw)
    os.makedirs(split)
    rng = np.random.default_rng(0)
    n, e, f = 30, 80, 8
    x = rng.normal(size=(n, f)).astype(np.float32)
    ei = rng.integers(0, n, (e, 2))
    y = rng.integers(0, 4, n)
    _write_csv_gz(osp.join(raw, "node-feat.csv.gz"), x, "%.6f")
    _write_csv_gz(osp.join(raw, "edge.csv.gz"), ei, "%d")
    _write_csv_gz(osp.join(raw, "node-label.csv.gz"),
                  y[:, None], "%d")
    idx = rng.permutation(n)
    for name, sl in (("train", idx[:20]), ("valid", idx[20:25]),
                     ("test", idx[25:])):
        _write_csv_gz(osp.join(split, f"{name}.csv.gz"),
                      sl[:, None], "%d")
    return root, x, ei.T, y, idx


def test_csv_layout(arxiv_fixture):
    root, x, ei, y, idx = arxiv_fixture
    ds = OgbNodeDataset(root, "ogbn-arxiv")
    g = ds[0]
    assert g.num_nodes == 30
    np.testing.assert_allclose(np.asarray(g.x), x, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(g.edge_index), ei)
    np.testing.assert_array_equal(np.asarray(g.y), y)
    assert ds.num_classes == 4
    np.testing.assert_array_equal(np.sort(g.train_idx),
                                  np.sort(idx[:20]))
    assert g.train_mask.sum() == 20 and g.test_mask.sum() == 5
    # csv was converted once to the mmap npy fast path
    assert osp.exists(osp.join(root, "ogbn_arxiv", "raw",
                               "node_feat.npy"))
    # second open reuses the processed marker (no re-parse)
    meta = json.load(open(ds.processed_paths[0]))
    assert meta["layout"] == "npy"
    g2 = OgbNodeDataset(root, "ogbn-arxiv")[0]
    assert g2.num_nodes == 30


def test_npy_layout_mmap(tmp_path):
    root = str(tmp_path)
    raw = osp.join(root, "ogbn_papers100M", "raw")
    split = osp.join(root, "ogbn_papers100M", "split", "time")
    os.makedirs(raw)
    os.makedirs(split)
    rng = np.random.default_rng(1)
    n, e = 50, 200
    np.save(osp.join(raw, "node_feat.npy"),
            rng.normal(size=(n, 16)).astype(np.float16))
    np.save(osp.join(raw, "edge_index.npy"),
            rng.integers(0, n, (2, e)).astype(np.int32))
    lbl = rng.integers(0, 3, n).astype(np.float64)
    lbl[10] = np.nan  # unlabeled nodes are NaN in OGB papers100M
    np.save(osp.join(raw, "node_label.npy"), lbl)
    np.save(osp.join(split, "train.npy"), np.arange(0, 30))
    np.save(osp.join(split, "test.npy"), np.arange(40, 50))
    ds = OgbNodeDataset(root, "ogbn-papers100M")
    g = ds[0]
    assert g.num_nodes == 50 and g.num_edges == 200
    assert isinstance(np.asarray(g.x[:4]), np.ndarray)
    assert int(np.asarray(g.y)[10]) == -1  # NaN label -> -1
    assert g.train_mask.sum() == 30
    # features stay memory-mapped until sliced
    assert isinstance(g.x, np.memmap)


def test_undirected_flag(arxiv_fixture):
    root, _, ei, _, _ = arxiv_fixture
    g = OgbNodeDataset(root, "ogbn-arxiv", to_undirected=True)[0]
    assert g.num_edges == 2 * ei.shape[1]


def test_npz_layout(tmp_path):
    # OGB's own large-graph archive format: raw/data.npz with
    # node_feat/edge_index members + node-label.npz (ogbn-products
    # ships this way)
    root = str(tmp_path)
    raw = osp.join(root, "ogbn_products", "raw")
    split = osp.join(root, "ogbn_products", "split", "sales_ranking")
    os.makedirs(raw)
    os.makedirs(split)
    rng = np.random.default_rng(2)
    n, e, f = 40, 120, 12
    x = rng.normal(size=(n, f)).astype(np.float32)
    ei = rng.integers(0, n, (2, e)).astype(np.int64)
    y = rng.integers(0, 5, n).astype(np.int64)
    np.savez(osp.join(raw, "data.npz"), node_feat=x, edge_index=ei)
    np.savez(osp.join(raw, "node-label.npz"), node_label=y[:, None])
    np.save(osp.join(split, "train.npy"), np.arange(0, 25))
    np.save(osp.join(split, "valid.npy"), np.arange(25, 32))
    np.save(osp.join(split, "test.npy"), np.arange(32, 40))
    ds = OgbNodeDataset(root, "ogbn-products")
    g = ds[0]
    assert g.num_nodes == n and g.num_edges == e
    np.testing.assert_allclose(np.asarray(g.x), x, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(g.edge_index), ei)
    np.testing.assert_array_equal(np.asarray(g.y), y)
    assert ds.num_classes == 5
    assert g.val_mask.sum() == 7 and g.test_mask.sum() == 8


def test_fixture_to_gcn_step(arxiv_fixture):
    # the full staging path end-to-end: OGB fixture -> OgbNodeDataset
    # -> Graph -> one jitted GCN train step, so the first REAL staging
    # attempt is not the first exercise of this pipeline
    import jax
    import jax.numpy as jnp
    import optax

    from gammagl_tpu.models import GCNModel

    root, *_ = arxiv_fixture
    ds = OgbNodeDataset(root, "ogbn-arxiv", to_undirected=True)
    g = ds[0]
    x = jnp.asarray(np.asarray(g.x))
    ei = jnp.asarray(np.asarray(g.edge_index))
    y = jnp.asarray(np.asarray(g.y))
    mask = jnp.asarray(g.train_mask)
    model = GCNModel(hidden_dim=8, num_class=ds.num_classes)
    params = model.init(jax.random.key(0), x, ei,
                        num_nodes=g.num_nodes)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, x, ei, num_nodes=g.num_nodes)
            ls = optax.softmax_cross_entropy_with_integer_labels(
                logits, y)
            m = mask.astype(jnp.float32)
            return (ls * m).sum() / m.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
