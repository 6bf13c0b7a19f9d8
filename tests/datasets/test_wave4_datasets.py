"""Wave-4 dataset lifecycles against synthetic raw files (no network),
mirroring the reference's shape-level smoke tests (tests/datasets/)."""

import json
import os
import os.path as osp
import pickle

import numpy as np
import pytest

from gammagl_tpu.datasets import (ACM4DHN, ACM4Rohe, ADDataset, ModelNet40,
                                  NGSIM_US_101, ShapeNet)


def test_modelnet40(tmp_path):
    import h5py
    root = str(tmp_path)
    raw = osp.join(root, "raw")
    os.makedirs(raw)
    rng = np.random.default_rng(0)
    for split, n in (("train", 6), ("test", 3)):
        with h5py.File(osp.join(raw, f"ply_data_{split}0.h5"), "w") as f:
            f["data"] = rng.normal(size=(n, 64, 3)).astype(np.float32)
            f["label"] = rng.integers(0, 40, (n, 1)).astype(np.int64)
    ds = ModelNet40(root=root, split="train", num_points=32)
    assert len(ds) == 6
    g = ds[0]
    assert g.x.shape == (32, 3)
    te = ModelNet40(root=root, split="test", num_points=32)
    assert len(te) == 3


def test_shapenet(tmp_path):
    root = str(tmp_path)
    raw = osp.join(root, "raw")
    cat = ShapeNet.category_ids["Airplane"]
    for cid in ShapeNet.category_ids.values():
        os.makedirs(osp.join(raw, cid))
    os.makedirs(osp.join(raw, "train_test_split"))
    rng = np.random.default_rng(1)
    names = {}
    for split, cnt in (("train", 3), ("val", 1), ("test", 2)):
        files = []
        for i in range(cnt):
            fname = f"{split}{i}"
            pts = rng.normal(size=(50, 6)).astype(np.float32)
            lab = rng.integers(0, 4, (50, 1)).astype(np.float32)
            np.savetxt(osp.join(raw, cat, fname + ".txt"),
                       np.hstack([pts, lab]))
            files.append(f"shape_data/{cat}/{fname}")
        names[split] = files
        with open(osp.join(raw, "train_test_split",
                           f"shuffled_{split}_file_list.json"), "w") as f:
            json.dump(files, f)
    ds = ShapeNet(root=root, categories="Airplane", split="trainval")
    assert len(ds) == 4
    g = ds[0]
    assert g.pos.shape == (50, 3) and g.x.shape == (50, 3)
    assert g.y.shape == (50,)
    test = ShapeNet(root=root, categories="Airplane", split="test")
    assert len(test) == 2


def test_ngsim(tmp_path):
    root = str(tmp_path)
    proc = osp.join(root, "ngsim", "processed", "train")
    os.makedirs(proc)
    os.makedirs(osp.join(root, "ngsim", "raw", "train"))
    # fake the raw zip marker so download is skipped
    open(osp.join(root, "ngsim", "raw", "train", "train.zip"), "wb").close()
    rng = np.random.default_rng(2)
    for i in range(3):
        item = {"x": rng.normal(size=(5, 10, 2)).astype(np.float32),
                "edge_attr": rng.normal(size=(2, 7)).astype(np.float32),
                "edge_type": rng.integers(0, 3, (2, 7))}
        with open(osp.join(proc, f"sample_{i}.pkl"), "wb") as f:
            pickle.dump(item, f)
    ds = NGSIM_US_101(root=root, name="train")
    assert len(ds) == 3
    g = ds[0]
    assert g.edge_attr.shape == (7, 2)  # transposed like the reference
    assert g.x.shape == (5, 10, 2)


def test_acm4dhn(tmp_path):
    root = str(tmp_path)
    raw = osp.join(root, "raw")
    os.makedirs(raw)
    rng = np.random.default_rng(3)
    lines = [f"M{rng.integers(0, 20)} A{rng.integers(0, 30)}"
             for _ in range(50)]
    with open(osp.join(raw, "MA.txt"), "w") as f:
        f.write("\n".join(lines))
    ds = ACM4DHN(root=root, test_ratio=0.3)
    g = ds[0]
    full = g[("M", "MA", "A")].edge_index
    assert full.shape == (2, 50)
    assert np.all(full[1] < 0)  # actor ids encoded as -id-1
    tr = g["train"][("M", "MA", "A")].edge_index
    va = g["val"][("M", "MA", "A")].edge_index
    te = g["test"][("M", "MA", "A")].edge_index
    assert tr.shape[1] + va.shape[1] + te.shape[1] == 50
    assert tr.shape[1] == 20  # 1 - 2*0.3


def test_acm4rohe(tmp_path):
    from scipy import io as sio
    import scipy.sparse as sp
    root = str(tmp_path)
    raw = osp.join(root, "raw")
    os.makedirs(raw)
    rng = np.random.default_rng(4)
    n_p, n_a, n_f, n_t, n_c = 40, 15, 8, 12, 14
    mat = {
        "PvsL": sp.random(n_p, n_f, 0.2, random_state=1, format="csr"),
        "PvsA": sp.random(n_p, n_a, 0.2, random_state=2, format="csr"),
        "PvsT": sp.random(n_p, n_t, 0.3, random_state=3, format="csr"),
        "PvsC": sp.csr_matrix(
            (np.ones(n_p), (np.arange(n_p),
                            rng.choice([0, 1, 9, 10, 13], n_p))),
            shape=(n_p, n_c)),
    }
    sio.savemat(osp.join(raw, "ACM.mat"), mat)
    ds = ACM4Rohe(root=root)
    g = ds[0]
    assert g["paper"].x.shape[1] == n_t
    assert set(np.unique(g["paper"].y)) <= {0, 1, 2}
    masks = (np.asarray(g["paper"].train_mask)
             | np.asarray(g["paper"].val_mask)
             | np.asarray(g["paper"].test_mask))
    assert masks.all()
    assert ("paper", "pa", "author") in [tuple(k) for k in
                                         g.edge_types]


def test_ad_dataset(tmp_path):
    root = str(tmp_path)
    raw = osp.join(root, "books", "raw")
    os.makedirs(raw)
    rng = np.random.default_rng(5)
    np.savez(osp.join(raw, "books.npz"),
             edge_index=rng.integers(0, 20, (2, 60)),
             x=rng.normal(size=(20, 8)).astype(np.float32),
             y=rng.integers(0, 2, 20))
    ds = ADDataset(root=root, name="books")
    g = ds[0]
    assert g.x.shape == (20, 8)
    assert g.edge_index.shape == (2, 60)
    assert g.y.shape == (20,)
