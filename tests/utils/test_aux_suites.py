"""vgae_pre split, UniFews logging suite, and device feature caches."""

import numpy as np
import jax
import pytest

from gammagl_tpu.loader import DeviceFeatureCache, ShardedFeatureStore
from gammagl_tpu.transforms import mask_test_edges, normalize_adj_for_vgae
from gammagl_tpu.utils import (F1Calculator, LayerNumLogger, ModelLogger,
                               Stopwatch, UniFewsLogger)


def _ring(n):
    src = np.arange(n)
    dst = (src + 1) % n
    return np.concatenate([np.stack([src, dst]),
                           np.stack([dst, src])], axis=1)


def test_mask_test_edges_partition():
    n = 60
    ei = _ring(n)
    out = mask_test_edges(ei, n, val_frac=0.1, test_frac=0.2, seed=0)
    e = n  # unique undirected edges in the ring
    n_val, n_test = int(e * 0.1), int(e * 0.2)
    assert out["val_edges"].shape == (n_val, 2)
    assert out["test_edges"].shape == (n_test, 2)
    assert out["val_edges_false"].shape == (n_val, 2)
    assert out["train_edge_index"].shape[1] == 2 * (e - n_val - n_test)
    # negatives are truly non-edges and not self-loops
    edges = {(int(i), int(j)) for i, j in
             np.concatenate([out["val_edges"], out["test_edges"]])}
    real = {(int(a), int(b)) for a, b in ei.T}
    for i, j in np.concatenate([out["val_edges_false"],
                                out["test_edges_false"]]):
        assert (i, j) not in real and (j, i) not in real and i != j
    # no leakage between splits
    train = {(int(a), int(b)) for a, b in out["train_edge_index"].T}
    assert not (edges & train)


def test_normalize_adj_for_vgae():
    ei = _ring(8)
    ei2, w = normalize_adj_for_vgae(ei, 8)
    assert ei2.shape[1] == ei.shape[1] + 8
    assert w.shape == (ei2.shape[1],)
    assert np.all(w > 0)


def test_unifews_logger_and_model_logger(tmp_path):
    log = UniFewsLogger("cora", "gcn", flag_run="t0",
                        dir_base=str(tmp_path))
    hs, cs = log.str_csv("cora", "gcn", 0, 1e-2, 1e-3, 0.815, 100, 200,
                         1.5, 2.0, 0.1, 0.2, 0.5, 0.6)
    log.print_header(hs, cs)
    assert "cora" in open(log.file_log).read()

    ml = ModelLogger(log, patience=5, cmp=">")
    ml.register({"w": np.ones(3)})
    assert ml.save_best(0.5, epoch=1)
    assert not ml.save_best(0.4, epoch=2)
    assert ml.save_best(0.7, epoch=3)
    assert not ml.is_early_stop(epoch=8)
    assert ml.is_early_stop(epoch=9)
    params = ml.load("best")
    np.testing.assert_array_equal(params["w"], np.ones(3))


def test_f1_and_misc():
    f1 = F1Calculator(3)
    f1.update([0, 1, 2, 2], [0, 1, 2, 1])
    micro = f1.compute("micro")
    assert 0 < micro <= 1
    assert 0 < f1.compute("macro") <= 1

    lay = LayerNumLogger("l0")
    lay.numel_before, lay.numel_after = 100, 25
    assert lay.ratio == 0.25

    with Stopwatch() as sw:
        pass
    assert sw.elapsed >= 0


def test_device_feature_cache():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(50, 8)).astype(np.float32)
    degree = np.arange(50)  # node 49 hottest
    cache = DeviceFeatureCache(x, budget_rows=10, score=degree)
    idx = np.array([49, 48, 0, 1])  # 2 hits, 2 misses
    out = np.asarray(cache[idx])
    np.testing.assert_allclose(out, x[idx], rtol=1e-6)
    assert cache.hits == 2 and cache.misses == 2
    # byte budget parsing
    c2 = DeviceFeatureCache(x, budget_bytes="1K")
    assert c2.budget_rows == 1024 // (8 * 4)


def test_sharded_feature_store():
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("dp",))
    store = ShardedFeatureStore(mesh, axis="dp")
    rng = np.random.default_rng(1)
    x = rng.normal(size=(30, 6)).astype(np.float32)  # pads 30 -> 32
    store.put_tensor(x, group_name="paper", attr_name="x")
    full = np.asarray(store.get_tensor("paper", "x"))
    np.testing.assert_allclose(full, x, rtol=1e-6)
    idx = np.array([0, 7, 29, 15])
    got = np.asarray(store.get_tensor("paper", "x", index=idx))
    np.testing.assert_allclose(got, x[idx], rtol=1e-6)
    assert store.remove_tensor("paper", "x")
    with pytest.raises(KeyError):
        store.get_tensor("paper", "x")
