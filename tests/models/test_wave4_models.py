"""Specformer / MGNNI / HeCo / GraphGAN / distillation / pruning tests."""

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.models import (SpecformerModel, laplacian_eigh, MGNNIModel,
                                HeCoModel, GraphGAN, herec, distill_loss,
                                GLNNStudent)
from gammagl_tpu.utils import (threshold_prune, prune_params, rewind,
                               sparsity, prune_edges_by_weight)


def _g(n=16):
    rng = np.random.default_rng(0)
    ei = np.stack([rng.integers(0, n, 4 * n), rng.integers(0, n, 4 * n)])
    x = rng.normal(size=(n, 6)).astype(np.float32)
    return x, ei


def test_specformer():
    x, ei = _g()
    lam, u = laplacian_eigh(ei, 16)
    assert lam.shape == (16,) and u.shape == (16, 16)
    assert lam.min() >= -1e-5 and lam.max() <= 2 + 1e-5
    m = SpecformerModel(num_class=3, hidden_dim=8, num_filters=2,
                        drop_rate=0.0)
    p = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(lam),
               jnp.asarray(u))
    out = m.apply(p, jnp.asarray(x), jnp.asarray(lam), jnp.asarray(u))
    assert out.shape == (16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_mgnni():
    x, ei = _g()
    m = MGNNIModel(num_class=3, hidden_dim=8, scales=(1, 2), iters=4)
    p = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ei))
    out = m.apply(p, jnp.asarray(x), jnp.asarray(ei))
    assert out.shape == (16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_heco():
    rng = np.random.default_rng(0)
    x_dict = {"p": jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32)),
              "a": jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))}
    ei_dict = {("a", "w", "p"): jnp.asarray(
        np.stack([rng.integers(0, 8, 20), rng.integers(0, 10, 20)]))}
    metadata = (["p", "a"], [("a", "w", "p")])
    mp_edges = [jnp.asarray(np.stack([rng.integers(0, 10, 15),
                                      rng.integers(0, 10, 15)]))]
    pos = jnp.asarray(np.eye(10, dtype=bool))
    m = HeCoModel(metadata=metadata, target_ntype="p", hidden_dim=8,
                  feat_drop=0.0)
    p = m.init(jax.random.PRNGKey(0), x_dict, ei_dict, mp_edges, pos)
    loss = m.apply(p, x_dict, ei_dict, mp_edges, pos)
    assert np.isfinite(float(loss))
    emb = m.apply(p, x_dict, ei_dict, mp_edges)
    assert emb.shape == (10, 8)


def test_graphgan():
    m = GraphGAN(num_nodes=20, embedding_dim=8)
    u = jnp.asarray(np.arange(10))
    v = jnp.asarray(np.arange(10, 20))
    label = jnp.ones(10)
    p = m.init(jax.random.PRNGKey(0), u, v, label)
    d_loss = m.apply(p, u, v, label)
    g_loss = m.apply(p, u, v)
    assert np.isfinite(float(d_loss)) and np.isfinite(float(g_loss))


def test_herec_fusion():
    embs = [np.ones((5, 4)), np.zeros((5, 4))]
    out = herec(embs)
    assert out.shape == (5, 12)
    np.testing.assert_allclose(out[:, 8:], 0.5)


def test_distillation():
    rng = np.random.default_rng(0)
    teacher = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, 10))
    mask = jnp.asarray(np.arange(10) < 5).astype(jnp.float32)
    student = GLNNStudent(hidden_dim=8, num_class=3, drop_rate=0.0)
    x = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32))
    p = student.init(jax.random.PRNGKey(0), x)
    logits = student.apply(p, x)
    loss = distill_loss(logits, teacher, labels, mask)
    assert np.isfinite(float(loss))


def test_pruning():
    x = jnp.asarray([[0.1, -2.0], [0.5, 0.01]])
    pruned, mask = threshold_prune(x, 0.3)
    np.testing.assert_allclose(np.asarray(pruned),
                               [[0, -2.0], [0.5, 0]])
    params = {"w": x, "b": jnp.asarray([0.02, 3.0])}
    pp, masks = prune_params(params, 0.3)
    assert 0 < sparsity(masks) < 1
    rewound = rewind(pp, params, masks)
    np.testing.assert_allclose(np.asarray(rewound["w"]),
                               np.asarray(pp["w"]))
    w = prune_edges_by_weight(jnp.asarray([0.1, 0.9]), 0.5)
    np.testing.assert_allclose(np.asarray(w), [0.0, 0.9])
