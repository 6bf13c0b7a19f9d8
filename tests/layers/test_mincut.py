"""Sparse mincut losses must match the dense reference formulation
(examples/citgnn/utils.py dense_mincut_pool)."""

import numpy as np
import jax.numpy as jnp

from gammagl_tpu.layers.pool import dense_mincut_pool, sparse_mincut_losses


def test_sparse_matches_dense():
    rng = np.random.default_rng(0)
    n, k, f = 40, 5, 8
    ei = rng.integers(0, n, (2, 160))
    adj = np.zeros((n, n), np.float32)
    np.add.at(adj, (ei[0], ei[1]), 1.0)  # duplicates accumulate
    s_logits = jnp.asarray(rng.normal(size=(n, k)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)

    _, _, mc_d, ortho_d = dense_mincut_pool(x, jnp.asarray(adj), s_logits)
    mc_s, ortho_s = sparse_mincut_losses(s_logits, jnp.asarray(ei), n)
    assert np.allclose(float(mc_d), float(mc_s), atol=1e-5)
    assert np.allclose(float(ortho_d), float(ortho_s), atol=1e-5)


def test_weighted_edges():
    rng = np.random.default_rng(1)
    n, k = 20, 3
    ei = rng.integers(0, n, (2, 60))
    w = rng.random(60).astype(np.float32)
    adj = np.zeros((n, n), np.float32)
    np.add.at(adj, (ei[0], ei[1]), w)
    s_logits = jnp.asarray(rng.normal(size=(n, k)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    _, _, mc_d, ortho_d = dense_mincut_pool(x, jnp.asarray(adj), s_logits)
    mc_s, ortho_s = sparse_mincut_losses(s_logits, jnp.asarray(ei), n,
                                         edge_weight=jnp.asarray(w))
    assert np.allclose(float(mc_d), float(mc_s), atol=1e-5)
    assert np.allclose(float(ortho_d), float(ortho_s), atol=1e-5)
