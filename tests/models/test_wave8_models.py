"""GEN EM estimation and FatraGNN fairness model."""

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.models import (FatraGNNModel, GEstimationN, GraphEditer,
                                modify_structure)


def _graph(n=20, e=80, c=2, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, c, n)
    # homophilous edges
    src = rng.integers(0, n, e)
    dst = np.where(rng.random(e) < 0.8,
                   rng.permutation(np.nonzero(y[src] >= 0)[0])[:e] % n,
                   rng.integers(0, n, e))
    same = np.nonzero(y[src] == y[dst])[0]
    ei = np.stack([src, dst])
    return ei, y


def test_gen_em_converges():
    ei, y = _graph()
    gen = GEstimationN(20, 2, ei, y, train_idx=np.arange(10))
    gen.reset_obs()
    adj = np.zeros((20, 20), np.int64)
    adj[ei[0], ei[1]] = 1
    gen.update_obs(adj)
    gen.update_obs(adj)
    alpha, beta, O, Q, iters = gen.em(y, seed=0)
    assert Q.shape == (20, 20)
    assert np.isfinite(Q).all()
    assert iters >= 1
    assert 0 <= beta <= 1


def test_fatragnn_flags_and_edit():
    rng = np.random.default_rng(1)
    n, f = 16, 8
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    ei = jnp.asarray(np.stack([rng.integers(0, n, 50),
                               rng.integers(0, n, 50)]))
    sens = rng.integers(0, 2, n)
    m = FatraGNNModel(num_features=f, hidden=8)
    p = m.init(jax.random.PRNGKey(0), x, ei,
               method=FatraGNNModel.init_all)
    assert m.apply(p, x, ei, 0).shape == (n, 1)
    assert float(m.apply(p, x, ei, 1).max()) <= 1.0
    ei2 = jnp.asarray(modify_structure(np.asarray(ei), np.asarray(ei),
                                       sens, drop=0.5))
    out = m.apply(p, x, ei, 5, edge_index2=ei2)
    assert out["h1"].shape == out["h2"].shape == (n, 8)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["h1"]), axis=1), 1.0, atol=1e-4)


def test_modify_structure_drops_mismatched():
    ei = np.array([[0, 1, 2, 3], [1, 2, 3, 0]])
    sens = np.array([0, 0, 1, 1])
    out = modify_structure(ei, ei, sens, drop=1.0, align=True)
    # all mismatched edges dropped; replacements are same-sens
    assert np.all(sens[out[0]] == sens[out[1]])
