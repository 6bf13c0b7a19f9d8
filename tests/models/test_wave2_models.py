import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.models import (PNAModel, CompGCNModel, DGCNNModel,
                                GaANModel)


def _g(n=12):
    rng = np.random.default_rng(0)
    ei = np.stack([rng.integers(0, n, 4 * n), rng.integers(0, n, 4 * n)])
    x = rng.normal(size=(n, 6)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(ei)


def test_pna_model():
    x, ei = _g()
    m = PNAModel(hidden_dim=8, num_class=3)
    p = m.init(jax.random.PRNGKey(0), x, ei)
    assert m.apply(p, x, ei).shape == (12, 3)


def test_compgcn_model():
    x, ei = _g()
    et = jnp.asarray(np.random.default_rng(0).integers(0, 3, ei.shape[1]))
    m = CompGCNModel(num_relations=3, hidden_dim=8, num_class=2)
    p = m.init(jax.random.PRNGKey(0), x, ei, et)
    assert m.apply(p, x, ei, et).shape == (12, 2)


def test_dgcnn_model():
    x, ei = _g(20)
    batch = jnp.asarray(np.repeat([0, 1], 10))
    m = DGCNNModel(hidden_dim=8, num_class=2, k=6)
    p = m.init(jax.random.PRNGKey(0), x, ei, batch, 2)
    out = m.apply(p, x, ei, batch, 2)
    assert out.shape == (2, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_gaan_model():
    x, ei = _g()
    m = GaANModel(hidden_dim=8, num_class=3, heads=2)
    p = m.init(jax.random.PRNGKey(0), x, ei)
    assert m.apply(p, x, ei).shape == (12, 3)
