import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.models import drnl_node_labeling, SEALModel, CoGSLModel


def test_drnl():
    # path 0-1-2-3
    ei = np.array([[0, 1, 2], [1, 2, 3]])
    labels = drnl_node_labeling(ei, 4, 0, 3)
    assert labels[0] == 1 and labels[3] == 1
    assert labels[1] > 0 and labels[2] > 0


def test_seal_model():
    rng = np.random.default_rng(0)
    n = 20
    ei = jnp.asarray(np.stack([rng.integers(0, n, 60),
                               rng.integers(0, n, 60)]))
    labels = jnp.asarray(rng.integers(0, 8, n))
    batch = jnp.asarray(np.repeat([0, 1], 10))
    m = SEALModel(hidden_dim=8, k=6)
    p = m.init(jax.random.PRNGKey(0), labels, ei, None, batch, 2)
    out = m.apply(p, labels, ei, None, batch, 2)
    assert out.shape == (2, 1)


def test_cogsl():
    rng = np.random.default_rng(0)
    n = 16
    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    e1 = jnp.asarray(np.stack([rng.integers(0, n, 40),
                               rng.integers(0, n, 40)]))
    e2 = jnp.asarray(np.stack([rng.integers(0, n, 40),
                               rng.integers(0, n, 40)]))
    m = CoGSLModel(num_class=3, hidden_dim=8)
    p = m.init(jax.random.PRNGKey(0), x, e1, e2)
    (l1, l2, lf), mi = m.apply(p, x, e1, e2)
    assert l1.shape == lf.shape == (n, 3)
    assert np.isfinite(float(mi))
