import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.data import Graph
from gammagl_tpu.models import (SIGNModel, GCNUniFews, HardGATModel,
                                AdaGADModel, Sp2GCLModel, laplacian_eigh)
from gammagl_tpu.transforms import SIGN
from gammagl_tpu.utils import negative_sampling


def _g(n=16):
    rng = np.random.default_rng(0)
    ei = np.stack([rng.integers(0, n, 5 * n), rng.integers(0, n, 5 * n)])
    x = rng.normal(size=(n, 6)).astype(np.float32)
    return x, ei


def test_sign_pipeline():
    x, ei = _g()
    g = Graph(x=x, edge_index=ei)
    g = SIGN(K=2)(g)
    xs = [jnp.asarray(g.x), jnp.asarray(g.x1), jnp.asarray(g.x2)]
    m = SIGNModel(num_class=3, hidden_dim=8, K=2, drop_rate=0.0)
    p = m.init(jax.random.PRNGKey(0), xs)
    out = m.apply(p, xs)
    assert out.shape == (16, 3)


def test_gcn_unifews():
    x, ei = _g()
    m = GCNUniFews(num_class=3, hidden_dim=8, edge_thr=0.15)
    p = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ei))
    out = m.apply(p, jnp.asarray(x), jnp.asarray(ei))
    assert out.shape == (16, 3)
    masks = jax.tree_util.tree_map(
        lambda a: (jnp.abs(a) > 0.01).astype(a.dtype), p)
    p2 = GCNUniFews.apply_weight_masks(p, masks)
    out2 = m.apply(p2, jnp.asarray(x), jnp.asarray(ei))
    assert np.isfinite(np.asarray(out2)).all()


def test_hardgat():
    x, ei = _g()
    m = HardGATModel(hidden_dim=4, num_class=3, heads=2, k=3)
    p = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ei))
    out = m.apply(p, jnp.asarray(x), jnp.asarray(ei))
    assert out.shape == (16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_adagad():
    x, ei = _g()
    neg = negative_sampling(ei, num_nodes=16, num_neg_samples=20,
                            rng=np.random.default_rng(0))
    m = AdaGADModel(hidden_dim=8, latent_dim=4)
    p = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ei),
               jnp.asarray(neg))
    loss = m.apply(p, jnp.asarray(x), jnp.asarray(ei), jnp.asarray(neg))
    assert np.isfinite(float(loss))
    scores = m.apply(p, jnp.asarray(x), jnp.asarray(ei))
    assert scores.shape == (16,)


def test_sp2gcl():
    x, ei = _g()
    lam, u = laplacian_eigh(ei, 16, k=4)
    m = Sp2GCLModel(hidden_dim=8)
    p = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ei),
               jnp.asarray(u))
    loss = m.apply(p, jnp.asarray(x), jnp.asarray(ei), jnp.asarray(u))
    assert np.isfinite(float(loss))
