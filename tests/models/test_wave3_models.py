import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.models import (SGFormerModel, GNNLFHFModel, HiDNetModel,
                                CAGCNModel, HPNModel, ieHGCNModel,
                                RoheHANModel, MERITModel, GRADEModel, tadw)


def _g(n=14):
    rng = np.random.default_rng(0)
    ei = np.stack([rng.integers(0, n, 5 * n), rng.integers(0, n, 5 * n)])
    x = rng.normal(size=(n, 6)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(ei)


def _typed():
    rng = np.random.default_rng(0)
    x_dict = {"p": jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32)),
              "a": jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))}
    ei_dict = {("a", "w", "p"): jnp.asarray(
        np.stack([rng.integers(0, 6, 15), rng.integers(0, 8, 15)])),
        ("p", "c", "p"): jnp.asarray(
        np.stack([rng.integers(0, 8, 12), rng.integers(0, 8, 12)]))}
    return x_dict, ei_dict, (["p", "a"], list(ei_dict.keys()))


def test_sgformer():
    x, ei = _g()
    m = SGFormerModel(hidden_dim=8, num_class=3, drop_rate=0.0)
    p = m.init(jax.random.PRNGKey(0), x, ei)
    out = m.apply(p, x, ei)
    assert out.shape == (14, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_gnnlfhf():
    x, ei = _g()
    for variant in ("lf", "hf"):
        m = GNNLFHFModel(hidden_dim=8, num_class=3, variant=variant, K=3,
                         drop_rate=0.0)
        p = m.init(jax.random.PRNGKey(0), x, ei)
        assert m.apply(p, x, ei).shape == (14, 3)


def test_hidnet():
    x, ei = _g()
    m = HiDNetModel(hidden_dim=8, num_class=3, num_layers=3, drop_rate=0.0)
    p = m.init(jax.random.PRNGKey(0), x, ei)
    assert m.apply(p, x, ei).shape == (14, 3)


def test_cagcn():
    x, ei = _g()
    logits = jnp.asarray(np.random.default_rng(1).normal(
        size=(14, 3)).astype(np.float32))
    m = CAGCNModel(num_class=3, hidden_dim=8)
    p = m.init(jax.random.PRNGKey(0), logits, ei)
    out = m.apply(p, logits, ei)
    assert out.shape == (14, 3)


def test_hpn_iehgcn_rohehan():
    x_dict, ei_dict, metadata = _typed()
    for m in (HPNModel(metadata=metadata, hidden_channels=8, num_class=2,
                       target_ntype="p"),
              ieHGCNModel(metadata=metadata, hidden_channels=8, num_class=2,
                          target_ntype="p"),
              RoheHANModel(metadata=metadata, hidden_channels=4, num_class=2,
                           target_ntype="p", heads=2)):
        p = m.init(jax.random.PRNGKey(0), x_dict, ei_dict)
        out = m.apply(p, x_dict, ei_dict)
        assert out.shape == (8, 2)
        assert np.isfinite(np.asarray(out)).all()


def test_merit_grade():
    x, ei = _g()
    w = jnp.ones(ei.shape[1])
    m = MERITModel(hidden_dim=8)
    p = m.init(jax.random.PRNGKey(0), x, ei, w, x, ei, w)
    z1, z2 = m.apply(p, x, ei, w, x, ei, w)
    loss = MERITModel.byol_loss(z1, z2)
    assert np.isfinite(float(loss))

    gm = GRADEModel(hidden_dim=8)
    p = gm.init(jax.random.PRNGKey(0), x, ei, w, x, ei, w)
    assert np.isfinite(float(gm.apply(p, x, ei, w, x, ei, w)))


def test_tadw():
    rng = np.random.default_rng(0)
    adj = (rng.random((10, 10)) < 0.3).astype(np.float32)
    text = rng.random((10, 20)).astype(np.float32)
    emb = tadw(adj, text, dim=4, iters=5)
    assert emb.shape == (10, 8)
    assert np.isfinite(emb).all()
