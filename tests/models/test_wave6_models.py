import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.models import (MAGCLModel, GCILModel, SFGCNModel,
                                EdgePromptModel, AMPModel,
                                dfad_generator_loss, dfad_student_loss)


def _g(n=14):
    rng = np.random.default_rng(0)
    ei = jnp.asarray(np.stack([rng.integers(0, n, 4 * n),
                               rng.integers(0, n, 4 * n)]))
    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    return x, ei


def test_magcl_gcil():
    x, ei = _g()
    w = jnp.ones(ei.shape[1])
    for M in (MAGCLModel(hidden_dim=8), GCILModel(hidden_dim=8)):
        p = M.init(jax.random.PRNGKey(0), x, ei, w, x, ei, w)
        loss = M.apply(p, x, ei, w, x, ei, w)
        assert np.isfinite(float(loss))
        z = M.apply(p, x, ei, w)
        assert z.shape == (14, 8)


def test_sfgcn():
    x, ei = _g()
    _, fei = _g()
    m = SFGCNModel(num_class=3, hidden_dim=8)
    p = m.init(jax.random.PRNGKey(0), x, ei, fei)
    logits, consistency = m.apply(p, x, ei, fei)
    assert logits.shape == (14, 3)
    assert float(consistency) >= 0


def test_edgeprompt():
    x, ei = _g()
    m = EdgePromptModel(num_class=3, hidden_dim=8, num_prompts=2)
    p = m.init(jax.random.PRNGKey(0), x, ei)
    assert m.apply(p, x, ei).shape == (14, 3)


def test_amp():
    x, ei = _g()
    m = AMPModel(num_class=3, hidden_dim=8, max_steps=3)
    p = m.init(jax.random.PRNGKey(0), x, ei)
    logits, depth = m.apply(p, x, ei)
    assert logits.shape == (14, 3)
    assert 0 < float(depth) <= 3.01


def test_dfad_losses():
    s = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    t = jnp.asarray([[0.5, 0.5], [0.5, 0.5]])
    assert float(dfad_student_loss(s, t)) > 0
    assert float(dfad_generator_loss(s, t)) < 0
