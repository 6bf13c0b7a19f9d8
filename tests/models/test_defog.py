"""DeFoG denoiser + flow matching roundtrip tests."""

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.models import (DeFoGModel, flow_interpolate,
                                euler_sample_step, timestep_embedding)

DIMS = dict(
    n_layers=2,
    input_dims={"X": 4, "E": 3, "y": 1 + 64},
    hidden_mlp_dims={"X": 16, "E": 8, "y": 16},
    hidden_dims={"dx": 16, "de": 8, "dy": 16, "n_head": 2},
    output_dims={"X": 4, "E": 3, "y": 1},
)


def _graph(n=6):
    rng = np.random.default_rng(0)
    X = jax.nn.one_hot(jnp.asarray(rng.integers(0, 4, n)), 4)
    e_idx = rng.integers(0, 3, (n, n))
    e_idx = np.triu(e_idx) + np.triu(e_idx, 1).T
    E = jax.nn.one_hot(jnp.asarray(e_idx), 3)
    return X, E


def test_denoiser_shapes():
    X, E = _graph()
    m = DeFoGModel(**DIMS)
    y = jnp.zeros(1)
    p = m.init(jax.random.PRNGKey(0), X, E, y, jnp.asarray(0.5))
    oX, oE, oy = m.apply(p, X, E, y, jnp.asarray(0.5))
    assert oX.shape == (6, 4)
    assert oE.shape == (6, 6, 3)
    # edge logits symmetric
    np.testing.assert_allclose(np.asarray(oE),
                               np.asarray(jnp.swapaxes(oE, 0, 1)),
                               rtol=1e-5, atol=1e-6)


def test_flow_interpolation_limits():
    X, E = _graph()
    k = jax.random.PRNGKey(0)
    X1, E1 = flow_interpolate(k, X, E, 1.0)
    np.testing.assert_allclose(np.asarray(X1), np.asarray(X))
    X0, E0 = flow_interpolate(k, X, E, 0.0)
    # at t=0 everything resampled: rows are still one-hot-ish
    np.testing.assert_allclose(np.asarray(X0.sum(-1)), 1.0)


def test_euler_sampler_moves_toward_pred():
    X, E = _graph()
    k = jax.random.PRNGKey(1)
    # strongly peaked logits at class 0
    pX = jnp.full((6, 4), -20.0).at[:, 0].set(20.0)
    pE = jnp.full((6, 6, 3), -20.0).at[..., 0].set(20.0)
    Xt, Et = X, E
    t = 0.0
    for i in range(10):
        k, sk = jax.random.split(k)
        Xt, Et = euler_sample_step(sk, Xt, Et, pX, pE, t, 0.1)
        t += 0.1
    assert float(Xt[:, 0].mean()) > 0.9  # converged to class 0
    np.testing.assert_allclose(np.asarray(Et),
                               np.asarray(jnp.swapaxes(Et, 0, 1)))


def test_timestep_embedding():
    emb = timestep_embedding(jnp.asarray([0.1, 0.9]), 64)
    assert emb.shape == (2, 64)
