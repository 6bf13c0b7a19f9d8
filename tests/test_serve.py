"""Serving tier: AOT InferenceSession + StableHLO export roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.data import Graph
from gammagl_tpu.models import GCNModel
from gammagl_tpu.serve import (InferenceSession, export_forward,
                               load_exported, save_exported)


def _setup(seed=0, n=50, e=200, f=8, c=3):
    rng = np.random.default_rng(seed)
    ei = jnp.asarray(np.stack([rng.integers(0, n, e),
                               rng.integers(0, n, e)]))
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    model = GCNModel(hidden_dim=16, num_class=c)
    params = model.init(jax.random.PRNGKey(0), x, ei)
    return model, params, x, ei


def test_inference_session_matches_apply():
    model, params, x, ei = _setup()
    want = model.apply(params, x, ei)
    sess = InferenceSession(model.apply, params, (x, ei))
    got = sess(x, ei)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    assert sess.memory_analysis is not None


def test_export_roundtrip(tmp_path):
    model, params, x, ei = _setup(seed=1)
    want = np.asarray(model.apply(params, x, ei))
    exp = export_forward(model.apply, params, (x, ei))
    save_exported(exp, tmp_path / "gcn.stablehlo")
    back = load_exported(tmp_path / "gcn.stablehlo")
    got = np.asarray(back.call(x, ei))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_session_bf16_compute():
    model, params, x, ei = _setup(seed=2)
    sess = InferenceSession(model.apply, params, (x, ei),
                            compute_dtype=jnp.bfloat16)
    got = sess(x, ei)
    want = model.apply(params, x.astype(jnp.bfloat16), ei)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-2, atol=1e-2)
