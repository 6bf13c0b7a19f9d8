"""calc_gcn_norm_np must match the jnp calc_gcn_norm exactly, including
with explicit edge weights (code-review regression: the np version
originally computed WEIGHTED degrees)."""

import numpy as np
import jax.numpy as jnp

from gammagl_tpu.utils import calc_gcn_norm, calc_gcn_norm_np


def test_np_norm_matches_jnp():
    rng = np.random.default_rng(0)
    n, e = 50, 300
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    w = rng.random(e).astype(np.float32)
    for ew in (None, w):
        want = np.asarray(calc_gcn_norm(jnp.asarray(ei), n,
                                        None if ew is None
                                        else jnp.asarray(ew)))
        got = calc_gcn_norm_np(ei, n, ew)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
