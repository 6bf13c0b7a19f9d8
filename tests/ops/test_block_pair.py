"""Block-pair SpMM vs XLA reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.ops import spmm
from gammagl_tpu.ops.pallas import build_block_pair_plan, spmm_block_pair


def _case(seed=0, n=40, e=200, f=8, band=None):
    rng = np.random.default_rng(seed)
    dst = rng.integers(0, n, e)
    if band:
        src = np.clip(dst + rng.integers(-band, band, e), 0, n - 1)
    else:
        src = rng.integers(0, n, e)
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    return src, dst, w, x


def test_block_pair_matches_xla():
    src, dst, w, x = _case()
    plan = build_block_pair_plan(src, dst, 40, R=8, S=8, ET=16)
    ref = spmm(jnp.asarray(np.stack([src, dst])), jnp.asarray(w),
               jnp.asarray(x))
    out = spmm_block_pair(jnp.asarray(x), jnp.asarray(w), plan)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_block_pair_unweighted_and_rect():
    # rectangular: 30 sources feeding 20 destinations
    rng = np.random.default_rng(1)
    src = rng.integers(0, 30, 120)
    dst = rng.integers(0, 20, 120)
    x = rng.normal(size=(30, 8)).astype(np.float32)
    plan = build_block_pair_plan(src, dst, 20, num_src=30, R=8, S=8, ET=16)
    ref = spmm(jnp.asarray(np.stack([src, dst])), None, jnp.asarray(x),
               num_nodes=20)
    out = spmm_block_pair(jnp.asarray(x), None, plan)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_block_pair_grads():
    src, dst, w, x = _case(seed=2, n=24, e=100, f=6)
    plan = build_block_pair_plan(src, dst, 24, R=8, S=8, ET=16)
    ei = jnp.asarray(np.stack([src, dst]))

    g1 = jax.grad(lambda x, w: (spmm_block_pair(x, w, plan) ** 2).sum(),
                  argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    g2 = jax.grad(lambda x, w: (spmm(ei, w, x) ** 2).sum(),
                  argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_block_pair_reorder_roundtrip():
    # banded after RCM: verify the permutation contract
    src, dst, w, x = _case(seed=3, n=32, e=150, f=4, band=6)
    plan = build_block_pair_plan(src, dst, 32, R=8, S=8, ET=16,
                                 reorder=True)
    assert plan.perm_nodes is not None
    x_re = jnp.asarray(x[plan.perm_nodes])
    out_re = spmm_block_pair(x_re, jnp.asarray(w), plan)
    out = np.empty_like(np.asarray(out_re))
    out[plan.perm_nodes] = np.asarray(out_re)
    ref = spmm(jnp.asarray(np.stack([src, dst])), jnp.asarray(w),
               jnp.asarray(x))
    np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_fill_ratio_reports_padding():
    src, dst, w, x = _case(seed=4, band=4)   # tight band -> high fill
    p_band = build_block_pair_plan(src, dst, 40, R=8, S=8, ET=8)
    src2, dst2, _, _ = _case(seed=5)          # random -> low fill
    p_rand = build_block_pair_plan(src2, dst2, 40, R=8, S=8, ET=8)
    assert p_band.fill_ratio > p_rand.fill_ratio
