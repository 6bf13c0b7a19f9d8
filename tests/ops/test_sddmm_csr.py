"""Pallas SDDMM (dst-block dot, one gather) vs the decomposed gather+dot."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gammagl_tpu.ops.pallas import (build_csr_plan, plan_gather_dst,
                                    plan_gather_src, sddmm_csr,
                                    sddmm_csr_mh)


def _setup(seed=0, n=24, e=100, f=8):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    plan = build_csr_plan(src, dst, n, R=8, ET=16)
    xs = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    xd = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    return plan, xs, xd


def _decomposed(xs, xd, plan):
    ga = plan_gather_src(xs, plan)
    gb = plan_gather_dst(xd, plan)
    s = jnp.sum(ga * gb, axis=-1)
    return s * jnp.asarray(plan.valid)


def test_sddmm_forward_matches_decomposed():
    plan, xs, xd = _setup()
    got = sddmm_csr(xs, xd, plan)
    ref = _decomposed(xs, xd, plan)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_sddmm_pad_lanes_zero():
    plan, xs, xd = _setup(seed=2, n=10, e=17, f=4)
    got = np.asarray(sddmm_csr(xs, xd, plan))
    assert np.all(got[~plan.valid] == 0)


def test_sddmm_multi_feature_tiles():
    # F > one lane tile in interpret mode still accumulates across f steps
    plan, xs, xd = _setup(seed=3, n=16, e=50, f=160)
    got = sddmm_csr(xs, xd, plan)
    ref = _decomposed(xs, xd, plan)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_sddmm_gradients_match_decomposed():
    plan, xs, xd = _setup(seed=5, n=12, e=40, f=5)
    w = jnp.asarray(np.random.default_rng(7).normal(
        size=plan.E_pad).astype(np.float32))

    def loss_fused(xs, xd):
        return jnp.sum(sddmm_csr(xs, xd, plan) * w)

    def loss_ref(xs, xd):
        return jnp.sum(_decomposed(xs, xd, plan) * w)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(xs, xd)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(xs, xd)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_sddmm_reuses_prebuilt_msg():
    plan, xs, xd = _setup(seed=6)
    msg = plan_gather_src(xs, plan)
    got = sddmm_csr(None, xd, plan, msg=msg)
    ref = _decomposed(xs, xd, plan)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("h", [1, 3])
def test_sddmm_multihead(h):
    rng = np.random.default_rng(11)
    n, e, f = 20, 70, 6
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    plan = build_csr_plan(src, dst, n, R=8, ET=16)
    xs = jnp.asarray(rng.normal(size=(n, h, f)).astype(np.float32))
    xd = jnp.asarray(rng.normal(size=(n, h, f)).astype(np.float32))
    got = sddmm_csr_mh(xs, xd, plan)
    for hh in range(h):
        ref = _decomposed(xs[:, hh], xd[:, hh], plan)
        np.testing.assert_allclose(np.asarray(got[:, hh]), np.asarray(ref),
                                   rtol=1e-3, atol=1e-4)


def test_sddmm_multihead_gradients():
    rng = np.random.default_rng(13)
    n, e, h, f = 14, 45, 2, 5
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    plan = build_csr_plan(src, dst, n, R=8, ET=16)
    xs = jnp.asarray(rng.normal(size=(n, h, f)).astype(np.float32))
    xd = jnp.asarray(rng.normal(size=(n, h, f)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(plan.E_pad, h)).astype(np.float32))

    def loss_fused(xs, xd):
        return jnp.sum(sddmm_csr_mh(xs, xd, plan) * w)

    def loss_ref(xs, xd):
        return sum(jnp.sum(_decomposed(xs[:, hh], xd[:, hh], plan)
                           * w[:, hh]) for hh in range(h))

    g1 = jax.grad(loss_fused, argnums=(0, 1))(xs, xd)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(xs, xd)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_expand_dst_matches_gather():
    from gammagl_tpu.ops.pallas import expand_dst_csr
    plan, xs, xd = _setup(seed=8, n=20, e=90, f=12)
    got = expand_dst_csr(xd, plan)
    ref = plan_gather_dst(xd, plan) * jnp.asarray(
        plan.valid)[:, None].astype(xd.dtype)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_expand_dst_grad():
    from gammagl_tpu.ops.pallas import expand_dst_csr
    plan, xs, xd = _setup(seed=9, n=14, e=50, f=6)
    w = jnp.asarray(np.random.default_rng(3).normal(
        size=(plan.E_pad, 6)).astype(np.float32))

    def loss_k(xd):
        return jnp.sum(expand_dst_csr(xd, plan) * w)

    def loss_ref(xd):
        g = plan_gather_dst(xd, plan) * jnp.asarray(
            plan.valid)[:, None].astype(xd.dtype)
        return jnp.sum(g * w)

    g1 = jax.grad(loss_k)(xd)
    g2 = jax.grad(loss_ref)(xd)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)
