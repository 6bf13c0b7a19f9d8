"""Fused flash edge-attention vs the decomposed softmax+bspmm path."""

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.ops.pallas import (build_csr_plan, flash_edge_attention,
                                    plan_gather_src,
                                    segment_softmax_padded)
from gammagl_tpu.ops.pallas.segment_matmul import _segment_matmul


def _setup(seed=0, n=24, e=100, f=8):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    plan = build_csr_plan(src, dst, n, R=8, ET=16)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=n).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=n).astype(np.float32))
    return plan, x, a_s, a_d, n


def _decomposed(a_s, a_d, x, plan, slope=0.2):
    msg = plan_gather_src(x, plan)
    s_src = plan_gather_src(a_s, plan)
    rows_c = jnp.asarray(np.minimum(plan.row_global, plan.num_nodes - 1))
    s = s_src + a_d[rows_c]
    s = jnp.where(s >= 0, s, slope * s)
    alpha = segment_softmax_padded(s, plan)
    return _segment_matmul(msg, alpha.astype(jnp.float32),
                           plan, False)[:plan.num_nodes]


def test_flash_forward_matches_decomposed():
    plan, x, a_s, a_d, n = _setup()
    msg = plan_gather_src(x, plan)
    s_src = plan_gather_src(a_s, plan)
    out = flash_edge_attention(s_src, a_d, msg, plan, 0.2)
    ref = _decomposed(a_s, a_d, x, plan)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_flash_isolated_rows_zero():
    # rows with no incoming edges must come out exactly 0 (l == 0 guard)
    rng = np.random.default_rng(3)
    n, e = 16, 30
    src = rng.integers(0, n, e)
    dst = np.where(rng.integers(0, 2, e) > 0, 0, 1)  # only rows 0/1 get mass
    plan = build_csr_plan(src, dst, n, R=8, ET=16)
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    a = jnp.zeros(n)
    out = flash_edge_attention(plan_gather_src(a, plan), a,
                               plan_gather_src(x, plan), plan, 0.2)
    np.testing.assert_allclose(np.asarray(out)[2:], 0.0, atol=1e-6)


def test_flash_gradients_match_decomposed():
    plan, x, a_s, a_d, n = _setup(seed=5, n=12, e=40, f=5)

    def loss_fused(a_s, a_d, x):
        out = flash_edge_attention(plan_gather_src(a_s, plan), a_d,
                                   plan_gather_src(x, plan), plan, 0.2)
        return (out ** 2).sum()

    def loss_ref(a_s, a_d, x):
        return (_decomposed(a_s, a_d, x, plan) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(a_s, a_d, x)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(a_s, a_d, x)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_gat_conv_fused_plan_matches_coo():
    from gammagl_tpu.layers.conv import GATConv
    rng = np.random.default_rng(7)
    n, e = 16, 60
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    ei = jnp.asarray(np.stack([src, dst]))
    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    plan = build_csr_plan(src, dst, n, R=8, ET=16)
    conv = GATConv(out_channels=4, heads=2, dropout_rate=0.0)
    params = conv.init(jax.random.PRNGKey(0), x, ei)
    ref = conv.apply(params, x, ei)
    out = conv.apply(params, x, ei, plan=plan)  # fused path (no dropout)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_flash_gradients_xla_fallback_wide_features():
    # per-head F > 512 routes the backward through the decomposed XLA VJP
    plan, x, a_s, a_d, n = _setup(seed=9, n=12, e=40, f=640)

    def loss_fused(a_s, a_d, x):
        out = flash_edge_attention(plan_gather_src(a_s, plan), a_d,
                                   plan_gather_src(x, plan), plan, 0.2)
        return (out ** 2).sum()

    def loss_ref(a_s, a_d, x):
        return (_decomposed(a_s, a_d, x, plan) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(a_s, a_d, x)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(a_s, a_d, x)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_flash_backward_isolated_rows_and_bf16():
    # zero-degree destination rows must not poison gradients (l == 0
    # guard in the recomputed alpha); bf16 message path exercised too
    rng = np.random.default_rng(11)
    n, e = 16, 30
    src = rng.integers(0, n, e)
    dst = np.where(rng.integers(0, 2, e) > 0, 0, 1)
    plan = build_csr_plan(src, dst, n, R=8, ET=16)
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=n).astype(np.float32))

    for dt in (jnp.float32, jnp.bfloat16):
        def loss(a_s, a_d, xx):
            out = flash_edge_attention(
                plan_gather_src(a_s, plan), a_d,
                plan_gather_src(xx, plan).astype(dt), plan, 0.2)
            return (out.astype(jnp.float32) ** 2).sum()

        grads = jax.grad(loss, argnums=(0, 1, 2))(a, a, x)
        for gr in grads:
            assert np.isfinite(np.asarray(gr, dtype=np.float32)).all()
