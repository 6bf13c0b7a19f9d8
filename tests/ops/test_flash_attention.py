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


def test_flash_dropout_keep_pad_matches_manual_mask():
    """Fused alpha-dropout (keep_pad) must equal the decomposed path with
    the SAME post-softmax mask, in value and in all three gradients."""
    plan, x, a_s, a_d, n = _setup(seed=17, n=20, e=70, f=8)
    rng = np.random.default_rng(21)
    kp = 0.6
    keep = jnp.asarray(
        (rng.random(plan.E_pad) < kp).astype(np.float32) / kp)

    def loss_fused(a_s, a_d, x):
        out = flash_edge_attention(plan_gather_src(a_s, plan), a_d,
                                   plan_gather_src(x, plan), plan, 0.2,
                                   keep_pad=keep)
        return (out ** 2).sum()

    def loss_ref(a_s, a_d, x):
        msg = plan_gather_src(x, plan)
        s_src = plan_gather_src(a_s, plan)
        rows_c = jnp.asarray(np.minimum(plan.row_global, n - 1))
        s = s_src + a_d[rows_c]
        s = jnp.where(s >= 0, s, 0.2 * s)
        alpha = segment_softmax_padded(s, plan) * keep
        out = _segment_matmul(msg, alpha, plan, False)[:n]
        return (out ** 2).sum()

    v1, g1 = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(a_s, a_d, x)
    v2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(a_s, a_d, x)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_flash_softmax_spmm_arbitrary_scores():
    """Arbitrary per-edge scores (GATv2/HGT shape) through the slope=1
    wrapper match the decomposed softmax+matmul, values and grads."""
    from gammagl_tpu.ops.pallas import flash_softmax_spmm
    plan, x, _, _, n = _setup(seed=23, n=18, e=64, f=7)
    rng = np.random.default_rng(29)
    scores = jnp.where(
        jnp.asarray(plan.valid),
        jnp.asarray(rng.normal(size=plan.E_pad).astype(np.float32)), 0.0)

    def loss_fused(s, x):
        out = flash_softmax_spmm(s, plan_gather_src(x, plan), plan)
        return (out ** 2).sum()

    def loss_ref(s, x):
        alpha = segment_softmax_padded(s, plan)
        out = _segment_matmul(plan_gather_src(x, plan), alpha, plan,
                              False)[:n]
        return (out ** 2).sum()

    v1, g1 = jax.value_and_grad(loss_fused, argnums=(0, 1))(scores, x)
    v2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1))(scores, x)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    # score grads only compared at valid edges (pads differ by design:
    # the decomposed path's pad lanes shadow real rows)
    np.testing.assert_allclose(
        np.asarray(g1[0])[plan.valid], np.asarray(g2[0])[plan.valid],
        rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-3, atol=1e-4)


def test_gatv2_conv_plan_matches_coo():
    from gammagl_tpu.layers.conv import GATV2Conv
    rng = np.random.default_rng(31)
    n, e = 16, 60
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    ei = jnp.asarray(np.stack([src, dst]))
    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    plan = build_csr_plan(src, dst, n, R=8, ET=16)
    conv = GATV2Conv(out_channels=4, heads=2, dropout_rate=0.0)
    params = conv.init(jax.random.PRNGKey(0), x, ei)
    ref = conv.apply(params, x, ei)
    out = conv.apply(params, x, ei, plan=plan)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_gat_conv_fused_dropout_trains():
    """Dropout path stays on the fused kernel: finite grads, zero-rate
    equivalence with the no-dropout fused path."""
    from gammagl_tpu.layers.conv import GATConv
    rng = np.random.default_rng(37)
    n, e = 16, 60
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    ei = jnp.asarray(np.stack([src, dst]))
    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    plan = build_csr_plan(src, dst, n, R=8, ET=16)
    conv = GATConv(out_channels=4, heads=2, dropout_rate=0.5)
    params = conv.init(jax.random.PRNGKey(0), x, ei)

    def loss(p):
        out = conv.apply(p, x, ei, train=True, plan=plan,
                         rngs={"dropout": jax.random.PRNGKey(1)})
        return (out ** 2).sum()

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()

    conv0 = GATConv(out_channels=4, heads=2, dropout_rate=0.0)
    a = conv0.apply(params, x, ei, train=True, plan=plan)
    b = conv0.apply(params, x, ei, plan=plan)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_gat_conv_remat_matches():
    """remat=True must be numerically identical (values and grads)."""
    from gammagl_tpu.layers.conv import GATConv
    rng = np.random.default_rng(61)
    n, e = 16, 60
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    ei = jnp.asarray(np.stack([src, dst]))
    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    plan = build_csr_plan(src, dst, n, R=8, ET=16)

    conv = GATConv(out_channels=4, heads=2, dropout_rate=0.0)
    conv_r = GATConv(out_channels=4, heads=2, dropout_rate=0.0, remat=True)
    params = conv.init(jax.random.PRNGKey(0), x, ei)
    a = conv.apply(params, x, ei, plan=plan)
    b = conv_r.apply(params, x, ei, plan=plan)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    g1 = jax.grad(lambda p: (conv.apply(p, x, ei, plan=plan)**2).sum())(
        params)
    g2 = jax.grad(lambda p: (conv_r.apply(p, x, ei, plan=plan)**2).sum())(
        params)
    for u, v in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   rtol=1e-5, atol=1e-6)
