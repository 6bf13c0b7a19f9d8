"""Plan-order attention primitives vs the COO path."""

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.layers.conv import GATConv
from gammagl_tpu.ops import segment_softmax, bspmm
from gammagl_tpu.ops.pallas import build_csr_plan
from gammagl_tpu.ops.pallas.attention import (plan_gather_src,
                                              plan_gather_dst,
                                              segment_softmax_padded,
                                              bspmm_csr)
import gammagl_tpu.ops.pallas.segment_matmul as sm

INTERP = jax.default_backend() != "tpu"


def _interp(fn, *a, **k):
    orig = sm._segment_matmul_pallas
    if INTERP:
        sm._segment_matmul_pallas = (
            lambda m, w, p, interpret=False: orig(m, w, p, True))
    try:
        return fn(*a, **k)
    finally:
        sm._segment_matmul_pallas = orig


def test_softmax_padded_matches_coo():
    rng = np.random.default_rng(0)
    n, e = 20, 80
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    plan = build_csr_plan(src, dst, n, R=8, ET=16)
    scores = jnp.asarray(rng.normal(size=(e, 3)).astype(np.float32))
    ref = segment_softmax(scores, jnp.asarray(dst), n)
    # scores in plan order
    perm = plan.perm
    sc_pad = jnp.asarray(
        np.where((perm < e)[:, None],
                 np.asarray(scores)[np.minimum(perm, e - 1)], 0.0))
    out = segment_softmax_padded(sc_pad, plan)
    # map back: real positions only
    back = np.zeros((e, 3), np.float32)
    back[perm[perm < e]] = np.asarray(out)[perm < e]
    np.testing.assert_allclose(back, np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_gat_conv_plan_matches_coo():
    rng = np.random.default_rng(1)
    n, e = 16, 60
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    ei = jnp.asarray(np.stack([src, dst]))
    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    plan = build_csr_plan(src, dst, n, R=8, ET=16)
    conv = GATConv(out_channels=4, heads=2, dropout_rate=0.0)
    params = conv.init(jax.random.PRNGKey(0), x, ei)
    ref = conv.apply(params, x, ei)
    out = _interp(conv.apply, params, x, ei, plan=plan)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_gat_conv_plan_grad():
    rng = np.random.default_rng(2)
    n, e = 12, 40
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    ei = jnp.asarray(np.stack([src, dst]))
    x = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    plan = build_csr_plan(src, dst, n, R=8, ET=16)
    conv = GATConv(out_channels=3, heads=2, dropout_rate=0.0)
    params = conv.init(jax.random.PRNGKey(0), x, ei)

    g_ref = jax.grad(lambda p: (conv.apply(p, x, ei) ** 2).sum())(params)
    g_out = _interp(jax.grad(
        lambda p: (conv.apply(p, x, ei, plan=plan) ** 2).sum()), params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_out)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-2, atol=1e-3)
