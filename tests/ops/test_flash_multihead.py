"""Multi-head flash attention (H on the pallas grid) vs the per-head
loop: forward and all gradients must match bitwise-close in interpret
mode (same kernel body, different index maps)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gammagl_tpu.data import Graph
from gammagl_tpu.ops.pallas import (flash_edge_attention,
                                    flash_edge_attention_mh,
                                    flash_softmax_spmm,
                                    flash_softmax_spmm_mh)


def _setup(seed=0, n=40, e=200, h=3, f=8):
    rng = np.random.default_rng(seed)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    g = Graph(x=np.zeros((n, 1), np.float32), edge_index=ei)
    plan = g.csr_plan()
    s_src = rng.normal(size=(plan.E_pad, h)).astype(np.float32)
    a_dst = rng.normal(size=(n, h)).astype(np.float32)
    msg = rng.normal(size=(plan.E_pad, h, f)).astype(np.float32)
    return plan, jnp.asarray(s_src), jnp.asarray(a_dst), jnp.asarray(msg)


def _loop(s_src, a_dst, msg, plan, slope, keep=None):
    H = s_src.shape[1]
    return jnp.stack(
        [flash_edge_attention(
            s_src[:, h], a_dst[:, h], msg[:, h], plan, slope, True,
            None if keep is None else keep[:, h])
         for h in range(H)], axis=1)


@pytest.mark.parametrize("slope", [0.2, 1.0])
def test_mh_forward_matches_loop(slope):
    plan, s_src, a_dst, msg = _setup()
    want = _loop(s_src, a_dst, msg, plan, slope)
    got = flash_edge_attention_mh(s_src, a_dst, msg, plan, slope, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_mh_grads_match_loop():
    plan, s_src, a_dst, msg = _setup(seed=1)

    def loss_loop(s, a, m):
        return (_loop(s, a, m, plan, 0.2) ** 2).sum()

    def loss_mh(s, a, m):
        return (flash_edge_attention_mh(s, a, m, plan, 0.2, True) ** 2
                ).sum()

    g_ref = jax.grad(loss_loop, argnums=(0, 1, 2))(s_src, a_dst, msg)
    g_mh = jax.grad(loss_mh, argnums=(0, 1, 2))(s_src, a_dst, msg)
    for a, b in zip(g_mh, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_mh_dropout_mask_matches_loop():
    plan, s_src, a_dst, msg = _setup(seed=2)
    keep = (jax.random.bernoulli(jax.random.PRNGKey(0), 0.8,
                                 (plan.E_pad, s_src.shape[1]))
            .astype(jnp.float32) / 0.8)
    want = _loop(s_src, a_dst, msg, plan, 0.2, keep)
    got = flash_edge_attention_mh(s_src, a_dst, msg, plan, 0.2, True,
                                  keep_pad=keep)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    g_ref = jax.grad(lambda m: (_loop(s_src, a_dst, m, plan, 0.2, keep)
                                ** 2).sum())(msg)
    g_mh = jax.grad(lambda m: (flash_edge_attention_mh(
        s_src, a_dst, m, plan, 0.2, True, keep_pad=keep) ** 2).sum())(msg)
    np.testing.assert_allclose(np.asarray(g_mh), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_mh_bf16_runs():
    plan, s_src, a_dst, msg = _setup(seed=3)
    msg16 = msg.astype(jnp.bfloat16)
    want = _loop(s_src, a_dst, msg16, plan, 0.2)
    got = flash_edge_attention_mh(s_src, a_dst, msg16, plan, 0.2, True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_softmax_spmm_mh_matches_loop():
    plan, s_src, _, msg = _setup(seed=4)
    H = s_src.shape[1]
    want = jnp.stack([flash_softmax_spmm(s_src[:, h], msg[:, h], plan,
                                         True) for h in range(H)], axis=1)
    got = flash_softmax_spmm_mh(s_src, msg, plan, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_mh_large_f_backward_falls_back_to_xla():
    """Per-head F > 512 must use the XLA backward (code-review
    regression: _bwd_mh originally lacked the single-head guard)."""
    plan, s_src, a_dst, _ = _setup(seed=5, n=16, e=40, h=2, f=4)
    rng = np.random.default_rng(5)
    msg = jnp.asarray(rng.normal(size=(plan.E_pad, 2, 640)
                                 ).astype(np.float32))
    g_ref = jax.grad(lambda m: (_loop(s_src, a_dst, m, plan, 0.2) ** 2
                                ).sum())(msg)
    g_mh = jax.grad(lambda m: (flash_edge_attention_mh(
        s_src, a_dst, m, plan, 0.2, True) ** 2).sum())(msg)
    np.testing.assert_allclose(np.asarray(g_mh), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)
