"""Packed-gather SpMM kernel (bf16 features as f32 bitcast view) vs the
unpacked path — must be bit-identical (same one-hot matmul math, only
the gather layout changes)."""

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.ops.pallas import (build_csr_plan, pad_edge_weights,
                                    spmm_csr)
from gammagl_tpu.ops.pallas.segment_matmul import (_packed_eligible,
                                                   _spmm_packed_forward)


def _setup(seed=0, n=40, e=300, f=256):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    plan = build_csr_plan(src, dst, n, R=8, ET=32)
    x = jnp.asarray(rng.normal(size=(n, f)), jnp.bfloat16)
    w = jnp.asarray(rng.random(e), jnp.float32)
    return plan, x, w, src, dst, n


def test_packed_eligibility():
    plan, x, w, *_ = _setup()
    assert _packed_eligible(x, w)
    assert not _packed_eligible(x.astype(jnp.float32), w)
    assert not _packed_eligible(x[:, :200], w)     # F % 256 != 0


def test_packed_forward_bit_identical():
    plan, x, w, src, dst, n = _setup()
    wp = pad_edge_weights(plan, w)
    got = _spmm_packed_forward(x, wp, plan, interpret=True)[:n]
    # unpacked reference: same kernel math on the materialized gather
    from gammagl_tpu.ops.pallas.segment_matmul import (
        _segment_matmul_pallas)
    msg = jnp.take(x, jnp.asarray(plan.src_pad), axis=0)
    ref = _segment_matmul_pallas(msg, wp, plan, interpret=True)[:n]
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))


def test_packed_path_through_spmm_csr_and_grad():
    plan, x, w, src, dst, n = _setup(seed=3)
    wp = pad_edge_weights(plan, w)

    def loss(x):
        return jnp.sum(spmm_csr(x, wp, plan, weights_padded=True
                                ).astype(jnp.float32) ** 2)

    g = jax.grad(loss)(x)
    # dense f64 reference
    a = np.zeros((n, n))
    np.add.at(a, (dst, src), np.asarray(w))
    xd = np.asarray(x, np.float64)
    ref = 2 * a.T @ (a @ xd)
    np.testing.assert_allclose(np.asarray(g, np.float64), ref,
                               rtol=0.1, atol=0.5)  # bf16 feature grads


def test_packed_odd_width_falls_back():
    # F = 128 (not a multiple of 256): normal path, still correct
    plan, x, w, src, dst, n = _setup(seed=5, f=128)
    wp = pad_edge_weights(plan, w)
    out = spmm_csr(x, wp, plan, weights_padded=True)
    a = np.zeros((n, n))
    np.add.at(a, (dst, src), np.asarray(w))
    ref = a @ np.asarray(x, np.float64)
    np.testing.assert_allclose(np.asarray(out, np.float64), ref,
                               rtol=0.05, atol=0.3)
