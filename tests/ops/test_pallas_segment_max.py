"""Pallas segment-MAX kernel (segmented scan + one-hot pick) vs the XLA
scatter-max reference, interpret mode on CPU. Covers both dtype paths
(f32 exact bit-chunk transport, bf16 single-pass), empty rows, gradient
parity, tie splitting, weights, and the MessagePassing plan hook."""

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.ops import segment_max, spmm
from gammagl_tpu.ops.pallas import (build_csr_plan, build_csr_plan_blocked,
                                    gather_rows, segment_max_csr,
                                    spmm_max_csr)

INTERP = jax.default_backend() != "tpu"


def _case(seed, n, e, f):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    return src, dst, w, x


def _msg_in_plan_order(plan, vals):
    """Host-side: caller-edge-order values -> padded plan order."""
    v_ext = np.concatenate([vals, np.zeros((1,) + vals.shape[1:],
                                           vals.dtype)])
    return v_ext[np.minimum(plan.perm, plan.num_edges)]


def test_segment_max_csr_matches_xla_f32():
    src, dst, w, x = _case(0, 24, 100, 8)
    msg = x[src]
    plan = build_csr_plan(src, dst, 24, R=8, ET=16)
    ref = segment_max(jnp.asarray(msg), jnp.asarray(dst), 24)
    out = segment_max_csr(jnp.asarray(_msg_in_plan_order(plan, msg)),
                          plan, interpret=INTERP)
    # f32 path is BITWISE exact (int-chunk transport)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_segment_max_csr_empty_rows_zero():
    # nodes 10..23 get no edges -> must be exactly 0, not -inf
    src = np.arange(10)
    dst = np.arange(10)
    x = np.random.default_rng(1).normal(size=(24, 4)).astype(np.float32) - 5
    plan = build_csr_plan(src, dst, 24, R=8, ET=16)
    out = np.asarray(segment_max_csr(
        jnp.asarray(_msg_in_plan_order(plan, x[src])), plan,
        interpret=INTERP))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[10:], 0.0)
    # rows with edges keep their (negative) maxima
    np.testing.assert_array_equal(out[:10], x[:10])


def test_segment_max_csr_bf16():
    src, dst, w, x = _case(2, 24, 120, 8)
    msg = jnp.asarray(x[src], jnp.bfloat16)
    plan = build_csr_plan(src, dst, 24, R=8, ET=16)
    ref = segment_max(msg, jnp.asarray(dst), 24)
    out = segment_max_csr(
        jnp.asarray(_msg_in_plan_order(plan, np.asarray(msg))), plan,
        interpret=INTERP)
    # bf16 pick is exact too (one-hot x bf16 products)
    np.testing.assert_array_equal(
        np.asarray(out, np.float32), np.asarray(ref, np.float32))


def test_spmm_max_matches_xla_weighted():
    src, dst, w, x = _case(3, 30, 150, 6)
    ei = jnp.asarray(np.stack([src, dst]))
    for plan in (build_csr_plan(src, dst, 30, R=8, ET=16),
                 build_csr_plan_blocked(src, dst, 30, R=8, ET=16,
                                        num_src_blocks=2)):
        ref = spmm(ei, jnp.asarray(w), jnp.asarray(x), num_nodes=30,
                   reduce="max")
        out = spmm_max_csr(jnp.asarray(x), jnp.asarray(w), plan,
                           interpret=INTERP)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_segment_max_grad_matches_xla():
    src, dst, w, x = _case(4, 20, 90, 5)
    ei = jnp.asarray(np.stack([src, dst]))
    plan = build_csr_plan(src, dst, 20, R=8, ET=16)

    def loss_pal(x):
        return (spmm_max_csr(x, jnp.asarray(w), plan,
                             interpret=INTERP) ** 2).sum()

    def loss_xla(x):
        return (spmm(ei, jnp.asarray(w), x, num_nodes=20,
                     reduce="max") ** 2).sum()

    v1, g1 = jax.value_and_grad(loss_pal)(jnp.asarray(x))
    v2, g2 = jax.value_and_grad(loss_xla)(jnp.asarray(x))
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_segment_max_grad_tie_split():
    """Two identical winning messages split the cotangent evenly (valid
    subgradient; deterministic, unlike the reference's atomics)."""
    src = np.array([0, 1, 2])
    dst = np.array([0, 0, 0])
    x = np.array([[2.0], [2.0], [1.0]], np.float32)
    plan = build_csr_plan(src, dst, 4, R=8, ET=16)

    g = jax.grad(lambda x: spmm_max_csr(
        x, None, plan, interpret=INTERP).sum())(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g),
                               [[0.5], [0.5], [0.0]], atol=1e-6)


def test_message_passing_max_plan_path():
    """MessagePassing.message_aggregate(aggr='max', plan=...) hits the
    kernel and matches the XLA fallback."""
    from gammagl_tpu.layers.conv import MessagePassing

    src, dst, w, x = _case(5, 26, 110, 7)
    ei = jnp.asarray(np.stack([src, dst]))
    plan = build_csr_plan(src, dst, 26, R=8, ET=16)
    mp = MessagePassing()
    ref = mp.message_aggregate(jnp.asarray(x), ei,
                               edge_weight=jnp.asarray(w), aggr="max",
                               num_nodes=26)
    out = mp.message_aggregate(jnp.asarray(x), ei,
                               edge_weight=jnp.asarray(w), aggr="max",
                               num_nodes=26, plan=plan)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_segment_max_segment_spans_tiles():
    """One destination row with more edges than ET: tile-local maxima
    must max-combine across tiles (revisiting accumulation)."""
    e = 50  # > ET=16: row 0's segment spans 4 tiles
    src = np.arange(e) % 7
    dst = np.zeros(e, np.int64)
    x = np.random.default_rng(6).normal(size=(7, 3)).astype(np.float32)
    plan = build_csr_plan(src, dst, 2, num_src=7, R=8, ET=16)
    ref = segment_max(jnp.asarray(x[src]), jnp.asarray(dst), 2)
    out = segment_max_csr(jnp.asarray(_msg_in_plan_order(plan, x[src])),
                          plan, interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_segment_min_csr_and_spmm_min():
    from gammagl_tpu.ops import segment_min
    from gammagl_tpu.ops.pallas import segment_min_csr, spmm_min_csr

    src, dst, w, x = _case(7, 24, 110, 6)
    plan = build_csr_plan(src, dst, 24, R=8, ET=16)
    msg = x[src]
    ref = segment_min(jnp.asarray(msg), jnp.asarray(dst), 24)
    out = segment_min_csr(jnp.asarray(_msg_in_plan_order(plan, msg)),
                          plan, interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    ref2 = spmm(jnp.asarray(np.stack([src, dst])), jnp.asarray(w),
                jnp.asarray(x), num_nodes=24, reduce="min")
    out2 = spmm_min_csr(jnp.asarray(x), jnp.asarray(w), plan,
                        interpret=INTERP)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-6)
    # blocked plan
    bplan = build_csr_plan_blocked(src, dst, 24, R=8, ET=16,
                                   num_src_blocks=2)
    out3 = spmm_min_csr(jnp.asarray(x), jnp.asarray(w), bplan,
                        interpret=INTERP)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref2),
                               rtol=1e-5, atol=1e-6)
    # grad parity
    g1 = jax.grad(lambda x: (spmm_min_csr(x, jnp.asarray(w), plan,
                                          interpret=INTERP) ** 2).sum())(
        jnp.asarray(x))
    g2 = jax.grad(lambda x: (spmm(jnp.asarray(np.stack([src, dst])),
                                  jnp.asarray(w), x, num_nodes=24,
                                  reduce="min") ** 2).sum())(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)
