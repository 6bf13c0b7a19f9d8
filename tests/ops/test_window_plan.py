"""Aligned-window plans (build_csr_plan(window=True)): the compact
gather + scalar-prefetched window reads must match the classic padded
layout exactly (same one-hot reduce; only where the kernel reads its
edge slabs changes), for every dtype/width branch and through the
transpose-plan backward."""

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.ops.pallas import (build_csr_plan, pack_halves,
                                    pad_edge_weights, spmm_csr,
                                    unpack_halves)
from gammagl_tpu.ops.pallas.segment_matmul import build_csr_plan_blocked


def _graph(seed=0, n=300, e=2500):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = (n * (rng.random(e) ** 1.5)).astype(np.int64)
    w = rng.random(e).astype(np.float32)
    return src, dst, w, n, e


def _dense_ref(src, dst, w, n, x):
    a = np.zeros((n, n))
    np.add.at(a, (dst, src), w)
    return a @ np.asarray(x, np.float64)


def test_pack_halves_roundtrip_exact():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(17, 256)), jnp.bfloat16)
    packed = pack_halves(x)
    assert packed.shape == (17, 128) and packed.dtype == jnp.float32
    assert bool(jnp.all(unpack_halves(packed) == x))


def test_window_layout_invariants():
    src, dst, w, n, e = _graph()
    for R, ET in [(8, 32), (16, 64), (128, 512)]:
        plan = build_csr_plan(src, dst, n, R=R, ET=ET, window=True)
        assert plan.tile_src is not None
        assert plan.gather_len % ET == 0
        # every real edge appears valid exactly once across all lanes
        counts = np.zeros(e, np.int64)
        np.add.at(counts, plan.perm[plan.valid], 1)
        assert (counts == 1).all()
        # valid lanes' sources match the original edges
        order = np.argsort(dst, kind="stable")
        np.testing.assert_array_equal(
            np.asarray(plan.gsrc[:e]), src[order])
        # tiles of one block are consecutive and marked
        assert plan.tile_first.sum() == plan.nblocks


def test_window_matches_dense_all_dtypes():
    # Window tiles group a block's edges differently than the classic
    # layout (boundary edges sit at different lane positions), so sums
    # reassociate -- compare against the dense f64 reference at
    # dtype-appropriate tolerances rather than bit-comparing layouts.
    src, dst, w, n, e = _graph(seed=1)
    for dtype, F, rtol, atol in [
            (jnp.float32, 128, 1e-3, 1e-2), (jnp.bfloat16, 256, 0.1, 0.5),
            (jnp.bfloat16, 128, 0.1, 0.5), (jnp.float32, 256, 1e-3, 1e-2)]:
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(n, F)), dtype)
        wj = jnp.asarray(w, dtype)
        planw = build_csr_plan(src, dst, n, R=16, ET=64, window=True)
        got = spmm_csr(x, pad_edge_weights(planw, wj), planw,
                       weights_padded=True)
        ref = _dense_ref(src, dst, np.asarray(wj, np.float64), n, x)
        np.testing.assert_allclose(
            np.asarray(got, np.float64), ref, rtol=rtol, atol=atol)


def test_window_grad_matches_dense():
    src, dst, w, n, e = _graph(seed=3)
    plan = build_csr_plan(src, dst, n, R=16, ET=64, window=True)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(n, 256)), jnp.bfloat16)
    wp = pad_edge_weights(plan, jnp.asarray(w, jnp.bfloat16))

    def loss(x):
        return jnp.sum(spmm_csr(x, wp, plan, weights_padded=True
                                ).astype(jnp.float32) ** 2)

    g = jax.grad(loss)(x)
    a = np.zeros((n, n))
    np.add.at(a, (dst, src), w)
    xd = np.asarray(x, np.float64)
    ref = 2 * a.T @ (a @ xd)
    np.testing.assert_allclose(np.asarray(g, np.float64), ref,
                               rtol=0.1, atol=1.0)


def test_window_blocked_plan():
    src, dst, w, n, e = _graph(seed=5)
    plan = build_csr_plan_blocked(src, dst, n, R=16, ET=64,
                                  num_src_blocks=3, window=True)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(n, 128)), jnp.float32)
    out = spmm_csr(x, jnp.asarray(w), plan)
    ref = _dense_ref(src, dst, w, n, x)
    np.testing.assert_allclose(np.asarray(out, np.float64), ref,
                               rtol=1e-4, atol=1e-3)


def test_window_empty_relation():
    # E == 0 (hetero graphs routinely carry empty relations; blocked
    # plans can carry empty src buckets): the plan must build, every
    # lane must be invalid, and the reduce must return zeros.
    for window in (True, False):
        plan = build_csr_plan([], [], 10, window=window)
        assert plan.num_edges == 0 and not plan.valid.any()
        x = jnp.ones((10, 128), jnp.float32)
        out = spmm_csr(x, jnp.zeros((0,), jnp.float32), plan)
        np.testing.assert_allclose(np.asarray(out), np.zeros((10, 128)))
    # blocked builder: all edges in one src bucket leaves others empty
    src = np.zeros(4, np.int64)
    dst = np.arange(4, dtype=np.int64)
    plan = build_csr_plan_blocked(src, dst, 300, R=16, ET=32,
                                  num_src_blocks=3, window=True)
    x = jnp.ones((300, 128), jnp.float32)
    out = spmm_csr(x, jnp.ones(4, jnp.float32), plan)
    ref = np.zeros((300, 128))
    ref[:4] = 1.0
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_window_empty_and_tiny():
    # blocks with zero edges still initialize their output rows
    src = np.array([0, 1])
    dst = np.array([5, 200])
    plan = build_csr_plan(src, dst, 300, R=16, ET=32, window=True)
    x = jnp.asarray(np.ones((300, 128)), jnp.float32)
    out = spmm_csr(x, jnp.ones(2, jnp.float32), plan)
    ref = np.zeros((300, 128))
    ref[5] = 1.0
    ref[200] = 1.0
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)
