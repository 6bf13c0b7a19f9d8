"""Pallas CSR segment-matmul vs XLA scatter reference (interpret mode on CPU).

On real TPU hardware the same kernels run compiled; the driver's bench does
that. Shapes here are tiny to keep interpret mode fast.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gammagl_tpu.ops import spmm
from gammagl_tpu.ops.pallas import build_csr_plan, spmm_csr, segment_sum_csr


def _case(seed, n, e, f):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    return src, dst, w, x


INTERP = jax.default_backend() != "tpu"


def test_plan_shapes():
    src, dst, w, x = _case(0, 40, 150, 8)
    plan = build_csr_plan(src, dst, 40, R=8, ET=16)
    assert plan.E_pad % plan.ET == 0
    assert plan.T == plan.E_pad // plan.ET
    assert plan.tile_first.sum() == plan.nblocks
    # every real edge appears exactly once in perm
    real = plan.perm[plan.perm < 150]
    assert sorted(real.tolist()) == list(range(150))


def test_spmm_csr_matches_xla():
    src, dst, w, x = _case(1, 24, 100, 8)
    plan = build_csr_plan(src, dst, 24, R=8, ET=16)
    ref = spmm(jnp.asarray(np.stack([src, dst])), jnp.asarray(w),
               jnp.asarray(x))
    out = spmm_csr(jnp.asarray(x), jnp.asarray(w), plan, interpret=INTERP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_spmm_csr_unweighted_and_grad():
    src, dst, w, x = _case(2, 16, 60, 8)
    plan = build_csr_plan(src, dst, 16, R=8, ET=16)
    ei = jnp.asarray(np.stack([src, dst]))

    ref = spmm(ei, None, jnp.asarray(x))
    out = spmm_csr(jnp.asarray(x), None, plan, interpret=INTERP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)

    g_ref = jax.grad(lambda x: (spmm(ei, jnp.asarray(w), x) ** 2).sum())(
        jnp.asarray(x))
    g_out = jax.grad(
        lambda x: (spmm_csr(x, jnp.asarray(w), plan,
                            interpret=INTERP) ** 2).sum())(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)


def test_spmm_csr_bfloat16():
    """bf16 single-pass path (exercises the i1-mask f32-select workaround
    in the kernel; headline bench dtype)."""
    src, dst, w, x = _case(3, 24, 100, 8)
    plan = build_csr_plan(src, dst, 24, R=8, ET=16)
    xb = jnp.asarray(x, jnp.bfloat16)
    wb = jnp.asarray(w, jnp.bfloat16)
    ref = spmm(jnp.asarray(np.stack([src, dst])), wb, xb)
    out = spmm_csr(xb, wb, plan, interpret=INTERP)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.1, atol=0.15)


def test_gather_rows_vjp_matches_take():
    """Kernel-backed scatter VJP (src via transpose plan, dst via the plan
    itself) must match the plain jnp.take autodiff. Pad cotangents are
    zeroed on both sides (take clamps pad indices into real rows; the
    kernel routes them to a sentinel -- semantics only agree at zero,
    which every in-library caller guarantees)."""
    from gammagl_tpu.ops.pallas import build_csr_plan, gather_rows

    rng = np.random.default_rng(13)
    n, e, f = 20, 70, 9
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    plan = build_csr_plan(src, dst, n, R=8, ET=16)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    valid = jnp.asarray(plan.valid)
    vwide = jnp.where(valid[:, None], jnp.asarray(
        rng.normal(size=(plan.E_pad, f)).astype(np.float32)), 0.0)
    v1d = jnp.where(valid, jnp.asarray(
        rng.normal(size=(plan.E_pad,)).astype(np.float32)), 0.0)

    for kind, idx in (("src", plan.src_pad),
                      ("dst", np.minimum(plan.row_global, n - 1))):
        idxj = jnp.asarray(idx)

        # wide cotangent (Pallas transpose-plan / plan-order reduce path)
        g_new = jax.grad(
            lambda xx: jnp.sum(gather_rows(xx, plan, kind) * vwide))(x)
        g_ref = jax.grad(
            lambda xx: jnp.sum(jnp.take(xx, idxj, axis=0) * vwide))(x)
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)

        # 1-D cotangent (scalar scatter path)
        g1_new = jax.grad(
            lambda xx: jnp.sum(gather_rows(xx[:, 0], plan, kind) * v1d))(x)
        g1_ref = jax.grad(
            lambda xx: jnp.sum(jnp.take(xx[:, 0], idxj) * v1d))(x)
        np.testing.assert_allclose(np.asarray(g1_new), np.asarray(g1_ref),
                                   rtol=1e-4, atol=1e-5)


def test_spmm_csr_vjp_matches_xla_spmm():
    """Fused SpMM VJP (transpose-plan backward) must match the XLA spmm
    gradients for BOTH x and edge weights, incl. the blocked plan."""
    from gammagl_tpu.ops import spmm
    from gammagl_tpu.ops.pallas import (build_csr_plan,
                                        build_csr_plan_blocked, spmm_csr)

    rng = np.random.default_rng(51)
    n, e, f = 30, 120, 10
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    ei = jnp.asarray(np.stack([src, dst]).astype(np.int32))
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=e).astype(np.float32))

    for plan in (build_csr_plan(src, dst, n, R=8, ET=16),
                 build_csr_plan_blocked(src, dst, n, R=8, ET=16,
                                        num_src_blocks=2)):
        def loss_pal(x, w):
            return (spmm_csr(x, w, plan) ** 2).sum()

        def loss_xla(x, w):
            return (spmm(ei, w, x, num_nodes=n) ** 2).sum()

        v1, g1 = jax.value_and_grad(loss_pal, argnums=(0, 1))(x, w)
        v2, g2 = jax.value_and_grad(loss_xla, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                                   rtol=1e-3, atol=1e-4)


def test_spmm_csr_vjp_bipartite_rows():
    """x with more rows than num_nodes (bipartite/src-padded case): dx
    covers all x rows."""
    from gammagl_tpu.ops.pallas import build_csr_plan, spmm_csr

    rng = np.random.default_rng(53)
    n_src, n_dst, e, f = 25, 12, 60, 6
    src = rng.integers(0, n_src, e)
    dst = rng.integers(0, n_dst, e)
    plan = build_csr_plan(src, dst, n_dst, num_src=n_src, R=8, ET=16)
    x = jnp.asarray(rng.normal(size=(n_src, f)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=e).astype(np.float32))

    g = jax.grad(lambda x: (spmm_csr(x, w, plan) ** 2).sum())(x)
    assert g.shape == x.shape
    # manual reference
    out = np.zeros((n_dst, f), np.float32)
    np.add.at(out, dst, np.asarray(w)[:, None] * np.asarray(x)[src])
    dx = np.zeros((n_src, f), np.float32)
    np.add.at(dx, src, np.asarray(w)[:, None] * 2 * out[dst])
    np.testing.assert_allclose(np.asarray(g), dx, rtol=1e-3, atol=1e-4)


def test_spmm_csr_vjp_zero_edge_plan():
    """Empty plans (isolated bucket / empty relation) must backprop to
    zeros, not crash (regression: _swap_plan IndexError at k=0)."""
    from gammagl_tpu.ops.pallas import build_csr_plan, spmm_csr

    plan = build_csr_plan(np.zeros(0, np.int64), np.zeros(0, np.int64),
                          10, R=8, ET=16)
    x = jnp.ones((10, 4), jnp.float32)
    w = jnp.zeros((0,), jnp.float32)
    out = spmm_csr(x, w, plan)
    np.testing.assert_allclose(np.asarray(out), 0.0)
    g = jax.grad(lambda x: (spmm_csr(x, w, plan) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_build_csr_plan_matches_loop_reference():
    """The vectorized plan layout must equal the original per-block loop
    (which is re-implemented here as the reference)."""
    import numpy as np
    from gammagl_tpu.ops.pallas import build_csr_plan

    def loop_reference(src, dst, num_nodes, R, ET):
        E = len(dst)
        order = np.argsort(dst, kind="stable")
        src_s, dst_s = src[order], dst[order]
        block_edges = np.searchsorted(
            dst_s, np.arange(0, -(-num_nodes // R) * R + 1, R), "left")
        nblocks = len(block_edges) - 1
        perm_p, src_p, lr_p, tb, tf = [], [], [], [], []
        for b in range(nblocks):
            lo, hi = int(block_edges[b]), int(block_edges[b + 1])
            n_t = max(1, -(-(hi - lo) // ET))
            pad = n_t * ET - (hi - lo)
            perm_p += [order[lo:hi], np.full(pad, E, np.int64)]
            src_p += [src_s[lo:hi], np.zeros(pad, np.int64)]
            lr_p += [dst_s[lo:hi] - b * R, np.full(pad, R, np.int64)]
            tb += [b] * n_t
            tf += [1] + [0] * (n_t - 1)
        return (np.concatenate(perm_p), np.concatenate(src_p),
                np.concatenate(lr_p), np.asarray(tb), np.asarray(tf))

    rng = np.random.default_rng(3)
    for n, e, R, ET in [(40, 200, 8, 16), (100, 30, 16, 8),
                        (64, 0, 8, 8), (257, 1000, 32, 64)]:
        src = rng.integers(0, n, e)
        dst = rng.integers(0, n, e)
        plan = build_csr_plan(src, dst, n, R=R, ET=ET)
        perm, sp, lr, tb, tf = loop_reference(src, dst, n, R, ET)
        assert (plan.perm == perm).all()
        assert (plan.src_pad == sp).all()
        assert (plan.local_row == lr).all()
        assert (plan.tile_block == tb).all()
        assert (plan.tile_first == tf).all()
