"""Compact (window-order) attention inputs: `plan_gather_src_compact`
feeds `flash_edge_attention` / `sddmm_csr` with an unpadded gather; the
kernels locate per-tile slabs by the plan's window indices and per-lane
backward outputs accumulate into shared boundary windows."""

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.ops.pallas import (build_csr_plan, flash_edge_attention,
                                    plan_gather_src,
                                    plan_gather_src_compact, sddmm_csr)


def _graph(seed=0, n=300, e=2500, F=64):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = (n * (rng.random(e) ** 1.5)).astype(np.int64)
    x = jnp.asarray(rng.normal(size=(n, F)), jnp.bfloat16)
    s_full = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    a_d = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    return src, dst, x, s_full, a_d, n, e, F


def _run(plan, compact, x, s_full, a_d, F):
    gather = plan_gather_src_compact if compact else plan_gather_src
    packed = jnp.concatenate(
        [x, s_full[:, None].astype(x.dtype)], axis=1)
    g = gather(packed, plan)
    return flash_edge_attention(g[:, F].astype(jnp.float32), a_d,
                                g[:, :F], plan, 0.2)


def test_compact_flash_matches_lane_order():
    src, dst, x, s_full, a_d, n, e, F = _graph()
    planw = build_csr_plan(src, dst, n, R=16, ET=64, window=True)
    planc = build_csr_plan(src, dst, n, R=16, ET=64)
    ref = _run(planc, False, x, s_full, a_d, F)
    got = _run(planw, True, x, s_full, a_d, F)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)
    # window plan with LANE-ORDER inputs must also work (detect-by-length)
    lane = _run(planw, False, x, s_full, a_d, F)
    np.testing.assert_allclose(np.asarray(lane, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)


def test_compact_flash_grads_match():
    src, dst, x, s_full, a_d, n, e, F = _graph(seed=3)
    planw = build_csr_plan(src, dst, n, R=16, ET=64, window=True)
    planc = build_csr_plan(src, dst, n, R=16, ET=64)

    def loss(x_, plan, compact):
        return jnp.sum(_run(plan, compact, x_, s_full, a_d, F
                            ).astype(jnp.float32) ** 2)

    g1 = jax.grad(lambda x_: loss(x_, planw, True))(x)
    g2 = jax.grad(lambda x_: loss(x_, planc, False))(x)
    ref = np.abs(np.asarray(g2, np.float32)).max()
    np.testing.assert_allclose(np.asarray(g1, np.float32),
                               np.asarray(g2, np.float32),
                               rtol=0.1, atol=0.05 * ref)


def test_fused_sddmm_packed_window():
    # the bf16 F%256==0 fused path (half-packed gather + dst-block dot)
    src, dst, *_ = _graph(seed=5)
    n, e, F = 300, 2500, 256
    rng = np.random.default_rng(6)
    src = rng.integers(0, n, e)
    dst = (n * (rng.random(e) ** 1.5)).astype(np.int64)
    xs = jnp.asarray(rng.normal(size=(n, F)), jnp.bfloat16)
    xd = jnp.asarray(rng.normal(size=(n, F)), jnp.bfloat16)
    ref_e = np.sum(np.asarray(xs, np.float64)[src]
                   * np.asarray(xd, np.float64)[dst], axis=1)
    for window in (False, True):
        plan = build_csr_plan(src, dst, n, R=16, ET=64, window=window)
        s = sddmm_csr(xs, xd, plan)
        got = np.zeros(e)
        got[plan.perm[plan.valid]] = np.asarray(s)[plan.valid]
        scale = np.abs(ref_e).max()
        np.testing.assert_allclose(got, ref_e, atol=0.02 * scale)

        # both grads = weighted SpMMs; check against the dense reference
        def loss(a, b):
            return jnp.sum(sddmm_csr(a, b, plan) ** 2)

        gs, gd = jax.grad(loss, argnums=(0, 1))(xs, xd)
        xsn = np.asarray(xs, np.float64)
        xdn = np.asarray(xd, np.float64)
        gref_s = np.zeros((n, F))
        gref_d = np.zeros((n, F))
        np.add.at(gref_s, src, 2 * got[:, None] * xdn[dst])
        np.add.at(gref_d, dst, 2 * got[:, None] * xsn[src])
        for got_g, ref_g in [(gs, gref_s), (gd, gref_d)]:
            sc = np.abs(ref_g).max() + 1e-9
            np.testing.assert_allclose(np.asarray(got_g, np.float64),
                                       ref_g, atol=0.05 * sc)


def test_compact_expand_and_segment_sum_win():
    from gammagl_tpu.ops.pallas import expand_dst_csr
    from gammagl_tpu.ops.pallas.segment_matmul import segment_sum_win

    rng = np.random.default_rng(11)
    n, e, F = 300, 2500, 64
    src = rng.integers(0, n, e)
    dst = (n * (rng.random(e) ** 1.5)).astype(np.int64)
    x = jnp.asarray(rng.normal(size=(n, F)), jnp.bfloat16)
    plan = build_csr_plan(src, dst, n, R=16, ET=64, window=True)

    # compact expand == x[dst] per sorted edge, exact (one-hot pick)
    out = expand_dst_csr(x, plan, False, True)
    assert out.shape[0] == plan.gather_len
    order = np.argsort(dst, kind="stable")
    np.testing.assert_array_equal(
        np.asarray(out, np.float32)[:e],
        np.asarray(x, np.float32)[dst[order]])

    # window-read segment reduce == scatter-add by dst
    v = jnp.asarray(rng.normal(size=(plan.gather_len, F)), jnp.float32)
    w = jnp.asarray(plan.valid).astype(jnp.float32)
    got = segment_sum_win(v, w, plan)[:n]
    ref = np.zeros((n, F))
    np.add.at(ref, dst[order], np.asarray(v, np.float64)[:e])
    np.testing.assert_allclose(np.asarray(got, np.float64), ref,
                               rtol=1e-4, atol=1e-3)

    # compact expand grads flow back through the window reduce
    g = jax.grad(lambda x_: jnp.sum(
        expand_dst_csr(x_, plan, False, True).astype(jnp.float32) ** 2
    ))(x)
    gref = np.zeros((n, F))
    np.add.at(gref, dst, 2 * np.asarray(x, np.float64)[dst])
    sc = np.abs(gref).max() + 1e-9
    np.testing.assert_allclose(np.asarray(g, np.float64), gref,
                               atol=0.05 * sc)


def test_hgt_pattern_compact_matches_decomposed():
    """The HGTConv plan-path pattern (compact k|v gather + MXU q expand
    + per-head flash) must match the decomposed XLA reference."""
    from gammagl_tpu.ops.pallas import (expand_dst_csr,
                                        flash_softmax_spmm)
    from gammagl_tpu.ops import segment_softmax
    from gammagl_tpu.ops.segment import segment_sum

    rng = np.random.default_rng(12)
    n_src, n_dst, e, H, D = 200, 150, 1800, 2, 16
    src = rng.integers(0, n_src, e)
    dst = (n_dst * (rng.random(e) ** 1.3)).astype(np.int64)
    plan = build_csr_plan(src, dst, n_dst, num_src=n_src, R=16, ET=64,
                          window=True)
    k = jnp.asarray(rng.normal(size=(n_src, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(n_src, H, D)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(n_dst, H, D)), jnp.float32)

    packed = jnp.concatenate(
        [k.reshape(-1, H * D), v.reshape(-1, H * D)], axis=1)
    g = plan_gather_src_compact(packed, plan)
    q_e = expand_dst_csr(q.reshape(-1, H * D), plan, False, True
                         ).reshape(-1, H, D)
    k_e = g[:, :H * D].reshape(-1, H, D)
    score = (q_e * k_e).sum(-1) / (D ** 0.5)
    out = jnp.stack(
        [flash_softmax_spmm(
            score[:, h],
            jax.lax.slice_in_dim(g, H * D + h * D, H * D + (h + 1) * D,
                                 axis=1), plan) for h in range(H)],
        axis=1)

    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)
    k_ed = jnp.take(k, srcj, axis=0)
    v_ed = jnp.take(v, srcj, axis=0)
    q_ed = jnp.take(q, dstj, axis=0)
    s_d = (q_ed * k_ed).sum(-1) / (D ** 0.5)
    alpha = segment_softmax(s_d, dstj, n_dst)
    ref = segment_sum(v_ed * alpha[..., None], dstj, n_dst)
    np.testing.assert_allclose(
        np.asarray(out, np.float32).reshape(n_dst, H * D),
        np.asarray(ref, np.float32).reshape(n_dst, H * D),
        rtol=2e-2, atol=2e-2)


def test_compact_gather_vjp_scatter():
    src, dst, x, s_full, a_d, n, e, F = _graph(seed=7)
    plan = build_csr_plan(src, dst, n, R=16, ET=64, window=True)

    def loss(x_):
        g = plan_gather_src_compact(x_, plan)
        return jnp.sum(g.astype(jnp.float32) ** 2)

    gx = jax.grad(loss)(x)
    # reference: each sorted edge contributes 2*x[src]; tail pads none
    ref = np.zeros((n, F))
    order = np.argsort(dst, kind="stable")
    np.add.at(ref, src[order], 2 * np.asarray(x, np.float64)[src[order]])
    np.testing.assert_allclose(np.asarray(gx, np.float64), ref,
                               rtol=0.1, atol=0.5)
