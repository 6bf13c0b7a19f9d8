"""Fully fused multi-head dot-product edge attention (HGT-style) over a
window CSRPlan, operating on the HALF-PACKED k|v gather.

The round-4 HGT path paid for its generality (reference analog:
gammagl/layers/conv/hgt_conv.py:88-156, which materializes per-edge
k/q/v and runs segment softmax + bspmm):

    gather k|v (512 bf16 cols = 4 column groups -> 92 Mrows/s, 22 ms)
    + q dst-expand kernel (7 ms) + XLA score elementwise (2+ GB HBM)
    + 4 single-head flash launches (each with its own score operand)

Budget measured in profiler/hgt_roofline.py. This module fuses the
whole pipeline into ONE kernel pass per direction:

  * the k|v gather runs on the f32 BITCAST view (pack_halves): 256
    lanes = 2 column groups, ~2x the row rate of the 4-group layout;
    the kernel unpacks in-register with u32 shifts (the packed-SpMM
    trick, segment_matmul.py);
  * scores are computed ON THE MXU inside the kernel: for each
    (dst-block, edge-tile) pair, s_h = q_h @ k_h^T is a dense
    (R, D) x (D, ET) matmul — no per-edge score tensor, no q expand,
    no score side-channel operand (whose per-tile DMA cost the round-5
    flash investigation measured at ~1.6 ms — PERF_NOTES);
  * online softmax per head + weighted aggregate, exactly like
    flash_attention.py, all heads in one launch;
  * the backward is one fused pass too: recomputes s/alpha from the
    saved (m, l), emits dq (dst-block accumulate), and dk|dv packed
    back into the k|v column layout so the scatter (transpose-plan
    SpMM) gathers the cotangents through the SAME half-packed view.

Scale the relation prior into q BEFORE calling (q_scaled = q * pri /
sqrt(D)); its gradient then flows automatically outside the custom_vjp.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gammagl_tpu.ops.pallas.segment_matmul import (_unpack_tile,
                                                   pack_halves, spmm_csr)
from gammagl_tpu.ops.pallas.flash_attention import _lane_layout, _tile_last
from gammagl_tpu.ops.pallas.sddmm_csr import _pad_dst
from gammagl_tpu.ops.pallas.attention import _compact_transpose_plan

__all__ = ["hgt_flash_packed"]

_NEG = -1e30


def _unpack_pair(gp):
    """(ET, F) f32 packed tile -> (k, v) bf16 (ET, F) each. For
    kv = [k | v] (2F columns), pack_halves packs column j's word with
    k_j in the LOW 16 bits and v_j in the HIGH 16 bits, i.e. the
    standard (left, right) = segment_matmul._unpack_tile split."""
    return _unpack_tile(gp)


def _gather_parts(F, D):
    """How many column parts to split the packed (N, F)-f32 k|v gather
    into. Default 1 — the round-5 column-split experiment is a MEASURED
    NEGATIVE (PERF_NOTES "HGT gather split"): at the bench footprint a
    102 MB half-table of 512 B rows gathers at only 190 Mrows/s (95
    effective for the split full row) vs 141 monolithic, and the full
    train step regressed 25.5 -> 22.5 M e/s. (The probe that suggested
    +29% was invalid: its serialization chain left the second half
    loop-invariant, so XLA hoisted that gather out of the timing loop.)
    Blocking the TABLE under the 100 MB cliff is likewise negative at
    this row width (profiler/hgt_blocked_probe.py: best +13% at B=3,
    worse elsewhere). The machinery stays (tested at ngp=2/4 in
    tests/ops/test_hetero_flash.py) for re-probing on future hardware:
    set GGL_HGT_GATHER_PARTS to force a part count; parts must not
    straddle a head (128 % D == 0)."""
    import os
    n = int(os.environ.get("GGL_HGT_GATHER_PARTS", "1"))
    if n > 1 and F % n == 0 and (F // n) % D == 0:
        return n
    return 1


def _head_kv(parts, Fp, h, D):
    """(k_h, v_h) lane slices for head h out of the unpacked parts."""
    i = (h * D) // Fp
    a = h * D - i * Fp
    k, v = parts[i]
    return k[:, a:a + D], v[:, a:a + D]


def _fwd_kernel(tb_ref, tf_ref, tl_ref, ts_ref, lr_ref, *rest, R, ET,
                H, D, ngp):
    gp_refs = rest[:ngp]
    q_ref, out_ref, m_out_ref, l_out_ref, m_s, l_s, acc = rest[ngp:]
    t = pl.program_id(0)
    F = H * D
    Fp = F // ngp
    sel = (jax.lax.broadcasted_iota(jnp.int32, (R, ET), 0) == lr_ref[0])

    @pl.when(tf_ref[t] == 1)
    def _():
        m_s[:] = jnp.full((R, H), _NEG, jnp.float32)
        l_s[:] = jnp.zeros((R, H), jnp.float32)
        acc[:] = jnp.zeros_like(acc)

    parts = [_unpack_pair(r[:]) for r in gp_refs]
    q = q_ref[:]
    for h in range(H):
        qh = q[:, h * D:(h + 1) * D]
        kh, vh = _head_kv(parts, Fp, h, D)
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(sel, s, _NEG)
        m_old = m_s[:, h:h + 1]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        scale = jnp.exp(jnp.minimum(m_old - m_new, 0.0))
        p = jnp.where(sel, jnp.exp(s - m_new), 0.0)
        l_s[:, h:h + 1] = l_s[:, h:h + 1] * scale + jnp.sum(
            p, axis=1, keepdims=True)
        upd = jnp.dot(p.astype(jnp.bfloat16), vh,
                      preferred_element_type=jnp.float32)
        acc[:, h * D:(h + 1) * D] = (acc[:, h * D:(h + 1) * D] * scale
                                     + upd)
        m_s[:, h:h + 1] = m_new

    @pl.when(tl_ref[t] == 1)
    def _():
        l_safe = jnp.maximum(l_s[:], 1e-16)
        for h in range(H):
            out_ref[:, h * D:(h + 1) * D] = (
                acc[:, h * D:(h + 1) * D] / l_safe[:, h:h + 1]
            ).astype(out_ref.dtype)
        m_out_ref[:] = m_s[:].reshape(1, R, H)
        l_out_ref[:] = l_s[:].reshape(1, R, H)


def _bwd_kernel(tb_ref, tf_ref, tl_ref, ts_ref, wf_ref, lr_ref, *rest,
                R, ET, H, D, ngp):
    gp_refs = rest[:ngp]
    q_ref, g_ref, m_ref, l_ref, c_ref = rest[ngp:ngp + 5]
    dkv_refs = rest[ngp + 5:2 * ngp + 5]
    dq_ref, dq_acc = rest[2 * ngp + 5:]
    t = pl.program_id(0)
    F = H * D
    Fp = F // ngp
    sel = (jax.lax.broadcasted_iota(jnp.int32, (R, ET), 0) == lr_ref[0])
    parts = [_unpack_pair(r[:]) for r in gp_refs]
    q = q_ref[:]
    g = g_ref[:]
    m = m_ref[0]                                   # (R, H)
    l = jnp.maximum(l_ref[0], 1e-16)
    c = c_ref[0]

    @pl.when(tf_ref[t] == 1)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    pieces = []
    for h in range(H):
        qh = q[:, h * D:(h + 1) * D]
        kh, vh = _head_kv(parts, Fp, h, D)
        gh = g[:, h * D:(h + 1) * D]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        alpha = jnp.where(
            sel, jnp.exp(jnp.minimum(s - m[:, h:h + 1], 0.0))
            / l[:, h:h + 1], 0.0)
        dalpha = jax.lax.dot_general(gh, vh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        ds = alpha * (dalpha - c[:, h:h + 1])
        ds = jnp.where(sel, ds, 0.0)
        ds_bf = ds.astype(jnp.bfloat16)
        dq_acc[:, h * D:(h + 1) * D] = (
            dq_acc[:, h * D:(h + 1) * D]
            + jnp.dot(ds_bf, kh, preferred_element_type=jnp.float32))
        dk = jax.lax.dot_general(ds_bf, qh, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dv = jax.lax.dot_general(alpha.astype(jnp.bfloat16), gh,
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        pieces.append((dk, dv))
    dkv_tile = jnp.concatenate(
        [p[0] for p in pieces] + [p[1] for p in pieces],
        axis=1).astype(jnp.bfloat16)               # (ET, 2F)
    # emit the cotangent in ngp column parts (2F//ngp bf16 = 128 f32
    # lanes each when split) so the transpose-plan scatter gathers
    # 512 B rows — the fast row-rate class (see _gather_parts)
    W2 = 2 * F // ngp

    @pl.when(wf_ref[t] == 1)
    def _():
        for i, dr in enumerate(dkv_refs):
            dr[:] = dkv_tile[:, i * W2:(i + 1) * W2]

    @pl.when(wf_ref[t] == 0)
    def _():
        for i, dr in enumerate(dkv_refs):
            dr[:] = dr[:] + dkv_tile[:, i * W2:(i + 1) * W2]

    @pl.when(tl_ref[t] == 1)
    def _():
        dq_ref[:] = dq_acc[:].astype(dq_ref.dtype)


def _hetero_fwd(gps, q_flat, plan, H, D, interpret):
    R, ET, T, nb = plan.R, plan.ET, plan.T, plan.nblocks
    F = H * D
    ngp = len(gps)
    Fp = F // ngp
    ts_np, _, Gt = _lane_layout(plan, plan.gather_len)
    kern = functools.partial(_fwd_kernel, R=R, ET=ET, H=H, D=D, ngp=ngp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, ET), lambda t, tb, tf, tl, ts: (t, 0, 0)),
        ] + [
            pl.BlockSpec((ET, Fp), lambda t, tb, tf, tl, ts: (ts[t], 0))
            for _ in range(ngp)
        ] + [
            pl.BlockSpec((R, F), lambda t, tb, tf, tl, ts: (tb[t], 0)),
        ],
        out_specs=[
            pl.BlockSpec((R, F), lambda t, tb, tf, tl, ts: (tb[t], 0)),
            pl.BlockSpec((1, R, H),
                         lambda t, tb, tf, tl, ts: (tb[t], 0, 0)),
            pl.BlockSpec((1, R, H),
                         lambda t, tb, tf, tl, ts: (tb[t], 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, H), jnp.float32),
            pltpu.VMEM((R, H), jnp.float32),
            pltpu.VMEM((R, F), jnp.float32),
        ],
    )
    out, m, l = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb * R, F), jnp.bfloat16),
            jax.ShapeDtypeStruct((nb, R, H), jnp.float32),
            jax.ShapeDtypeStruct((nb, R, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * R * ET * F * T,
            bytes_accessed=(plan.gather_len * F * 4
                            + (nb * R * F) * 2 * 2),
            transcendentals=T * R * ET * H,
        ),
        interpret=interpret,
    )(jnp.asarray(plan.tile_block), jnp.asarray(plan.tile_first),
      jnp.asarray(_tile_last(plan)), jnp.asarray(ts_np),
      jnp.asarray(plan.local_row.reshape(T, 1, ET)), *gps, q_flat)
    return out, m, l


def _hetero_bwd_kernelcall(gps, q_flat, g_blocks, m, l, c_blocks, plan,
                           H, D, interpret):
    R, ET, T, nb = plan.R, plan.ET, plan.T, plan.nblocks
    F = H * D
    ngp = len(gps)
    Fp = F // ngp
    W2 = 2 * F // ngp
    ts_np, wf_np, Gt = _lane_layout(plan, plan.gather_len)
    kern = functools.partial(_bwd_kernel, R=R, ET=ET, H=H, D=D, ngp=ngp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, ET),
                         lambda t, tb, tf, tl, ts, wf: (t, 0, 0)),
        ] + [
            pl.BlockSpec((ET, Fp),
                         lambda t, tb, tf, tl, ts, wf: (ts[t], 0))
            for _ in range(ngp)
        ] + [
            pl.BlockSpec((R, F),
                         lambda t, tb, tf, tl, ts, wf: (tb[t], 0)),
            pl.BlockSpec((R, F),
                         lambda t, tb, tf, tl, ts, wf: (tb[t], 0)),
            pl.BlockSpec((1, R, H),
                         lambda t, tb, tf, tl, ts, wf: (tb[t], 0, 0)),
            pl.BlockSpec((1, R, H),
                         lambda t, tb, tf, tl, ts, wf: (tb[t], 0, 0)),
            pl.BlockSpec((1, R, H),
                         lambda t, tb, tf, tl, ts, wf: (tb[t], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((ET, W2),
                         lambda t, tb, tf, tl, ts, wf: (ts[t], 0))
            for _ in range(ngp)
        ] + [
            pl.BlockSpec((R, F),
                         lambda t, tb, tf, tl, ts, wf: (tb[t], 0)),
        ],
        scratch_shapes=[pltpu.VMEM((R, F), jnp.float32)],
    )
    outs = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((plan.gather_len, W2), jnp.bfloat16)
            for _ in range(ngp)
        ] + [
            jax.ShapeDtypeStruct((nb * R, F), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * R * ET * F * T,
            bytes_accessed=(plan.gather_len * F * 4 * 2
                            + (nb * R * F) * 2 * 3),
            transcendentals=T * R * ET * H,
        ),
        interpret=interpret,
    )(jnp.asarray(plan.tile_block), jnp.asarray(plan.tile_first),
      jnp.asarray(_tile_last(plan)), jnp.asarray(ts_np),
      jnp.asarray(wf_np),
      jnp.asarray(plan.local_row.reshape(T, 1, ET)),
      *gps, q_flat, g_blocks, m, l, c_blocks)
    return tuple(outs[:ngp]), outs[ngp]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def hgt_flash_packed(kv, q_scaled, plan, interpret=False):
    """out[d, h] = sum_e softmax_d(<q_scaled[d,h], k[src_e,h]>)_e
    * v[src_e, h], all heads fused, one packed gather.

      kv       : (N_src, 2*H*D) bf16, columns [k | v]
      q_scaled : (N_dst, H, D) bf16 — fold the relation prior and the
                 1/sqrt(D) scale in BEFORE calling (their gradients
                 then flow outside this custom_vjp)
      plan     : window CSRPlan (build_csr_plan(..., window=True))
    Returns (N_dst, H*D) bf16. Differentiable w.r.t. kv and q_scaled.
    """
    out, _ = _fwd_impl(kv, q_scaled, plan, interpret)
    return out[:plan.num_nodes]


def _fwd_impl(kv, q_scaled, plan, interpret):
    interpret = interpret or jax.default_backend() != "tpu"
    N_dst, H, D = q_scaled.shape
    # MISCOMPILE GUARD (measured, round 5): when kv is produced by an
    # einsum/matmul inside the same jit, XLA fuses that producer into
    # pack_halves' bitcast chain and the fused gather emits garbage on
    # TPU (NaN logits; scripts/dbg_hetero4.py reproduces). The barrier
    # forces kv to materialize first — the concat producing kv
    # materializes anyway, so this costs nothing.
    kv = jax.lax.optimization_barrier(kv)
    p = pack_halves(kv)                            # (N_src, F) f32
    gsrc = jnp.asarray(plan.gsrc)
    ngp = _gather_parts(H * D, D)  # 1 unless forced — see docstring
    Fp = (H * D) // ngp
    gps = tuple(jnp.take(p[:, i * Fp:(i + 1) * Fp], gsrc, axis=0)
                for i in range(ngp))
    q_flat = _pad_dst(q_scaled.reshape(N_dst, H * D), plan)
    out, m, l = _hetero_fwd(gps, q_flat, plan, H, D, interpret)
    return out, (gps, q_flat, m, l)


def _fwd_vjp(kv, q_scaled, plan, interpret):
    out, res = _fwd_impl(kv, q_scaled, plan, interpret)
    return out[:plan.num_nodes], (res, out, kv.shape[0],
                                  q_scaled.shape)


def _bwd_vjp(plan, interpret, saved, g):
    interpret = interpret or jax.default_backend() != "tpu"
    (gps, q_flat, m, l), out, n_src, q_shape = saved
    N_dst, H, D = q_shape
    F = H * D
    nbR = plan.nblocks * plan.R
    g_pad = jnp.zeros((nbR, F), jnp.float32).at[:g.shape[0]].set(
        g.astype(jnp.float32))
    # c_row[h] = <out_row_h, g_row_h> — one streaming rowdot per head
    c = jnp.sum((out.astype(jnp.float32) * g_pad).reshape(nbR, H, D),
                axis=2).reshape(plan.nblocks, plan.R, H)
    dkv_parts, dq = _hetero_bwd_kernelcall(
        gps, q_flat, g_pad.astype(jnp.bfloat16), m, l, c, plan, H, D,
        interpret)
    # scatter the per-lane k|v cotangents back to source rows: one
    # transpose-plan SpMM PER column part, so each gather rides the
    # fast 512 B row class (the parts are the bwd kernel's separate
    # outputs — no slicing copies); concat restores [dk | dv]
    tp = _compact_transpose_plan(plan, n_src)
    scat = [spmm_csr(part, None, tp, interpret=interpret)[:n_src]
            for part in dkv_parts]
    dkv = scat[0] if len(scat) == 1 else jnp.concatenate(scat, axis=1)
    dq_out = dq[:N_dst].reshape(N_dst, H, D)
    return dkv.astype(jnp.bfloat16), dq_out.astype(jnp.bfloat16)


hgt_flash_packed.defvjp(_fwd_vjp, _bwd_vjp)
