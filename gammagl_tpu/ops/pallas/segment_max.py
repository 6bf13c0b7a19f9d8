"""Sorted segment MAX on TPU: segmented scan + one-hot segment-end pick.

The reference implements max-aggregation as a CUDA scatter-max with
arg-max tracking for backward (gammagl/mpops/torch_ext/cuda/
segment_max_cuda.cu:68-105). TPUs have no fast random scatter, and max
is not linear, so the sum kernel's weighted one-hot matmul
(segment_matmul.py) does not apply directly. This kernel exploits the
same dst-sorted tiling instead:

  1. **segmented max-scan** (Hillis-Steele, log2(ET) shifted maxima on
     the VPU): within an edge tile, rows are contiguous, so after the
     scan each segment's LAST edge holds the tile-local max;
  2. **one-hot pick** of those segment-end values into the (R, F) row
     block on the MXU — at most one end per row per tile, so the
     selection sum IS the value, and the same revisiting-accumulation
     as the sum kernel (`jnp.maximum` across a block's tiles) handles
     segments that span tiles.

Exactness (the backward depends on it): the pick runs as a matmul, and
bf16/bf16x3 matmul rounding would make `out[row] == msg[winner]` fail.
Values are therefore transported as FOUR 8-bit integer chunks of their
f32 bit pattern (each chunk 0..255 is exact in bf16; one-hot products
and the single-term accumulations are exact), reassembled with integer
shifts and bitcast back — the result is BITWISE equal to the winning
message. bf16 inputs need a single pass (bf16 one-hot x bf16 value is
exact). Empty rows come back 0, matching `ops.segment_max`.

Backward: d msg[e] = g[row(e), f] * [msg[e,f] == out[row(e), f]] / ties —
the tie count rides the segment-SUM kernel over the same plan, so the
whole VJP stays on the MXU path (reference analog: the argmax-scatter
backward, torch_ext/src/segment_max.cpp).

Measured (TPU v5e, arxiv scale E=2.3M, F=64): XLA scatter-max 40.6 ms
-> this kernel ~3-5 ms fwd; see profiler/kernel_bench.py.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gammagl_tpu.ops.pallas.segment_matmul import (
    BlockedCSRPlan, _edge_weights_padded, _segment_matmul, gather_rows)

__all__ = ["segment_max_csr", "spmm_max_csr", "segment_min_csr",
           "spmm_min_csr"]


def _cdiv(a, b):
    return -(-a // b)


def _shift_down(a, k, fill):
    """a'[i] = a[i-k] along axis 0 (first k rows = fill)."""
    pad = jnp.full((k,) + a.shape[1:], fill, a.dtype)
    return jnp.concatenate([pad, a[:-k]], axis=0)


def _max_run(plan):
    """Longest same-destination run within any tile (cached on the plan).

    The segmented scan only has to span the longest in-tile run — runs
    are cut at tile boundaries (cross-tile segments max-combine via the
    revisiting accumulation), so scan depth is ceil(log2(max_run)), not
    log2(ET). Real graphs have max degree << ET after tiling: arxiv
    needs 5 of 9 steps."""
    cached = getattr(plan, "_max_run", None)
    if cached is None:
        lr = plan.local_row.reshape(plan.T, plan.ET).astype(np.int64)
        # make rows unique across tiles so runs never span the reshape
        flat = (lr + (np.arange(plan.T)[:, None] * (plan.R + 2))).ravel()
        change = np.nonzero(np.diff(flat) != 0)[0]
        bounds = np.concatenate([[0], change + 1, [flat.size]])
        lens = np.diff(bounds)
        # ignore pad runs (local_row == R)
        is_real = plan.local_row[bounds[:-1]] < plan.R
        cached = int(lens[is_real].max()) if is_real.any() else 1
        plan._max_run = cached
    return cached


def _segment_max_pallas(msg, plan, interpret=False):
    """Sorted segment max; returns (nblocks*R, F) with -inf empty rows.

    msg: (E_pad, F) in padded plan order (pads masked by local_row == R,
    so no weight/validity input is needed).
    """
    interpret = interpret or jax.default_backend() != "tpu"
    R, ET, T = plan.R, plan.ET, plan.T
    E_pad, F = msg.shape
    assert E_pad == plan.E_pad, (E_pad, plan.E_pad)
    F_pad = _cdiv(F, 128) * 128
    if F_pad != F:
        msg = jnp.pad(msg, ((0, 0), (0, F_pad - F)))
    FT = min(512, F_pad)
    while F_pad % FT:
        FT //= 2
    lr_row = jnp.asarray(plan.local_row.reshape(T, 1, ET))
    lr_col = jnp.asarray(plan.local_row.reshape(T, ET, 1))
    f32_path = msg.dtype == jnp.float32
    max_run = _max_run(plan)

    def kernel(tb_ref, tf_ref, lrr_ref, lrc_ref, msg_ref, out_ref):
        t = pl.program_id(1)
        lrc = lrc_ref[0]                      # (ET, 1) i32
        valid = lrc < R                       # pads -> R
        m = msg_ref[:]
        neg = jnp.asarray(-jnp.inf, m.dtype)
        m = jnp.where(valid, m, neg)
        # segmented inclusive max-scan: rows are contiguous within the
        # tile, so equality of local_row k apart == same segment; depth
        # covers the longest in-tile run only (_max_run)
        k = 1
        while k < max_run:
            same = lrc == _shift_down(lrc, k, jnp.asarray(-1, lrc.dtype))
            m = jnp.where(same, jnp.maximum(m, _shift_down(m, k, neg)), m)
            k *= 2
        # segment ends: last edge of each row-run (the tile's final edge
        # is always an end; spanning segments max-combine across tiles)
        nxt = jnp.concatenate(
            [lrc[1:], jnp.full((1, 1), R + 1, lrc.dtype)], axis=0)
        end = valid & (lrc != nxt)            # (ET, 1)
        m_end = jnp.where(end, m, jnp.zeros((), m.dtype))  # finite
        sel = (jax.lax.broadcasted_iota(jnp.int32, (R, ET), 0)
               == lrr_ref[0])                 # (R, ET); pads never match
        oh = jnp.where(sel, 1.0, 0.0).astype(jnp.bfloat16)
        if f32_path:
            # EXACT value transport: 4 x 8-bit chunks of the f32 bit
            # pattern; each chunk is bf16-exact, each row picks <=1 term
            bits = jax.lax.bitcast_convert_type(m_end, jnp.int32)
            chunks = [((bits >> (8 * i)) & 0xFF).astype(jnp.bfloat16)
                      for i in range(4)]
            accs = [jnp.dot(oh, c, preferred_element_type=jnp.float32)
                    .astype(jnp.int32) for c in chunks]
            word = (accs[0] | (accs[1] << 8) | (accs[2] << 16)
                    | (accs[3] << 24))
            acc = jax.lax.bitcast_convert_type(word, jnp.float32)
        else:
            acc = jnp.dot(oh, m_end.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32
                          ).astype(m.dtype)
        has = jnp.max(jnp.where(sel, 1.0, 0.0), axis=1, keepdims=True) > 0
        contrib = jnp.where(has, acc.astype(out_ref.dtype),
                            jnp.asarray(-jnp.inf, out_ref.dtype))

        @pl.when(tf_ref[t] == 1)
        def _():
            out_ref[:] = contrib

        @pl.when(tf_ref[t] == 0)
        def _():
            out_ref[:] = jnp.maximum(out_ref[:], contrib)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(F_pad // FT, T),
        in_specs=[
            pl.BlockSpec((1, 1, ET), lambda f, t, tb, tf: (t, 0, 0)),
            pl.BlockSpec((1, ET, 1), lambda f, t, tb, tf: (t, 0, 0)),
            pl.BlockSpec((ET, FT), lambda f, t, tb, tf: (t, f)),
        ],
        out_specs=pl.BlockSpec((R, FT), lambda f, t, tb, tf: (tb[t], f)),
    )
    npass = 4 if f32_path else 1
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.nblocks * R, F_pad),
                                       msg.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * npass * R * ET * F_pad * T,
            bytes_accessed=(E_pad * F_pad + plan.nblocks * R * F_pad)
            * msg.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(plan.tile_block), jnp.asarray(plan.tile_first),
      lr_row, lr_col, msg)
    return out[:, :F]


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _segment_max(msg, plan, interpret=False):
    return _segment_max_pallas(msg, plan, interpret)


def _segment_max_fwd(msg, plan, interpret=False):
    out = _segment_max_pallas(msg, plan, interpret)
    return out, (msg, out)


def _segment_max_bwd(plan, interpret, res, g):
    # winners by bitwise equality with the (exact) forward output; ties
    # split the cotangent evenly — the tie count is a segment SUM over
    # the same plan, so backward stays on the MXU kernel too
    msg, out = res
    rows = jnp.asarray(np.minimum(plan.row_global,
                                  plan.nblocks * plan.R - 1))
    valid = jnp.asarray(plan.valid)[:, None]
    out_rows = jnp.take(out, rows, axis=0)
    eq = (msg == out_rows) & valid
    eqf = eq.astype(jnp.float32)
    cnt = _segment_matmul(eqf, valid[:, 0].astype(jnp.float32), plan,
                          interpret)
    cnt_rows = jnp.take(cnt, rows, axis=0)
    g_rows = jnp.take(g.astype(jnp.float32), rows, axis=0)
    dmsg = jnp.where(eq, g_rows / jnp.maximum(cnt_rows, 1.0), 0.0)
    return (dmsg.astype(msg.dtype),)


_segment_max.defvjp(_segment_max_fwd, _segment_max_bwd)


def segment_max_csr(msg_pad, plan, interpret=False):
    """Segment-max of messages already in the plan's padded order.

    Returns (num_nodes, F); empty rows are 0 (reference semantics,
    `ops.segment_max`). Differentiable w.r.t. ``msg_pad`` (argmax
    subgradient, ties split evenly).
    """
    out = _segment_max(msg_pad, plan, interpret)[:plan.num_nodes]
    return jnp.where(jnp.isneginf(out), jnp.zeros((), out.dtype), out)


def spmm_max_csr(x, edge_weight, plan, interpret=False,
                 weights_padded=False):
    """out[d] = max_{(s,d)} w_sd * x[s] on the Pallas max kernel.

    Accepts a `CSRPlan` or `BlockedCSRPlan` (per-source-block partials
    combine with `maximum`, so the >100MB gather regime splits the same
    way as the sum path). The gather VJP rides `gather_rows` (kernel-
    backed scatter-add of the winner cotangents).
    """
    if isinstance(plan, BlockedCSRPlan):
        out = None
        for sub in plan.blocks:
            part = _spmm_max_one(x, edge_weight, sub, interpret,
                                 weights_padded)
            out = part if out is None else jnp.maximum(out, part)
        out = out[:plan.num_nodes]
        return jnp.where(jnp.isneginf(out), jnp.zeros((), out.dtype), out)
    out = _spmm_max_one(x, edge_weight, plan, interpret,
                        weights_padded)[:plan.num_nodes]
    return jnp.where(jnp.isneginf(out), jnp.zeros((), out.dtype), out)


def _spmm_max_one(x, edge_weight, plan, interpret, weights_padded):
    msg = gather_rows(x, plan, "src")
    if edge_weight is not None:
        w_pad = (edge_weight if weights_padded
                 else _edge_weights_padded(edge_weight, plan, x.dtype))
        msg = msg * w_pad[:, None].astype(msg.dtype)
    return _segment_max(msg, plan, interpret)


def segment_min_csr(msg_pad, plan, interpret=False):
    """Segment-min on the same kernel: min(x) = -max(-x). Negation is
    bitwise-exact (sign-bit flip), so the f32 exactness and the VJP's
    equality winners carry over; empty rows are 0 (`ops.segment_min`)."""
    out = -_segment_max(-msg_pad, plan, interpret)[:plan.num_nodes]
    return jnp.where(jnp.isposinf(out), jnp.zeros((), out.dtype), out)


def spmm_min_csr(x, edge_weight, plan, interpret=False,
                 weights_padded=False):
    """out[d] = min_{(s,d)} w_sd * x[s] (see `spmm_max_csr`)."""
    if isinstance(plan, BlockedCSRPlan):
        out = None
        for sub in plan.blocks:
            part = -_spmm_max_neg_one(x, edge_weight, sub, interpret,
                                      weights_padded)
            out = part if out is None else jnp.minimum(out, part)
        out = out[:plan.num_nodes]
        return jnp.where(jnp.isposinf(out), jnp.zeros((), out.dtype), out)
    out = -_spmm_max_neg_one(x, edge_weight, plan, interpret,
                             weights_padded)[:plan.num_nodes]
    return jnp.where(jnp.isposinf(out), jnp.zeros((), out.dtype), out)


def _spmm_max_neg_one(x, edge_weight, plan, interpret, weights_padded):
    """max of NEGATED weighted messages (min building block; the weight
    multiply happens before negation so w*x semantics match the XLA
    reduce='min' path)."""
    msg = gather_rows(x, plan, "src")
    if edge_weight is not None:
        w_pad = (edge_weight if weights_padded
                 else _edge_weights_padded(edge_weight, plan, x.dtype))
        msg = msg * w_pad[:, None].astype(msg.dtype)
    return _segment_max(-msg, plan, interpret)
