"""Flash-style fused edge attention: score -> softmax -> aggregate, ONE pass.

The reference runs GAT attention as three passes over edges (score SDDMM,
segment softmax, weighted scatter: gat_conv.py:100-112 + utils/softmax.py:10
+ bspmm), each a separate kernel with its own HBM round-trip over per-edge
tensors. This kernel fuses the whole pipeline with the *online softmax*
trick (flash-attention over graph segments): edges are destination-sorted
into R-row blocks (the CSRPlan layout), and per row we maintain a running
max `m`, denominator `l`, and an unnormalized accumulator in VMEM scratch,
rescaled as new edge tiles arrive. One pass over the gathered messages, no
per-edge probability tensor ever hits HBM, and the normalization is exact
(identical math to max-shifted softmax, reassociated).

Score model (GAT-style additive attention, gat_conv.py:96-100):
    s_e = leaky_relu(s_src[e] + a_dst[row(e)], slope)
`s_src` rides the feature gather (append the per-head source score as an
extra feature column, gather once, slice outside); `a_dst` is dense per
destination row and loads as one (1, R) block per tile — no second gather.

Backward uses the decomposed XLA path (recompute alpha; the standard
softmax VJP), so training gets the fused forward for free while the
backward matches the reference's hand-written gather/scatter gradients.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gammagl_tpu.ops.pallas.segment_matmul import CSRPlan

__all__ = ["flash_edge_attention"]

_NEG = -1e30  # -inf stand-in that survives exp/rescale arithmetic


def _cdiv(a, b):
    return -(-a // b)


def _tile_last(plan: CSRPlan):
    """1 for the final tile of each row block (where the normalized output
    is written)."""
    tl = np.zeros(plan.T, np.int32)
    for t in range(plan.T):
        if t + 1 == plan.T or plan.tile_block[t + 1] != plan.tile_block[t]:
            tl[t] = 1
    return tl


def _flash_kernel(tb_ref, tf_ref, tl_ref, lr_ref, ssrc_ref, adst_ref,
                  msg_ref, out_ref, m_ref, l_ref, acc_ref, *, R, ET,
                  slope, f32_msg):
    t = pl.program_id(1)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (R, ET), 0) == lr_ref[0])

    @pl.when(tf_ref[t] == 1)
    def _():
        m_ref[:] = jnp.full((R, 1), _NEG, jnp.float32)
        l_ref[:] = jnp.zeros((R, 1), jnp.float32)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # scores: s[r, e] = leaky_relu(s_src[e] + a_dst[r]) where edge e lands
    # in local row r; invalid (r, e) pairs masked to -inf.
    s = ssrc_ref[0] + adst_ref[0, 0].reshape(R, 1)
    s = jnp.where(s >= 0, s, slope * s)
    s = jnp.where(sel, s, _NEG)

    m_old = m_ref[:]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    # rows untouched so far keep m == _NEG; exp(_NEG - _NEG) would be
    # exp(0) = 1 which is fine (acc and l are 0), but guard the rescale
    # against (-inf) - (-inf) style NaNs from the stand-in arithmetic.
    scale = jnp.exp(jnp.minimum(m_old - m_new, 0.0))
    p = jnp.where(sel, jnp.exp(s - m_new), 0.0)

    l_ref[:] = l_ref[:] * scale + jnp.sum(p, axis=1, keepdims=True)
    msg = msg_ref[:]
    if f32_msg:
        # bf16x3: exact-split p and msg, drop only the lo*lo term
        p_hi_f = p.astype(jnp.bfloat16).astype(jnp.float32)
        p_lo_f = p - p_hi_f
        m_hi = msg.astype(jnp.bfloat16)
        m_lo = (msg - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        p_hi = p_hi_f.astype(jnp.bfloat16)
        p_lo = p_lo_f.astype(jnp.bfloat16)
        upd = (jnp.dot(p_hi, m_hi, preferred_element_type=jnp.float32)
               + jnp.dot(p_hi, m_lo, preferred_element_type=jnp.float32)
               + jnp.dot(p_lo, m_hi, preferred_element_type=jnp.float32))
    else:
        upd = jnp.dot(p.astype(msg.dtype), msg,
                      preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * scale + upd
    m_ref[:] = m_new

    @pl.when(tl_ref[t] == 1)
    def _():
        out_ref[:] = (acc_ref[:] /
                      jnp.maximum(l_ref[:], 1e-16)).astype(out_ref.dtype)


def _flash_forward(s_src_pad, a_dst, msg, plan, slope, interpret):
    # auto-interpret off-TPU so library callers never thread the flag
    interpret = interpret or jax.default_backend() != "tpu"
    R, ET, T = plan.R, plan.ET, plan.T
    E_pad, F = msg.shape
    assert E_pad == plan.E_pad
    nb = plan.nblocks
    F_pad = _cdiv(F, 128) * 128
    if F_pad != F:
        msg = jnp.pad(msg, ((0, 0), (0, F_pad - F)))
    FT = min(512, F_pad)
    while F_pad % FT:
        FT //= 2

    local_row = jnp.asarray(plan.local_row.reshape(T, 1, ET))
    ssrc = s_src_pad.astype(jnp.float32).reshape(T, 1, ET)
    # pad a_dst rows to nb*R and lay out (nb, R) so one block row per tile
    # (nb, 1, R) so the trailing block dims satisfy Mosaic's (8,128)/equal
    # rule, like local_row's (T, 1, ET) layout
    a_full = jnp.zeros((nb * R,), jnp.float32).at[:a_dst.shape[0]].set(
        a_dst.astype(jnp.float32)).reshape(nb, 1, R)

    kern = functools.partial(
        _flash_kernel, R=R, ET=ET, slope=slope,
        f32_msg=msg.dtype == jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(F_pad // FT, T),
        in_specs=[
            pl.BlockSpec((1, 1, ET), lambda f, t, tb, tf, tl: (t, 0, 0)),
            pl.BlockSpec((1, 1, ET), lambda f, t, tb, tf, tl: (t, 0, 0)),
            pl.BlockSpec((1, 1, R), lambda f, t, tb, tf, tl: (tb[t], 0, 0)),
            pl.BlockSpec((ET, FT), lambda f, t, tb, tf, tl: (t, f)),
        ],
        out_specs=pl.BlockSpec((R, FT), lambda f, t, tb, tf, tl: (tb[t], f)),
        scratch_shapes=[
            pltpu.VMEM((R, 1), jnp.float32),
            pltpu.VMEM((R, 1), jnp.float32),
            pltpu.VMEM((R, FT), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * R, F_pad), msg.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * ET * F_pad * T,
            bytes_accessed=(E_pad * F_pad + nb * R * F_pad)
            * msg.dtype.itemsize,
            transcendentals=E_pad * R,
        ),
        interpret=interpret,
    )(jnp.asarray(plan.tile_block), jnp.asarray(plan.tile_first),
      jnp.asarray(_tile_last(plan)), local_row, ssrc, a_full, msg)
    return out[:, :F]


def _alpha_xla(s_src_pad, a_dst, plan, slope):
    """Reference-path edge softmax in plan order (for the backward)."""
    rows = jnp.asarray(plan.row_global.astype(np.int32))
    rows_c = jnp.asarray(np.minimum(plan.row_global, plan.nblocks * plan.R
                                    - 1))
    valid = jnp.asarray(plan.valid)
    a_full = jnp.zeros((plan.nblocks * plan.R,), a_dst.dtype).at[
        :a_dst.shape[0]].set(a_dst)
    s = s_src_pad.astype(jnp.float32) + a_full.astype(jnp.float32)[rows_c]
    s = jnp.where(s >= 0, s, slope * s)
    s = jnp.where(valid, s, -jnp.inf)
    mx = jax.ops.segment_max(s, rows, num_segments=plan.nblocks * plan.R)
    mx = jnp.where(jnp.isneginf(mx), 0.0, mx)
    e = jnp.where(valid, jnp.exp(s - mx[rows_c]), 0.0)
    den = jax.ops.segment_sum(e, rows, num_segments=plan.nblocks * plan.R)
    alpha = e / (den[rows_c] + 1e-16)
    s_pre = s_src_pad.astype(jnp.float32) + a_full.astype(jnp.float32)[
        rows_c]
    return alpha, s_pre, rows, rows_c, valid


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_edge_attention(s_src_pad, a_dst, msg, plan, slope=0.2,
                         interpret=False):
    """out[d] = sum_e softmax_d(leaky_relu(s_src + a_dst[d]))_e * msg[e].

    Single fused Pallas pass (online softmax). Inputs are in the plan's
    padded destination-sorted order:
      s_src_pad : (E_pad,) per-edge source score contribution
      a_dst     : (num_nodes,) per-destination score contribution
      msg       : (E_pad, F) gathered source features
    Returns (num_nodes, F). Differentiable w.r.t. all three tensor args.
    """
    out = _flash_forward(s_src_pad, a_dst, msg, plan, slope, interpret)
    return out[:plan.num_nodes]


def _fwd(s_src_pad, a_dst, msg, plan, slope, interpret):
    out = flash_edge_attention(s_src_pad, a_dst, msg, plan, slope,
                               interpret)
    return out, (s_src_pad, a_dst, msg)


def _bwd(plan, slope, interpret, res, g):
    s_src_pad, a_dst, msg = res
    alpha, s_pre, rows, rows_c, valid = _alpha_xla(s_src_pad, a_dst, plan,
                                                   slope)
    g = g.astype(jnp.float32)
    g_pad = jnp.zeros((plan.nblocks * plan.R, g.shape[1]), jnp.float32
                      ).at[:g.shape[0]].set(g)
    g_rows = jnp.take(g_pad, rows_c, axis=0)
    msf = msg.astype(jnp.float32)
    dmsg = (alpha[:, None] * g_rows).astype(msg.dtype)
    dalpha = jnp.sum(g_rows * msf, axis=-1)
    # softmax VJP over segments: ds = alpha * (dalpha - sum_seg alpha*dalpha)
    inner = jax.ops.segment_sum(alpha * dalpha, rows,
                                num_segments=plan.nblocks * plan.R)
    ds = alpha * (dalpha - inner[rows_c])
    ds = ds * jnp.where(s_pre >= 0, 1.0, slope)   # leaky_relu VJP
    ds = jnp.where(valid, ds, 0.0)
    ds_src = ds.astype(s_src_pad.dtype)
    da_full = jax.ops.segment_sum(ds, rows,
                                  num_segments=plan.nblocks * plan.R)
    da_dst = da_full[:a_dst.shape[0]].astype(a_dst.dtype)
    return ds_src, da_dst, dmsg


flash_edge_attention.defvjp(_fwd, _bwd)
