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

Backward is ALSO one fused Pallas pass (flash-attention-style): the forward
saves the per-row softmax statistics (m, l), so the backward recomputes
alpha tile-locally (never materializing it in HBM) and emits all three
gradients per edge tile:
    dmsg_e  = alpha_e * g[row(e)]                       (one MXU matmul)
    dalpha  = <g[row], msg_e>                           (one MXU matmul)
    ds_e    = alpha_e * (dalpha_e - c_row) * leaky'(s)  (VPU)
    da_dst  = segment-sum of ds (output-block revisiting accumulation)
with c_row = <out_row, g_row> computed outside as one streaming rowdot.
Graphs with per-head F > 512 fall back to the decomposed XLA VJP (GAT
heads are 8-64 dims; the fallback keeps the API total).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gammagl_tpu.ops.pallas.segment_matmul import CSRPlan

__all__ = ["flash_edge_attention", "flash_edge_attention_mh",
           "flash_softmax_spmm", "flash_softmax_spmm_mh",
           "attention_keep_mask"]


def attention_keep_mask(rng, rate, shape):
    """Pre-scaled fused-dropout weights for `keep_pad`: values
    {0, 1/(1-rate)} of the given shape ((E_pad,) or (E_pad, H))."""
    kp = 1.0 - rate
    return jax.random.bernoulli(rng, kp, shape).astype(jnp.float32) / kp

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


def _dot3(a, b, dims, f32):
    """dot_general with f32 accumulation; for f32 inputs use the manual
    bf16x3 split (Mosaic's HIGHEST f32 path is ~2x slower), for bf16
    inputs a single pass (see segment_matmul.py for the rationale)."""
    dn = (dims, ((), ()))
    if not f32:
        return jax.lax.dot_general(a, b, dn,
                                   preferred_element_type=jnp.float32)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jax.lax.dot_general(a_hi, b_hi, dn,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(a_hi, b_lo, dn,
                                  preferred_element_type=jnp.float32)
            + jax.lax.dot_general(a_lo, b_hi, dn,
                                  preferred_element_type=jnp.float32))


def _flash_kernel(tb_ref, tf_ref, tl_ref, lr_ref, ssrc_ref, adst_ref,
                  *rest, R, ET, slope, f32_msg, has_mask, tid=1):
    if has_mask:
        (mask_ref, msg_ref, out_ref, m_out_ref, l_out_ref,
         m_ref, l_ref, acc_ref) = rest
    else:
        (msg_ref, out_ref, m_out_ref, l_out_ref,
         m_ref, l_ref, acc_ref) = rest
    t = pl.program_id(tid)
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
    if has_mask:
        # post-softmax alpha dropout: the denominator keeps the full
        # softmax mass (dropout scales alpha AFTER normalization), so the
        # mask (pre-scaled by 1/keep) only weights the accumulator.
        p = p * mask_ref[0]
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
        m_out_ref[:] = m_ref[:].reshape(1, 1, R)
        l_out_ref[:] = l_ref[:].reshape(1, 1, R)


def _flash_forward(s_src_pad, a_dst, msg, plan, slope, interpret,
                   keep_pad=None):
    """Single-head forward: the H=1 slice of the multi-head launch (all
    reshapes below are layout no-ops at H=1 — one implementation keeps
    the BlockSpecs/scratch/cost logic in exactly one place).
    Returns (out (nb*R, F), m (nb,1,R), l (nb,1,R))."""
    out, m, l = _flash_forward_mh(
        s_src_pad.reshape(-1, 1), a_dst.reshape(-1, 1), msg[:, None, :],
        plan, slope, interpret,
        None if keep_pad is None else keep_pad.reshape(-1, 1))
    return out[0], m, l


def _flash_bwd_kernel(tb_ref, tf_ref, tl_ref, lr_ref, ssrc_ref, adst_ref,
                      *rest, R, ET, slope, f32_msg, has_mask, tid=0):
    if has_mask:
        (mask_ref, m_ref, l_ref, c_ref, msg_ref, g_ref,
         dss_ref, da_ref, dmsg_ref, da_acc) = rest
    else:
        (m_ref, l_ref, c_ref, msg_ref, g_ref,
         dss_ref, da_ref, dmsg_ref, da_acc) = rest
    t = pl.program_id(tid)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (R, ET), 0) == lr_ref[0])

    s_pre = ssrc_ref[0] + adst_ref[0, 0].reshape(R, 1)       # (R, ET)
    s = jnp.where(s_pre >= 0, s_pre, slope * s_pre)
    m = m_ref[0, 0].reshape(R, 1)
    l = jnp.maximum(l_ref[0, 0].reshape(R, 1), 1e-16)
    # exact softmax from the saved statistics; zero at invalid pairs.
    # s <= m for valid pairs (m is the row max), so the min() clamp only
    # guards pad arithmetic (untouched rows keep m = _NEG).
    alpha = jnp.where(sel, jnp.exp(jnp.minimum(s - m, 0.0)) / l, 0.0)

    msg = msg_ref[:]
    g = g_ref[:]
    gf = g.astype(jnp.float32)

    # dalpha[r, e] = <g_r, msg_e>  -- contract the feature dim
    dalpha = _dot3(gf if f32_msg else g, msg, ((1,), (1,)), f32_msg)
    if has_mask:
        # out already folds the mask, so c = <out, g> is the masked inner
        # sum; the per-edge path gets the mask weight explicitly.
        dalpha = dalpha * mask_ref[0]
        alpha_w = alpha * mask_ref[0]
    else:
        alpha_w = alpha
    c = c_ref[0, 0].reshape(R, 1)
    ds = alpha * (dalpha - c)
    ds = ds * jnp.where(s_pre >= 0, 1.0, slope)               # leaky' VJP
    ds = jnp.where(sel, ds, 0.0)

    # per-edge score grad: exactly one valid row per edge -> column sum
    dss_ref[:] = jnp.sum(ds, axis=0).reshape(1, 1, ET)

    # dmsg[e] = alpha_e * g_row(e): contract the R dim of alpha with g
    if f32_msg:
        dmsg = _dot3(alpha_w, gf, ((0,), (0,)), True)
    else:
        dmsg = _dot3(alpha_w.astype(jnp.bfloat16), g, ((0,), (0,)), False)
    dmsg_ref[:] = dmsg.astype(dmsg_ref.dtype)

    # da_dst[r] = sum over this block's edges; accumulate across the
    # block's tiles via output revisiting
    rowsum = jnp.sum(ds, axis=1).reshape(1, 1, R)

    @pl.when(tf_ref[t] == 1)
    def _():
        da_acc[:] = rowsum

    @pl.when(tf_ref[t] == 0)
    def _():
        da_acc[:] = da_acc[:] + rowsum

    @pl.when(tl_ref[t] == 1)
    def _():
        da_ref[:] = da_acc[:]


def _flash_backward(s_src_pad, a_dst, msg, m, l, c_blocks, g_pad, plan,
                    slope, interpret, keep_pad=None):
    """Single-head fused gradients via the H=1 multi-head launch.
    Returns (ds_src (E_pad,), da_full (nb*R,), dmsg (E_pad, F))."""
    dss, da, dmsg = _flash_backward_mh(
        s_src_pad.reshape(-1, 1), a_dst.reshape(-1, 1), msg, m, l,
        c_blocks, g_pad, plan, slope, interpret,
        None if keep_pad is None else keep_pad.reshape(-1, 1))
    return dss.reshape(-1), da.reshape(-1), dmsg[:, 0, :]


def _alpha_xla(s_src_pad, a_dst, plan, slope):
    """Reference-path edge softmax in plan order (for the fallback
    backward when per-head F exceeds the fused kernel's single-tile
    limit)."""
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
                         interpret=False, keep_pad=None):
    """out[d] = sum_e softmax_d(leaky_relu(s_src + a_dst[d]))_e * msg[e].

    Single fused Pallas pass (online softmax). Inputs are in the plan's
    padded destination-sorted order:
      s_src_pad : (E_pad,) per-edge source score contribution
      a_dst     : (num_nodes,) per-destination score contribution
      msg       : (E_pad, F) gathered source features
      keep_pad  : optional (E_pad,) post-softmax alpha weights -- the
                  fused form of attention dropout (values {0, 1/keep});
                  treated as non-differentiable (zero cotangent).
    Returns (num_nodes, F). Differentiable w.r.t. the three tensor args;
    the backward is a second fused Pallas pass (XLA fallback for F > 512).
    """
    out, _, _ = _flash_forward(s_src_pad, a_dst, msg, plan, slope,
                               interpret, keep_pad)
    return out[:plan.num_nodes]


def _fwd(s_src_pad, a_dst, msg, plan, slope, interpret, keep_pad=None):
    out, m, l = _flash_forward(s_src_pad, a_dst, msg, plan, slope,
                               interpret, keep_pad)
    return out[:plan.num_nodes], (s_src_pad, a_dst, msg, m, l, out,
                                  keep_pad)


def _bwd_xla(plan, slope, res, g):
    s_src_pad, a_dst, msg, keep_pad = res
    alpha, s_pre, rows, rows_c, valid = _alpha_xla(s_src_pad, a_dst, plan,
                                                   slope)
    g = g.astype(jnp.float32)
    g_pad = jnp.zeros((plan.nblocks * plan.R, g.shape[1]), jnp.float32
                      ).at[:g.shape[0]].set(g)
    g_rows = jnp.take(g_pad, rows_c, axis=0)
    msf = msg.astype(jnp.float32)
    dalpha = jnp.sum(g_rows * msf, axis=-1)
    if keep_pad is not None:
        w = keep_pad.astype(jnp.float32)
        dalpha = dalpha * w
        alpha_w = alpha * w
    else:
        alpha_w = alpha
    dmsg = (alpha_w[:, None] * g_rows).astype(msg.dtype)
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
    dkeep = None if keep_pad is None else jnp.zeros_like(keep_pad)
    return ds_src, da_dst, dmsg, dkeep


def _bwd(plan, slope, interpret, res, g):
    s_src_pad, a_dst, msg, m, l, out, keep_pad = res
    F = msg.shape[1]
    if _cdiv(F, 128) * 128 > 512:
        return _bwd_xla(plan, slope, (s_src_pad, a_dst, msg, keep_pad), g)
    nbR = plan.nblocks * plan.R
    g = g.astype(jnp.float32)
    g_pad = jnp.zeros((nbR, g.shape[1]), jnp.float32).at[:g.shape[0]].set(g)
    if msg.dtype != jnp.float32:
        g_in = g_pad.astype(msg.dtype)
    else:
        g_in = g_pad
    # c_row = <out_row, g_row>: one streaming rowdot (out is the fwd
    # output, already padded to nb*R rows)
    c = jnp.sum(out.astype(jnp.float32) * g_pad, axis=1)
    c_blocks = c.reshape(plan.nblocks, 1, plan.R)
    ds_src, da_full, dmsg = _flash_backward(
        s_src_pad, a_dst, msg, m, l, c_blocks, g_in, plan, slope,
        interpret, keep_pad)
    dkeep = None if keep_pad is None else jnp.zeros_like(keep_pad)
    return (ds_src.astype(s_src_pad.dtype),
            da_full[:a_dst.shape[0]].astype(a_dst.dtype),
            dmsg.astype(msg.dtype), dkeep)


flash_edge_attention.defvjp(_fwd, _bwd)


def _flash_forward_mh(s_src_pad, a_dst, msg, plan, slope, interpret,
                      keep_pad=None):
    """Multi-head forward: ONE pallas_call with the head on the grid.

    s_src_pad (E_pad, H) / a_dst (N, H) / msg (E_pad, H, F) /
    keep_pad (E_pad, H). Returns (out (H, nb*R, F), m (H*nb,1,R),
    l (H*nb,1,R)). Head h's blocks stack along the leading dim of every
    operand, so the 3-D layouts (and the single-head kernel body) are
    reused verbatim — only the index maps gain `h*T + t` / `h*nb + tb[t]`
    offsets.
    """
    interpret = interpret or jax.default_backend() != "tpu"
    R, ET, T = plan.R, plan.ET, plan.T
    E_pad, H, F = msg.shape
    assert E_pad == plan.E_pad
    nb = plan.nblocks
    F_pad = _cdiv(F, 128) * 128
    msg = msg.transpose(1, 0, 2).reshape(H * E_pad, F)
    if F_pad != F:
        msg = jnp.pad(msg, ((0, 0), (0, F_pad - F)))
    FT = min(512, F_pad)
    while F_pad % FT:
        FT //= 2
    nf = F_pad // FT

    local_row = jnp.asarray(plan.local_row.reshape(T, 1, ET))
    ssrc = s_src_pad.astype(jnp.float32).T.reshape(H * T, 1, ET)
    a_full = jnp.zeros((H, nb * R), jnp.float32).at[
        :, :a_dst.shape[0]].set(a_dst.astype(jnp.float32).T
                                ).reshape(H * nb, 1, R)

    has_mask = keep_pad is not None
    mask_in, mask_spec = (), ()
    if has_mask:
        mask_in = (keep_pad.astype(jnp.float32).T.reshape(H * T, 1, ET),)
        mask_spec = (pl.BlockSpec(
            (1, 1, ET), lambda h, f, t, tb, tf, tl: (h * T + t, 0, 0)),)

    kern = functools.partial(
        _flash_kernel, R=R, ET=ET, slope=slope,
        f32_msg=msg.dtype == jnp.float32, has_mask=has_mask, tid=2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(H, nf, T),
        in_specs=[
            pl.BlockSpec((1, 1, ET),
                         lambda h, f, t, tb, tf, tl: (t, 0, 0)),
            pl.BlockSpec((1, 1, ET),
                         lambda h, f, t, tb, tf, tl: (h * T + t, 0, 0)),
            pl.BlockSpec((1, 1, R),
                         lambda h, f, t, tb, tf, tl: (h * nb + tb[t], 0, 0)),
            *mask_spec,
            pl.BlockSpec((ET, FT),
                         lambda h, f, t, tb, tf, tl: (h * T + t, f)),
        ],
        out_specs=[
            pl.BlockSpec((R, FT),
                         lambda h, f, t, tb, tf, tl: (h * nb + tb[t], f)),
            pl.BlockSpec((1, 1, R),
                         lambda h, f, t, tb, tf, tl: (h * nb + tb[t], 0, 0)),
            pl.BlockSpec((1, 1, R),
                         lambda h, f, t, tb, tf, tl: (h * nb + tb[t], 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, 1), jnp.float32),
            pltpu.VMEM((R, 1), jnp.float32),
            pltpu.VMEM((R, FT), jnp.float32),
        ],
    )
    out, m, l = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((H * nb * R, F_pad), msg.dtype),
            jax.ShapeDtypeStruct((H * nb, 1, R), jnp.float32),
            jax.ShapeDtypeStruct((H * nb, 1, R), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * R * ET * F_pad * T * H,
            bytes_accessed=H * (E_pad * F_pad + nb * R * F_pad)
            * msg.dtype.itemsize,
            transcendentals=H * E_pad * R,
        ),
        interpret=interpret,
    )(jnp.asarray(plan.tile_block), jnp.asarray(plan.tile_first),
      jnp.asarray(_tile_last(plan)), local_row, ssrc, a_full, *mask_in,
      msg)
    return out.reshape(H, nb * R, F_pad)[:, :, :F], m, l


def _flash_backward_mh(s_src_pad, a_dst, msg, m, l, c_blocks, g_pad, plan,
                       slope, interpret, keep_pad=None):
    """Multi-head fused gradients. msg (H*E_pad, F_pad-able), g_pad
    (H*nb*R, F). Returns (dss (E_pad, H), da (N-extended (H, nb*R)),
    dmsg (H, E_pad, F))."""
    interpret = interpret or jax.default_backend() != "tpu"
    R, ET, T, nb = plan.R, plan.ET, plan.T, plan.nblocks
    E_pad = plan.E_pad
    H = s_src_pad.shape[1]
    F = msg.shape[1]
    F_pad = _cdiv(F, 128) * 128
    if F_pad != F:
        msg = jnp.pad(msg, ((0, 0), (0, F_pad - F)))
        g_pad = jnp.pad(g_pad, ((0, 0), (0, F_pad - F)))

    local_row = jnp.asarray(plan.local_row.reshape(T, 1, ET))
    ssrc = s_src_pad.astype(jnp.float32).T.reshape(H * T, 1, ET)
    a_full = jnp.zeros((H, nb * R), jnp.float32).at[
        :, :a_dst.shape[0]].set(a_dst.astype(jnp.float32).T
                                ).reshape(H * nb, 1, R)

    has_mask = keep_pad is not None
    mask_in, mask_spec = (), ()
    if has_mask:
        mask_in = (keep_pad.astype(jnp.float32).T.reshape(H * T, 1, ET),)
        mask_spec = (pl.BlockSpec(
            (1, 1, ET), lambda h, t, tb, tf, tl: (h * T + t, 0, 0)),)

    kern = functools.partial(
        _flash_bwd_kernel, R=R, ET=ET, slope=slope,
        f32_msg=msg.dtype == jnp.float32, has_mask=has_mask, tid=1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(H, T),
        in_specs=[
            pl.BlockSpec((1, 1, ET), lambda h, t, tb, tf, tl: (t, 0, 0)),
            pl.BlockSpec((1, 1, ET),
                         lambda h, t, tb, tf, tl: (h * T + t, 0, 0)),
            pl.BlockSpec((1, 1, R),
                         lambda h, t, tb, tf, tl: (h * nb + tb[t], 0, 0)),
            *mask_spec,
            pl.BlockSpec((1, 1, R),
                         lambda h, t, tb, tf, tl: (h * nb + tb[t], 0, 0)),
            pl.BlockSpec((1, 1, R),
                         lambda h, t, tb, tf, tl: (h * nb + tb[t], 0, 0)),
            pl.BlockSpec((1, 1, R),
                         lambda h, t, tb, tf, tl: (h * nb + tb[t], 0, 0)),
            pl.BlockSpec((ET, F_pad),
                         lambda h, t, tb, tf, tl: (h * T + t, 0)),
            pl.BlockSpec((R, F_pad),
                         lambda h, t, tb, tf, tl: (h * nb + tb[t], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, ET),
                         lambda h, t, tb, tf, tl: (h * T + t, 0, 0)),
            pl.BlockSpec((1, 1, R),
                         lambda h, t, tb, tf, tl: (h * nb + tb[t], 0, 0)),
            pl.BlockSpec((ET, F_pad),
                         lambda h, t, tb, tf, tl: (h * T + t, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((1, 1, R), jnp.float32)],
    )
    dss, da, dmsg = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((H * T, 1, ET), jnp.float32),
            jax.ShapeDtypeStruct((H * nb, 1, R), jnp.float32),
            jax.ShapeDtypeStruct((H * E_pad, F_pad), msg.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * R * ET * F_pad * T * H,
            bytes_accessed=2 * H * (E_pad * F_pad + nb * R * F_pad)
            * msg.dtype.itemsize,
            transcendentals=H * E_pad * R,
        ),
        interpret=interpret,
    )(jnp.asarray(plan.tile_block), jnp.asarray(plan.tile_first),
      jnp.asarray(_tile_last(plan)), local_row, ssrc, a_full, *mask_in,
      m, l, c_blocks, msg, g_pad)
    return (dss.reshape(H, E_pad).T,
            da.reshape(H, nb * R),
            dmsg.reshape(H, E_pad, F_pad)[:, :, :F].transpose(1, 0, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_edge_attention_mh(s_src_pad, a_dst, msg, plan, slope=0.2,
                            interpret=False, keep_pad=None):
    """Multi-head `flash_edge_attention`: ONE pallas_call over an
    (H, F, T) grid instead of a per-head Python loop (one kernel launch
    and one XLA graph node for all heads — smaller graphs, faster
    compiles, identical math).

      s_src_pad (E_pad, H) / a_dst (N, H) / msg (E_pad, H, F) /
      keep_pad (E_pad, H) -> out (N, H, F).

    Per-head F must pad to <= 512 lanes (the single-tile feature limit);
    callers fall back to the per-head loop + XLA VJP beyond that.
    """
    out, _, _ = _flash_forward_mh(s_src_pad, a_dst, msg, plan, slope,
                                  interpret, keep_pad)
    return out[:, :plan.num_nodes].transpose(1, 0, 2)


def _fwd_mh(s_src_pad, a_dst, msg, plan, slope, interpret, keep_pad=None):
    out, m, l = _flash_forward_mh(s_src_pad, a_dst, msg, plan, slope,
                                  interpret, keep_pad)
    return (out[:, :plan.num_nodes].transpose(1, 0, 2),
            (s_src_pad, a_dst, msg, m, l, out, keep_pad))


def _bwd_mh(plan, slope, interpret, res, g):
    s_src_pad, a_dst, msg, m, l, out, keep_pad = res
    E_pad, H, F = msg.shape
    if _cdiv(F, 128) * 128 > 512:
        # per-head XLA fallback beyond the single-tile feature limit
        # (same guard as the single-head _bwd at F > 512)
        parts = [_bwd_xla(plan, slope,
                          (s_src_pad[:, h], a_dst[:, h], msg[:, h],
                           None if keep_pad is None else keep_pad[:, h]),
                          g[:, h]) for h in range(H)]
        dss = jnp.stack([p[0] for p in parts], axis=1)
        da = jnp.stack([p[1] for p in parts], axis=1)
        dmsg = jnp.stack([p[2] for p in parts], axis=1)
        dkeep = None if keep_pad is None else jnp.zeros_like(keep_pad)
        return dss, da, dmsg, dkeep
    nbR = plan.nblocks * plan.R
    g = g.astype(jnp.float32)  # (N, H, F)
    g_pad = jnp.zeros((H, nbR, F), jnp.float32).at[
        :, :g.shape[0]].set(g.transpose(1, 0, 2))
    # c_row = <out_row, g_row> per head (out is the padded fwd output)
    c = jnp.sum(out.astype(jnp.float32) * g_pad, axis=2)   # (H, nbR)
    c_blocks = c.reshape(H * plan.nblocks, 1, plan.R)
    g_flat = g_pad.reshape(H * nbR, F)
    if msg.dtype != jnp.float32:
        g_flat = g_flat.astype(msg.dtype)
    msg_flat = msg.transpose(1, 0, 2).reshape(H * E_pad, F).astype(
        msg.dtype)
    dss, da, dmsg = _flash_backward_mh(
        s_src_pad, a_dst, msg_flat, m, l, c_blocks, g_flat, plan, slope,
        interpret, keep_pad)
    dkeep = None if keep_pad is None else jnp.zeros_like(keep_pad)
    return (dss.astype(s_src_pad.dtype),
            da[:, :a_dst.shape[0]].T.astype(a_dst.dtype),
            dmsg.astype(msg.dtype), dkeep)


flash_edge_attention_mh.defvjp(_fwd_mh, _bwd_mh)


def flash_softmax_spmm_mh(scores_pad, msg, plan, interpret=False,
                          keep_pad=None):
    """Multi-head `flash_softmax_spmm` (arbitrary per-edge scores):
    scores_pad (E_pad, H), msg (E_pad, H, F) -> (N, H, F), one
    pallas_call for all heads."""
    zeros = jnp.zeros((plan.num_nodes, scores_pad.shape[1]), jnp.float32)
    return flash_edge_attention_mh(scores_pad, zeros, msg, plan, 1.0,
                                   interpret, keep_pad)


def flash_softmax_spmm(scores_pad, msg, plan, interpret=False,
                       keep_pad=None):
    """Fused segment-softmax + weighted aggregate for ARBITRARY per-edge
    scores (no GAT-style src/dst decomposition required):

        out[d] = sum_e softmax_d(scores)_e * msg[e]

    With slope=1 the kernel's leaky_relu is the identity, so any
    already-computed edge score (GATv2's post-MLP score, HGT's relation
    dot product, HAN's semantic score, ...) rides the same single-pass
    online-softmax kernel as GAT. `keep_pad` fuses attention dropout
    (see flash_edge_attention). Replaces the reference's 3-pass
    segment_softmax + weighted scatter (utils/softmax.py:10 + bspmm).
    """
    zeros = jnp.zeros((plan.num_nodes,), jnp.float32)
    return flash_edge_attention(scores_pad, zeros, msg, plan, 1.0,
                                interpret, keep_pad)
