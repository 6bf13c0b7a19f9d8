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

Round-4 measured notes (profiler/flash_kernel_tune.py): the kernel keeps
the DENSE (R, ET) formulation — a lane-wise rewrite (per-edge exp on
(1, ET) with exact one-hot MXU picks for per-row statistics, `_pick_rows`)
measured 197-207M e/s against the dense kernel's 223-233M at the GAT
protocol; Mosaic executes M=1 pick matmuls and the extra select passes
above the cost of the dense exp, reconfirming the round-3 lane-wise
negative result. What DID win: compact window reads (below), ET=1024
tiles (per-grid-step overhead dominates the added dense VPU work), and
keeping every single-head operand FLAT — a (G,) -> (G, 1) column reshape
moves the data from lanes to sublanes, an XLA relayout worth ~2 ms per
operand at arxiv scale, so the H=1 wrappers never materialize column
shapes.

Inputs may be given in padded lane order (E_pad rows) or COMPACT gather
order (plan.gather_len rows) when the plan is windowed
(build_csr_plan(window=True)): per-tile slabs are then located by the
scalar-prefetched window index, the source gather fetches E rows instead
of E_pad, and per-lane backward outputs (ds_src, dmsg) accumulate into
the shared boundary windows via first-visit flags.

Backward is ALSO one fused Pallas pass: the forward saves the per-row
softmax statistics (m, l), so the backward recomputes alpha tile-locally
(never materializing it in HBM) and emits all three gradients per edge
tile:
    dmsg_e  = alpha_e * g[row(e)]                       (one MXU matmul)
    dalpha  = <g[row], msg_e>                           (one MXU matmul)
    ds_e    = alpha_e * (dalpha_e - c_row) * leaky'(s)  (VPU, lanes)
    da_dst  = segment-sum of ds (output-block revisiting accumulation)
with c_row = <out_row, g_row> computed outside as one streaming rowdot.
Graphs with per-head F > 512 fall back to the decomposed XLA VJP (GAT
heads are 8-64 dims; the fallback keeps the API total).
"""

import functools
import os

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


def _lane_pad(F):
    """Feature width the kernels run at. Widths that divide 128 stay
    UNPADDED -- Mosaic handles sub-128 lane blocks in-register, while
    padding F=64 GAT messages to 128 columns both materialized a padded
    copy and doubled every kernel's message bytes (a silent 2x carried
    from round 1; found in the round-4 flash tune). Irregular widths
    still pad to the next 128-lane group."""
    if F % 128 == 0 or 128 % F == 0:
        return F
    return _cdiv(F, 128) * 128


def _tile_last(plan: CSRPlan):
    """1 for the final tile of each row block (where the normalized output
    is written)."""
    tl = np.zeros(plan.T, np.int32)
    for t in range(plan.T):
        if t + 1 == plan.T or plan.tile_block[t + 1] != plan.tile_block[t]:
            tl[t] = 1
    return tl


def _lane_layout(plan: CSRPlan, n_rows):
    """(ts, wf, Gt): per-tile slab index into the per-lane operands, the
    first-visit flag for accumulating per-lane OUTPUTS into shared slabs,
    and the number of distinct slabs. Lane-order inputs (n_rows == E_pad)
    use the identity layout; compact inputs (n_rows == gather_len) use
    the plan's window indices (adjacent dst blocks share boundary
    windows, hence the accumulate flags)."""
    if plan.tile_src is not None and n_rows == plan.gather_len:
        ts = plan.tile_src.astype(np.int32)
        wf = np.ones(plan.T, np.int32)
        wf[1:] = (ts[1:] != ts[:-1]).astype(np.int32)
        return ts, wf, plan.gather_len // plan.ET
    assert n_rows == plan.E_pad, (n_rows, plan.E_pad, plan.gather_len)
    return (np.arange(plan.T, dtype=np.int32),
            np.ones(plan.T, np.int32), plan.T)


def _lane_to_pad(plan: CSRPlan):
    """Map padded-lane position -> compact gather row (for the F > 512
    XLA fallback, which works in lane order)."""
    ET = plan.ET
    return (plan.tile_src.astype(np.int64)[:, None] * ET
            + np.arange(ET, dtype=np.int64)[None, :]).reshape(-1)


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


def _pick_rows(vals_col, sel_bf):
    """EXACT one-hot pick of per-row f32 values onto lanes:
    out[e] = vals[r(e)] where sel selects at most one row per lane.
    vals_col (R, 1) f32, sel_bf (R, ET) bf16 0/1 -> (1, ET) f32.
    The bf16 hi+lo split keeps it exact: each output lane receives at
    most ONE nonzero term per matmul, and hi + lo reconstructs the f32
    value exactly (standard two-term split)."""
    v = vals_col.reshape(1, -1)                       # (1, R)
    v_hi = v.astype(jnp.bfloat16)
    v_lo = (v - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    return (jax.lax.dot_general(v_hi, sel_bf, dn,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(v_lo, sel_bf, dn,
                                  preferred_element_type=jnp.float32))


def _flash_kernel(tb_ref, tf_ref, tl_ref, ts_ref, lr_ref, ssrc_ref,
                  adst_ref, *rest, R, ET, slope, f32_msg, has_mask,
                  tid=1):
    # Dense (R, ET) formulation. Round-4 A/B (profiler/flash_kernel_tune
    # .py): lane-wise exp with one-hot MXU picks measured 197-207M e/s vs
    # the dense kernel's 223-233M at the GAT protocol -- Mosaic executes
    # M=1 pick matmuls and the extra select passes above the cost of the
    # dense exp (confirming the round-3 lane-wise negative result). The
    # winning moves were COMPACT window reads (ts_ref) and bigger tiles
    # (ET=1024), not fewer transcendentals.
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
    # exp(0) = 1, so invalid pairs need the explicit mask (rows with no
    # edges must stay exactly zero).
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
    """Single-head forward: the flat-mode multi-head launch (msg stays
    2-D and the score vectors 1-D -- column reshapes are relayouts, see
    the module notes). Returns (out (nb*R, F), m (nb,1,R), l (nb,1,R))."""
    out, m, l = _flash_forward_mh(s_src_pad, a_dst, msg, plan, slope,
                                  interpret, keep_pad)
    return out[0], m, l


# Round-5 A/B result (PERF_NOTES "flash kernel round 5"): the
# GLOBAL-BOUND kernel below measured 220-225M e/s at the GAT protocol
# vs the online-softmax kernel's 231M — the dense-exp work it removes
# is NOT the bottleneck (the per-tile score-operand DMA and the msg
# streaming are), so the online kernel stays the default. Set
# GGL_FLASH_GB=1 to enable the global-bound form for A/B runs.
_USE_GB = os.environ.get("GGL_FLASH_GB", "") == "1"


def _flash_kernel_gb(tb_ref, tf_ref, tl_ref, ts_ref, lr_ref, ssrc_ref,
                     ab_ref, *rest, R, ET, slope, f32_msg, has_mask,
                     tid=1):
    """Global-bound formulation (round 5, replaces the online softmax).

    Softmax is invariant to any per-row shift, and the GAT score
    leaky(s_src + a_dst[r]) is MONOTONE in s_src, so
        m_bound[r] = leaky(max_e s_src + a_dst[r]) >= score(r, e)  for
    every edge of row r — a valid stabilization shift computable from
    ONE scalar (the global s_src max) without any per-row max pass.
    Consequences vs `_flash_kernel`:
      * no running max, no rescale of l/acc across tiles;
      * exp moves from the dense (R, ET) grid to the (1, ET) lanes
        (ET transcendentals/tile instead of R*ET);
      * the remaining dense work is one one-hot build, one broadcast
        multiply, one reduce, and the same MXU matmul as the plain
        segment-matmul SpMM — the flash kernel's overhead over SpMM
        becomes the lane exp.
    Numerics: identical softmax up to fp rounding. exp(s - bound)
    underflows only when a row's best score sits > ~80 below the bound
    (f32 exp range), i.e. score SPREADS beyond anything a trained
    attention layer produces; the reference's own max-shift softmax has
    the same f32 range.
    The per-lane a_dst / m_bound values are fetched with one exact
    hi/lo one-hot MXU pick (M=2; `ab_ref` carries rows [a_dst; bound]).
    m_out is written as the bound so the UNCHANGED backward kernel
    (which clamps s - m to <= 0, a no-op for a true bound) recomputes
    the identical alpha.
    """
    if has_mask:
        (mask_ref, msg_ref, out_ref, m_out_ref, l_out_ref,
         l_ref, acc_ref) = rest
    else:
        (msg_ref, out_ref, m_out_ref, l_out_ref, l_ref, acc_ref) = rest
    t = pl.program_id(tid)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (R, ET), 0) == lr_ref[0])

    @pl.when(tf_ref[t] == 1)
    def _():
        l_ref[:] = jnp.zeros((R, 1), jnp.float32)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Dense (R, ET) scores with the bound as a per-row COLUMN — the
    # A/B (profiler/flash_kernel_tune.py, round 5) measured this form
    # fastest: lane-exp via M=2 one-hot picks loses ~2M e/s to the pick
    # matmuls, and transposed/packed-column layouts lose 10-20M to
    # Mosaic relayouts (PERF_NOTES round-5 entry).
    a_col = ab_ref[0, 0:1, :].reshape(R, 1)
    mb_col = ab_ref[0, 1:2, :].reshape(R, 1)
    s = ssrc_ref[0] + a_col                           # (R, ET)
    s = jnp.where(s >= 0, s, slope * s)
    # invalid lanes carry neighbor-window scores; exp of them is finite
    # garbage the sel select drops.
    q = jnp.exp(s - mb_col)
    # post-softmax alpha dropout: the denominator keeps the FULL softmax
    # mass (mask scales alpha after normalization), so l sums the
    # unmasked q and only the accumulator sees the mask.
    q_m = q * mask_ref[0] if has_mask else q
    msg = msg_ref[:]
    if f32_msg:
        w = jnp.where(sel, q, 0.0)
        l_ref[:] = l_ref[:] + jnp.sum(w, axis=1, keepdims=True)
        wa = jnp.where(sel, q_m, 0.0) if has_mask else w
        # bf16x3: exact-split w and msg, drop only the lo*lo term
        w_hi_f = wa.astype(jnp.bfloat16).astype(jnp.float32)
        w_lo = (wa - w_hi_f).astype(jnp.bfloat16)
        w_hi = w_hi_f.astype(jnp.bfloat16)
        m_hi = msg.astype(jnp.bfloat16)
        m_lo = (msg - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        upd = (jnp.dot(w_hi, m_hi, preferred_element_type=jnp.float32)
               + jnp.dot(w_hi, m_lo, preferred_element_type=jnp.float32)
               + jnp.dot(w_lo, m_hi, preferred_element_type=jnp.float32))
    else:
        w = jnp.where(sel, q, 0.0).astype(jnp.bfloat16)
        l_ref[:] = l_ref[:] + jnp.sum(w, axis=1, keepdims=True,
                                      dtype=jnp.float32)
        wa = (jnp.where(sel, q_m, 0.0).astype(jnp.bfloat16)
              if has_mask else w)
        upd = jnp.dot(wa, msg, preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] + upd

    @pl.when(tl_ref[t] == 1)
    def _():
        out_ref[:] = (acc_ref[:] /
                      jnp.maximum(l_ref[:], 1e-16)).astype(out_ref.dtype)
        m_out_ref[:] = ab_ref[:, 1:2, :]
        l_out_ref[:] = l_ref[:].reshape(1, 1, R)


def _flash_bwd_kernel(tb_ref, tf_ref, tl_ref, ts_ref, wf_ref, lr_ref,
                      ssrc_ref, adst_ref, *rest, R, ET, slope, f32_msg,
                      has_mask, tid=0):
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

    # per-edge score grad (column sum: one valid row per edge), written
    # into (possibly shared) window slabs via first-visit accumulation
    ds_blk = jnp.sum(ds, axis=0).reshape(1, 1, ET)

    @pl.when(wf_ref[t] == 1)
    def _():
        dss_ref[:] = ds_blk

    @pl.when(wf_ref[t] == 0)
    def _():
        dss_ref[:] = dss_ref[:] + ds_blk

    # dmsg[e] = alpha_e * g_row(e): contract the R dim of alpha with g
    if f32_msg:
        dmsg = _dot3(alpha_w, gf, ((0,), (0,)), True)
    else:
        dmsg = _dot3(alpha_w.astype(jnp.bfloat16), g, ((0,), (0,)),
                     False)
    dmsg = dmsg.astype(dmsg_ref.dtype)

    @pl.when(wf_ref[t] == 1)
    def _():
        dmsg_ref[:] = dmsg

    @pl.when(wf_ref[t] == 0)
    def _():
        dmsg_ref[:] = dmsg_ref[:] + dmsg

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
    """Single-head fused gradients via the flat-mode multi-head launch.
    Returns (ds_src (n_lanes,), da_full (nb*R,), dmsg (n_lanes, F))."""
    return _flash_backward_mh(s_src_pad, a_dst, msg, m, l, c_blocks,
                              g_pad, plan, slope, interpret, keep_pad)


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

    Single fused Pallas pass (online softmax). Per-edge inputs are in
    the plan's padded destination-sorted lane order, OR — for a window
    plan (build_csr_plan(window=True)) — in COMPACT gather order
    (plan.gather_len rows), in which case the source gather is unpadded
    and per-tile slabs stream at scalar-prefetched window indices:
      s_src_pad : (E_pad,) or (gather_len,) per-edge source score
      a_dst     : (num_nodes,) per-destination score contribution
      msg       : (E_pad, F) or (gather_len, F) gathered source features
      keep_pad  : optional (E_pad,) post-softmax alpha weights -- the
                  fused form of attention dropout (values {0, 1/keep});
                  treated as non-differentiable (zero cotangent). Always
                  lane-order (it is generated per lane, not gathered).
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
    compact = s_src_pad.shape[0] != plan.E_pad
    if compact:
        # expand compact inputs to lane order for the decomposed path;
        # cotangents fold back by segment-sum over shared window lanes
        l2g = jnp.asarray(_lane_to_pad(plan))
        s_lane = jnp.take(s_src_pad, l2g)
        msg_lane = jnp.take(msg, l2g, axis=0)
    else:
        s_lane, msg_lane = s_src_pad, msg
    alpha, s_pre, rows, rows_c, valid = _alpha_xla(s_lane, a_dst, plan,
                                                   slope)
    g = g.astype(jnp.float32)
    g_pad = jnp.zeros((plan.nblocks * plan.R, g.shape[1]), jnp.float32
                      ).at[:g.shape[0]].set(g)
    g_rows = jnp.take(g_pad, rows_c, axis=0)
    msf = msg_lane.astype(jnp.float32)
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
    da_full = jax.ops.segment_sum(ds, rows,
                                  num_segments=plan.nblocks * plan.R)
    da_dst = da_full[:a_dst.shape[0]].astype(a_dst.dtype)
    if compact:
        ds = jax.ops.segment_sum(ds, l2g,
                                 num_segments=plan.gather_len)
        dmsg = jax.ops.segment_sum(dmsg.astype(jnp.float32), l2g,
                                   num_segments=plan.gather_len
                                   ).astype(msg.dtype)
    ds_src = ds.astype(s_src_pad.dtype)
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
                      keep_pad=None, smax=None):
    """Multi-head forward: ONE pallas_call with the head on the grid.

    s_src_pad (n_lanes, H) / a_dst (N, H) / msg (n_lanes, H, F) /
    keep_pad (E_pad, H), where n_lanes is E_pad (lane order) or
    plan.gather_len (compact window order). Returns (out (H, nb*R, F),
    m (H*nb,1,R), l (H*nb,1,R)). Head h's blocks stack along the leading
    dim of every operand, so the 3-D layouts (and the single-head kernel
    body) are reused verbatim — only the index maps gain offsets.
    """
    interpret = interpret or jax.default_backend() != "tpu"
    R, ET, T = plan.R, plan.ET, plan.T
    # FLAT single-head mode: msg (n_lanes, F), scores 1-D. Column shapes
    # ((n, 1), .T) move lane data onto sublanes -- an XLA relayout worth
    # ~2 ms PER OPERAND at arxiv scale (measured, round-4 flash tune) --
    # so the H = 1 path never materializes them.
    flat = msg.ndim == 2
    if flat:
        n_lanes, F = msg.shape
        H = 1
    else:
        n_lanes, H, F = msg.shape
    ts_np, _, Gt = _lane_layout(plan, n_lanes)
    nb = plan.nblocks
    F_pad = _lane_pad(F)
    if flat or H == 1:
        msg = msg.reshape(n_lanes, F)
    else:
        msg = msg.transpose(1, 0, 2).reshape(H * n_lanes, F)
    if F_pad != F:
        msg = jnp.pad(msg, ((0, 0), (0, F_pad - F)))
    FT = min(512, F_pad)
    while F_pad % FT:
        FT //= 2
    nf = F_pad // FT

    local_row = jnp.asarray(plan.local_row.reshape(T, 1, ET))
    if flat or H == 1:
        ssrc = s_src_pad.astype(jnp.float32).reshape(Gt, 1, ET)
        a2 = jnp.zeros((1, nb * R), jnp.float32).at[
            0, :a_dst.shape[0]].set(a_dst.astype(jnp.float32).reshape(-1))
    else:
        ssrc = s_src_pad.astype(jnp.float32).T.reshape(H * Gt, 1, ET)
        a2 = jnp.zeros((H, nb * R), jnp.float32).at[
            :, :a_dst.shape[0]].set(a_dst.astype(jnp.float32).T)
    if _USE_GB:
        # per-row stabilization bound from the global per-head s_src max
        # (leaky is monotone; see _flash_kernel_gb). Callers that know a
        # cheaper upper bound (e.g. the N-sized node-score max, computed
        # concurrently with the gather) pass it via `smax`; any value
        # >= the true max keeps the bound valid.
        if smax is None:
            smax = jnp.max(ssrc.reshape(H, -1), axis=1)        # (H,)
        else:
            smax = jnp.broadcast_to(
                jnp.asarray(smax, jnp.float32).reshape(-1), (H,))
        x = smax[:, None] + a2
        mb = jnp.where(x >= 0, x, slope * x)
        a_full = jnp.stack(
            [a2.reshape(H, nb, R), mb.reshape(H, nb, R)],
            axis=2).reshape(H * nb, 2, R)
        a_rows = 2
    else:
        a_full = a2.reshape(H * nb, 1, R)
        a_rows = 1

    has_mask = keep_pad is not None
    mask_in, mask_spec = (), ()
    if has_mask:
        if flat or H == 1:
            mask_in = (keep_pad.astype(jnp.float32).reshape(T, 1, ET),)
        else:
            mask_in = (keep_pad.astype(jnp.float32).T.reshape(
                H * T, 1, ET),)
        mask_spec = (pl.BlockSpec(
            (1, 1, ET),
            lambda h, f, t, tb, tf, tl, ts: (h * T + t, 0, 0)),)

    kern = functools.partial(
        _flash_kernel_gb if _USE_GB else _flash_kernel, R=R, ET=ET,
        slope=slope, f32_msg=msg.dtype == jnp.float32, has_mask=has_mask,
        tid=2)
    scratch = [pltpu.VMEM((R, 1), jnp.float32),
               pltpu.VMEM((R, FT), jnp.float32)]
    if not _USE_GB:
        scratch.insert(0, pltpu.VMEM((R, 1), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(H, nf, T),
        in_specs=[
            pl.BlockSpec((1, 1, ET),
                         lambda h, f, t, tb, tf, tl, ts: (t, 0, 0)),
            pl.BlockSpec((1, 1, ET),
                         lambda h, f, t, tb, tf, tl, ts:
                         (h * Gt + ts[t], 0, 0)),
            pl.BlockSpec((1, a_rows, R),
                         lambda h, f, t, tb, tf, tl, ts:
                         (h * nb + tb[t], 0, 0)),
            *mask_spec,
            pl.BlockSpec((ET, FT),
                         lambda h, f, t, tb, tf, tl, ts:
                         (h * Gt + ts[t], f)),
        ],
        out_specs=[
            pl.BlockSpec((R, FT),
                         lambda h, f, t, tb, tf, tl, ts:
                         (h * nb + tb[t], f)),
            pl.BlockSpec((1, 1, R),
                         lambda h, f, t, tb, tf, tl, ts:
                         (h * nb + tb[t], 0, 0)),
            pl.BlockSpec((1, 1, R),
                         lambda h, f, t, tb, tf, tl, ts:
                         (h * nb + tb[t], 0, 0)),
        ],
        scratch_shapes=scratch,
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
            bytes_accessed=H * (n_lanes * F_pad + nb * R * F_pad)
            * msg.dtype.itemsize,
            transcendentals=H * T * ET,
        ),
        interpret=interpret,
    )(jnp.asarray(plan.tile_block), jnp.asarray(plan.tile_first),
      jnp.asarray(_tile_last(plan)), jnp.asarray(ts_np), local_row,
      ssrc, a_full, *mask_in, msg)
    return out.reshape(H, nb * R, F_pad)[:, :, :F], m, l


def _flash_backward_mh(s_src_pad, a_dst, msg, m, l, c_blocks, g_pad, plan,
                       slope, interpret, keep_pad=None):
    """Multi-head fused gradients. msg (H*n_lanes, F_pad-able), g_pad
    (H*nb*R, F). Returns (dss (n_lanes, H), da ((H, nb*R)),
    dmsg (n_lanes, H, F)) -- or flat shapes ((n_lanes,), (nb*R,),
    (n_lanes, F)) when s_src_pad is 1-D (flat single-head mode; column
    shapes are relayouts, see the module notes)."""
    interpret = interpret or jax.default_backend() != "tpu"
    R, ET, T, nb = plan.R, plan.ET, plan.T, plan.nblocks
    flat = s_src_pad.ndim == 1
    H = 1 if flat else s_src_pad.shape[1]
    n_lanes = s_src_pad.shape[0]
    ts_np, wf_np, Gt = _lane_layout(plan, n_lanes)
    F = msg.shape[1]
    F_pad = _lane_pad(F)
    if F_pad != F:
        msg = jnp.pad(msg, ((0, 0), (0, F_pad - F)))
        g_pad = jnp.pad(g_pad, ((0, 0), (0, F_pad - F)))

    local_row = jnp.asarray(plan.local_row.reshape(T, 1, ET))
    if flat or H == 1:
        ssrc = s_src_pad.astype(jnp.float32).reshape(Gt, 1, ET)
        a_full = jnp.zeros((nb * R,), jnp.float32).at[
            :a_dst.shape[0]].set(a_dst.astype(jnp.float32).reshape(-1)
                                 ).reshape(nb, 1, R)
    else:
        ssrc = s_src_pad.astype(jnp.float32).T.reshape(H * Gt, 1, ET)
        a_full = jnp.zeros((H, nb * R), jnp.float32).at[
            :, :a_dst.shape[0]].set(a_dst.astype(jnp.float32).T
                                    ).reshape(H * nb, 1, R)

    has_mask = keep_pad is not None
    mask_in, mask_spec = (), ()
    if has_mask:
        if flat or H == 1:
            mask_in = (keep_pad.astype(jnp.float32).reshape(T, 1, ET),)
        else:
            mask_in = (keep_pad.astype(jnp.float32).T.reshape(
                H * T, 1, ET),)
        mask_spec = (pl.BlockSpec(
            (1, 1, ET),
            lambda h, t, tb, tf, tl, ts, wf: (h * T + t, 0, 0)),)

    kern = functools.partial(
        _flash_bwd_kernel, R=R, ET=ET, slope=slope,
        f32_msg=msg.dtype == jnp.float32, has_mask=has_mask, tid=1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(H, T),
        in_specs=[
            pl.BlockSpec((1, 1, ET),
                         lambda h, t, tb, tf, tl, ts, wf: (t, 0, 0)),
            pl.BlockSpec((1, 1, ET),
                         lambda h, t, tb, tf, tl, ts, wf:
                         (h * Gt + ts[t], 0, 0)),
            pl.BlockSpec((1, 1, R),
                         lambda h, t, tb, tf, tl, ts, wf:
                         (h * nb + tb[t], 0, 0)),
            *mask_spec,
            pl.BlockSpec((1, 1, R),
                         lambda h, t, tb, tf, tl, ts, wf:
                         (h * nb + tb[t], 0, 0)),
            pl.BlockSpec((1, 1, R),
                         lambda h, t, tb, tf, tl, ts, wf:
                         (h * nb + tb[t], 0, 0)),
            pl.BlockSpec((1, 1, R),
                         lambda h, t, tb, tf, tl, ts, wf:
                         (h * nb + tb[t], 0, 0)),
            pl.BlockSpec((ET, F_pad),
                         lambda h, t, tb, tf, tl, ts, wf:
                         (h * Gt + ts[t], 0)),
            pl.BlockSpec((R, F_pad),
                         lambda h, t, tb, tf, tl, ts, wf:
                         (h * nb + tb[t], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, ET),
                         lambda h, t, tb, tf, tl, ts, wf:
                         (h * Gt + ts[t], 0, 0)),
            pl.BlockSpec((1, 1, R),
                         lambda h, t, tb, tf, tl, ts, wf:
                         (h * nb + tb[t], 0, 0)),
            pl.BlockSpec((ET, F_pad),
                         lambda h, t, tb, tf, tl, ts, wf:
                         (h * Gt + ts[t], 0)),
        ],
        scratch_shapes=[pltpu.VMEM((1, 1, R), jnp.float32)],
    )
    dss, da, dmsg = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((H * Gt, 1, ET), jnp.float32),
            jax.ShapeDtypeStruct((H * nb, 1, R), jnp.float32),
            jax.ShapeDtypeStruct((H * n_lanes, F_pad), msg.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * R * ET * F_pad * T * H,
            bytes_accessed=2 * H * (n_lanes * F_pad + nb * R * F_pad)
            * msg.dtype.itemsize,
            transcendentals=H * T * ET,
        ),
        interpret=interpret,
    )(jnp.asarray(plan.tile_block), jnp.asarray(plan.tile_first),
      jnp.asarray(_tile_last(plan)), jnp.asarray(ts_np),
      jnp.asarray(wf_np), local_row, ssrc, a_full, *mask_in,
      m, l, c_blocks, msg, g_pad)
    if flat:
        return (dss.reshape(n_lanes), da.reshape(nb * R), dmsg[:, :F])
    if H == 1:
        return (dss.reshape(n_lanes, 1), da.reshape(1, nb * R),
                dmsg[:, :F].reshape(n_lanes, 1, F))
    return (dss.reshape(H, n_lanes).T,
            da.reshape(H, nb * R),
            dmsg.reshape(H, n_lanes, F_pad)[:, :, :F].transpose(1, 0, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_edge_attention_mh(s_src_pad, a_dst, msg, plan, slope=0.2,
                            interpret=False, keep_pad=None):
    """Multi-head `flash_edge_attention`: ONE pallas_call over an
    (H, F, T) grid instead of a per-head Python loop (one kernel launch
    and one XLA graph node for all heads — smaller graphs, faster
    compiles, identical math).

      s_src_pad (n_lanes, H) / a_dst (N, H) / msg (n_lanes, H, F) /
      keep_pad (E_pad, H) -> out (N, H, F),
    where n_lanes is E_pad or plan.gather_len (compact window order).

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
    n_lanes, H, F = msg.shape
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
    if H == 1:
        msg_flat = msg.reshape(n_lanes, F)
    else:
        msg_flat = msg.transpose(1, 0, 2).reshape(H * n_lanes, F)
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
    scores_pad (n_lanes, H), msg (n_lanes, H, F) -> (N, H, F), one
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
