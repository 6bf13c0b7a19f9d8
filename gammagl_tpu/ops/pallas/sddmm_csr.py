"""SDDMM over a CSR plan: per-edge endpoint dots without a dst gather.

The reference computes attention scores as TWO per-edge gathers plus an
elementwise dot (gat_conv.py:100-112 hides it inside each conv). On TPU the
gather engine is the wall (~220 Mrows/s at F=256, PERF_NOTES "gather wall"),
and two gathers in one program serialize at best — so the decomposed SDDMM
pays ~2x the gather cost of SpMM for a handful of FLOPs.

This kernel removes the dst gather entirely: edges are dst-sorted into the
CSRPlan's R-row blocks, so each edge tile's destination rows live in ONE
dense (R, F) block of the dst feature matrix. The per-edge dot becomes a
dense (R, F) x (F, ET) MXU matmul followed by a one-hot row pick:

    s[e] = sum_r [row(e) == r] * <x_dst[b*R + r], msg[e]>

One src gather feeds ``msg``; the dst side streams block-dense. At arxiv
scale (2.3M edges, F=256 bf16) the matmul adds ~300 GFLOPs — under 1 ms on
the MXU — versus the ~11 ms the second gather costs.

The VJP is kernel-backed on both sides:
  * d msg[e] = g[e] * x_dst[row(e)]  — same block-dense trick, transposed
    ((ET, R) one-hot-weighted times the (R, F) dst block, one MXU matmul);
  * d x_dst  = segment-reduce of g ⊙ msg — exactly the sorted
    segment-matmul kernel this module already owns.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gammagl_tpu.ops.pallas.segment_matmul import (_packed_eligible,
                                                   _segment_matmul,
                                                   _spmm_gather_reduce,
                                                   _swap_plan, _unpack_tile,
                                                   gather_rows, pack_halves)
from gammagl_tpu.ops.pallas.flash_attention import _dot3, _lane_pad

__all__ = ["sddmm_csr", "sddmm_csr_mh", "expand_dst_csr"]


def _cdiv(a, b):
    return -(-a // b)


def _sddmm_fwd_kernel(tb_ref, lr_ref, msg_ref, xd_ref, out_ref, *,
                      R, ET, f32):
    f = pl.program_id(2)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (R, ET), 0) == lr_ref[0])
    # d[r, e] = <x_dst[r], msg[e]> over this feature stripe
    d = _dot3(xd_ref[:], msg_ref[:], ((1,), (1,)), f32)
    part = jnp.sum(jnp.where(sel, d, 0.0), axis=0).reshape(1, 1, ET)

    @pl.when(f == 0)
    def _():
        out_ref[:] = part

    @pl.when(f > 0)
    def _():
        out_ref[:] = out_ref[:] + part


def _sddmm_bwd_kernel(tb_ref, lr_ref, g_ref, xd_ref, dmsg_ref, *,
                      R, ET, f32):
    sel = (jax.lax.broadcasted_iota(jnp.int32, (R, ET), 0) == lr_ref[0])
    oh = jnp.where(sel, g_ref[0], 0.0)           # (R, ET) f32
    if f32:
        dmsg = _dot3(oh, xd_ref[:], ((0,), (0,)), True)
    else:
        dmsg = jax.lax.dot_general(
            oh.astype(jnp.bfloat16), xd_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    dmsg_ref[:] = dmsg.astype(dmsg_ref.dtype)


def _pad_dst(x_dst, plan, H=None):
    """Dense dst matrix padded to nb*R rows (one (R, F) block per tile)."""
    nbR = plan.nblocks * plan.R
    if H is None:
        return jnp.zeros((nbR,) + x_dst.shape[1:], x_dst.dtype
                         ).at[:x_dst.shape[0]].set(x_dst)
    # (N, H, F) -> (H, nbR, F) -> (H*nbR, F)
    F = x_dst.shape[-1]
    out = jnp.zeros((H, nbR, F), x_dst.dtype).at[
        :, :x_dst.shape[0]].set(x_dst.transpose(1, 0, 2))
    return out.reshape(H * nbR, F)


def _sddmm_forward_mh(msg, xd_full, plan, interpret):
    """msg (H*E_pad, F), xd_full (H*nb*R, F) -> scores (H*T, 1, ET)."""
    interpret = interpret or jax.default_backend() != "tpu"
    R, ET, T, nb = plan.R, plan.ET, plan.T, plan.nblocks
    H = msg.shape[0] // plan.E_pad
    F = msg.shape[1]
    F_pad = _lane_pad(F)
    if F_pad != F:
        msg = jnp.pad(msg, ((0, 0), (0, F_pad - F)))
        xd_full = jnp.pad(xd_full, ((0, 0), (0, F_pad - F)))
    FT = min(512, F_pad)
    while F_pad % FT:
        FT //= 2
    nf = F_pad // FT
    local_row = jnp.asarray(plan.local_row.reshape(T, 1, ET))
    kern = functools.partial(_sddmm_fwd_kernel, R=R, ET=ET,
                             f32=msg.dtype == jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H, T, nf),
        in_specs=[
            pl.BlockSpec((1, 1, ET), lambda h, t, f, tb: (t, 0, 0)),
            pl.BlockSpec((ET, FT), lambda h, t, f, tb: (h * T + t, f)),
            pl.BlockSpec((R, FT), lambda h, t, f, tb: (h * nb + tb[t], f)),
        ],
        out_specs=pl.BlockSpec((1, 1, ET),
                               lambda h, t, f, tb: (h * T + t, 0, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H * T, 1, ET), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * ET * F_pad * T * H,
            bytes_accessed=H * (plan.E_pad + nb * R) * F_pad
            * msg.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(plan.tile_block), local_row, msg, xd_full)


def _sddmm_backward_mh(g, xd_full, plan, out_dtype, interpret):
    """g (H*T, 1, ET) f32 -> dmsg (H*E_pad, F)."""
    interpret = interpret or jax.default_backend() != "tpu"
    R, ET, T, nb = plan.R, plan.ET, plan.T, plan.nblocks
    H = g.shape[0] // T
    F = xd_full.shape[1]
    F_pad = _lane_pad(F)
    if F_pad != F:
        xd_full = jnp.pad(xd_full, ((0, 0), (0, F_pad - F)))
    FT = min(512, F_pad)
    while F_pad % FT:
        FT //= 2
    nf = F_pad // FT
    local_row = jnp.asarray(plan.local_row.reshape(T, 1, ET))
    kern = functools.partial(_sddmm_bwd_kernel, R=R, ET=ET,
                             f32=out_dtype == jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H, T, nf),
        in_specs=[
            pl.BlockSpec((1, 1, ET), lambda h, t, f, tb: (t, 0, 0)),
            pl.BlockSpec((1, 1, ET), lambda h, t, f, tb: (h * T + t, 0, 0)),
            pl.BlockSpec((R, FT), lambda h, t, f, tb: (h * nb + tb[t], f)),
        ],
        out_specs=pl.BlockSpec((ET, FT),
                               lambda h, t, f, tb: (h * T + t, f)),
    )
    dmsg = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H * plan.E_pad, F_pad), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * ET * F_pad * T * H,
            bytes_accessed=H * (plan.E_pad + nb * R) * F_pad
            * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(plan.tile_block), local_row, g, xd_full)
    return dmsg[:, :F]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _sddmm_inner(msg, x_dst, plan, interpret):
    """scores[e] = <msg[e], x_dst[row(e)]> for plan-order messages.

    msg (E_pad, F), x_dst (N, F) -> (E_pad,) f32 (0 at pad lanes)."""
    s = _sddmm_forward_mh(msg, _pad_dst(x_dst, plan), plan, interpret)
    return s.reshape(-1) * jnp.asarray(plan.valid)


def _sddmm_inner_fwd(msg, x_dst, plan, interpret):
    out = _sddmm_inner(msg, x_dst, plan, interpret)
    return out, (msg, x_dst)


def _sddmm_inner_bwd(plan, interpret, res, g):
    msg, x_dst = res
    gv = (g * jnp.asarray(plan.valid)).astype(jnp.float32)
    dmsg = _sddmm_backward_mh(gv.reshape(plan.T, 1, plan.ET),
                              _pad_dst(x_dst, plan), plan, msg.dtype,
                              interpret)
    # d x_dst[r] = sum_{e: row(e)=r} g[e] * msg[e]: the sorted
    # segment-matmul kernel with g as the per-edge weight
    dxd = _segment_matmul(msg, gv.astype(msg.dtype), plan,
                          interpret)[:x_dst.shape[0]].astype(x_dst.dtype)
    return dmsg, dxd


_sddmm_inner.defvjp(_sddmm_inner_fwd, _sddmm_inner_bwd)


def _sddmm_packed_kernel(tb_ref, ts_ref, lr_ref, g_ref, xd_ref, out_ref,
                         *, R, ET, F2):
    """Packed-gather SDDMM tile: g is the half-packed (ET, F2) f32 slab
    of the src gather; the dst block streams dense (R, F) bf16. The
    per-edge dot splits over the two unpacked halves (left = columns
    [0, F2), right = [F2, F)) -- two MXU matmuls, f32 accumulation."""
    sel = (jax.lax.broadcasted_iota(jnp.int32, (R, ET), 0) == lr_ref[0])
    left, right = _unpack_tile(g_ref[:])
    dn = (((1,), (1,)), ((), ()))
    d = (jax.lax.dot_general(xd_ref[:, :F2], left, dn,
                             preferred_element_type=jnp.float32)
         + jax.lax.dot_general(xd_ref[:, F2:], right, dn,
                               preferred_element_type=jnp.float32))
    out_ref[:] = jnp.sum(jnp.where(sel, d, 0.0), axis=0).reshape(1, 1, ET)


def _sddmm_fused_forward(x_src, x_dst, plan, interpret):
    """ONE half-packed src gather (compact when the plan is windowed) +
    dst-block dot kernel. Returns (E_pad,) f32 scores, zero at pads."""
    interpret = interpret or jax.default_backend() != "tpu"
    R, ET, T, nb = plan.R, plan.ET, plan.T, plan.nblocks
    N, F = x_src.shape
    F2 = F // 2
    if plan.tile_src is not None:
        idx = jnp.asarray(plan.gsrc)
        ts = jnp.asarray(plan.tile_src)
    else:
        idx = jnp.asarray(plan.src_pad)
        ts = jnp.arange(T, dtype=jnp.int32)
    g = jnp.take(pack_halves(x_src), idx, axis=0)
    xd_full = _pad_dst(x_dst, plan)
    local_row = jnp.asarray(plan.local_row.reshape(T, 1, ET))
    kern = functools.partial(_sddmm_packed_kernel, R=R, ET=ET, F2=F2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, ET), lambda t, tb, ts: (t, 0, 0)),
            pl.BlockSpec((ET, F2), lambda t, tb, ts: (ts[t], 0)),
            pl.BlockSpec((R, F), lambda t, tb, ts: (tb[t], 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, ET), lambda t, tb, ts: (t, 0, 0)),
    )
    s = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 1, ET), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * ET * F * T,
            bytes_accessed=T * ET * F2 * 4 + T * R * F * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(plan.tile_block), ts, local_row, g, xd_full)
    return s.reshape(-1) * jnp.asarray(plan.valid)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _sddmm_fused(x_src, x_dst, plan, interpret):
    return _sddmm_fused_forward(x_src, x_dst, plan, interpret)


def _sddmm_fused_fwd(x_src, x_dst, plan, interpret):
    return _sddmm_fused(x_src, x_dst, plan, interpret), (x_src, x_dst)


def _sddmm_fused_bwd(plan, interpret, res, g):
    # Both grads are weighted SpMMs with the score cotangent as the edge
    # weight -- they ride the packed/window kernels, no per-edge message
    # tensor ever materializes:
    #   d x_dst[r] = sum_{e: dst=r} g_e x_src[src_e]   (forward plan)
    #   d x_src[s] = sum_{e: src=s} g_e x_dst[dst_e]   (swap plan)
    x_src, x_dst = res
    gv = (g * jnp.asarray(plan.valid)).astype(jnp.float32)
    dxd = _spmm_gather_reduce(x_src, gv.astype(x_src.dtype), plan,
                              interpret)[:x_dst.shape[0]].astype(
        x_dst.dtype)
    tp, lane_map = _swap_plan(plan, x_src.shape[0])
    gv_ext = jnp.concatenate([gv, jnp.zeros(1, gv.dtype)])
    w_t = jnp.take(gv_ext, jnp.asarray(
        np.minimum(lane_map, plan.E_pad))).astype(x_dst.dtype)
    dxs = _spmm_gather_reduce(x_dst, w_t, tp,
                              interpret)[:x_src.shape[0]].astype(
        x_src.dtype)
    return dxs, dxd


_sddmm_fused.defvjp(_sddmm_fused_fwd, _sddmm_fused_bwd)


def sddmm_csr(x_src, x_dst, plan, interpret=False, msg=None):
    """Per-edge dots scores[e] = <x_src[src_e], x_dst[dst_e]> in padded
    plan order, with ONE gather (src side; the dst side streams as dense
    R-row blocks on the MXU). Returns (E_pad,) f32, zero at pad lanes.

    bf16 features with F % 256 == 0 ride the half-packed gather (compact
    when the plan is windowed) with a weighted-SpMM backward on both
    sides. Pass ``msg`` (E_pad, F) to reuse an existing plan-order src
    gather (attention convs gather features for aggregation anyway — the
    score then costs no gather at all). Differentiable in all tensor
    args.
    """
    if msg is None:
        if (_packed_eligible(x_src, None) and x_dst.dtype == x_src.dtype
                and x_src.shape[1] == x_dst.shape[1]):
            return _sddmm_fused(x_src, x_dst, plan, interpret)
        msg = gather_rows(x_src, plan, "src")
    return _sddmm_inner(msg, x_dst, plan, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _sddmm_inner_mh(msg, x_dst, plan, interpret):
    """Multi-head: msg (E_pad, H, F), x_dst (N, H, F) -> (E_pad, H)."""
    E_pad, H, F = msg.shape
    m = msg.transpose(1, 0, 2).reshape(H * E_pad, F)
    s = _sddmm_forward_mh(m, _pad_dst(x_dst, plan, H), plan, interpret)
    s = s.reshape(H, plan.E_pad).T
    return s * jnp.asarray(plan.valid)[:, None]


def _sddmm_inner_mh_fwd(msg, x_dst, plan, interpret):
    return _sddmm_inner_mh(msg, x_dst, plan, interpret), (msg, x_dst)


def _sddmm_inner_mh_bwd(plan, interpret, res, g):
    msg, x_dst = res
    E_pad, H, F = msg.shape
    gv = (g * jnp.asarray(plan.valid)[:, None]).astype(jnp.float32)
    g_blocks = gv.T.reshape(H * plan.T, 1, plan.ET)
    dmsg = _sddmm_backward_mh(g_blocks, _pad_dst(x_dst, plan, H), plan,
                              msg.dtype, interpret)
    dmsg = dmsg.reshape(H, E_pad, F).transpose(1, 0, 2)
    dxd = jnp.stack(
        [_segment_matmul(msg[:, h], gv[:, h].astype(msg.dtype), plan,
                         interpret)[:x_dst.shape[0]] for h in range(H)],
        axis=1).astype(x_dst.dtype)
    return dmsg, dxd


_sddmm_inner_mh.defvjp(_sddmm_inner_mh_fwd, _sddmm_inner_mh_bwd)


def _expand_kernel(tb_ref, lr_ref, xd_ref, out_ref, *, R, ET, f32):
    sel = (jax.lax.broadcasted_iota(jnp.int32, (R, ET), 0) == lr_ref[0])
    oh = jnp.where(sel, 1.0, 0.0)
    if f32:
        out = _dot3(oh, xd_ref[:], ((0,), (0,)), True)
    else:
        out = jax.lax.dot_general(
            oh.astype(jnp.bfloat16), xd_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[:] = out.astype(out_ref.dtype)


def _expand_kernel_win(tb_ref, ts_ref, wf_ref, lr_ref, xd_ref, out_ref,
                       *, R, ET, f32):
    """Compact-output expand: shared boundary windows accumulate via the
    first-visit flag (each edge is valid in exactly one tile; garbage
    lanes contribute exact zeros through the one-hot). The edge-tile
    axis is INNERMOST so window revisits are consecutive grid steps."""
    t = pl.program_id(1)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (R, ET), 0) == lr_ref[0])
    oh = jnp.where(sel, 1.0, 0.0)
    if f32:
        out = _dot3(oh, xd_ref[:], ((0,), (0,)), True)
    else:
        out = jax.lax.dot_general(
            oh.astype(jnp.bfloat16), xd_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out = out.astype(out_ref.dtype)

    @pl.when(wf_ref[t] == 1)
    def _():
        out_ref[:] = out

    @pl.when(wf_ref[t] == 0)
    def _():
        out_ref[:] = out_ref[:] + out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def expand_dst_csr(x_dst, plan, interpret=False, compact=False):
    """x_dst[row(e)] in plan order WITHOUT the gather engine.

    Edges are dst-sorted into R-row blocks, so each tile's destination
    rows live in ONE dense (R, F) block: the per-edge "gather" is an
    exact one-hot matmul (ET x R) @ (R x F) on the MXU. The gather
    engine runs at ~220 Mrows/s at F=256 (~11 ms for 2.3M edges,
    PERF_NOTES 'gather wall'); this expansion streams ~1.6 GB of dense
    blocks instead (~2 ms). Use for the dst side of edge features
    (GATv2 scores, edge MLPs); pad lanes come out 0. Differentiable
    (backward = the sorted segment-matmul reduce).

    ``compact=True`` (window plans) emits (gather_len, F) in COMPACT
    gather order — alignable with `plan_gather_src_compact` outputs so
    GATv2/HGT-style paths stay compact end to end (and their OWN src
    gathers stay unpadded).
    """
    interpret = interpret or jax.default_backend() != "tpu"
    R, ET, T, nb = plan.R, plan.ET, plan.T, plan.nblocks
    F = x_dst.shape[1]
    F_pad = _lane_pad(F)
    xd = _pad_dst(x_dst, plan)
    if F_pad != F:
        xd = jnp.pad(xd, ((0, 0), (0, F_pad - F)))
    FT = min(512, F_pad)
    while F_pad % FT:
        FT //= 2
    nf = F_pad // FT
    local_row = jnp.asarray(plan.local_row.reshape(T, 1, ET))
    if compact:
        assert plan.tile_src is not None, \
            "expand_dst_csr(compact=True) needs a window plan"
        from gammagl_tpu.ops.pallas.flash_attention import _lane_layout
        ts_np, wf_np, Gt = _lane_layout(plan, plan.gather_len)
        kern = functools.partial(_expand_kernel_win, R=R, ET=ET,
                                 f32=x_dst.dtype == jnp.float32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nf, T),
            in_specs=[
                pl.BlockSpec((1, 1, ET),
                             lambda f, t, tb, ts, wf: (t, 0, 0)),
                pl.BlockSpec((R, FT),
                             lambda f, t, tb, ts, wf: (tb[t], f)),
            ],
            out_specs=pl.BlockSpec((ET, FT),
                                   lambda f, t, tb, ts, wf: (ts[t], f)),
        )
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((plan.gather_len, F_pad),
                                           x_dst.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * R * ET * F_pad * T,
                bytes_accessed=(plan.gather_len + T * R) * F_pad
                * x_dst.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(jnp.asarray(plan.tile_block), jnp.asarray(ts_np),
          jnp.asarray(wf_np), local_row, xd)
        return out[:, :F]
    kern = functools.partial(_expand_kernel, R=R, ET=ET,
                             f32=x_dst.dtype == jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, nf),
        in_specs=[
            pl.BlockSpec((1, 1, ET), lambda t, f, tb: (t, 0, 0)),
            pl.BlockSpec((R, FT), lambda t, f, tb: (tb[t], f)),
        ],
        out_specs=pl.BlockSpec((ET, FT), lambda t, f, tb: (t, f)),
    )
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.E_pad, F_pad), x_dst.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * ET * F_pad * T,
            bytes_accessed=(plan.E_pad + T * R) * F_pad
            * x_dst.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(plan.tile_block), local_row, xd)
    return out[:, :F]


def _expand_fwd(x_dst, plan, interpret, compact=False):
    return (expand_dst_csr(x_dst, plan, interpret, compact),
            x_dst.shape[0])


def _expand_bwd(plan, interpret, compact, n_rows, g):
    # d x_dst[r] = sum_{e: row(e)=r} g[e]: the sorted segment reduce
    # (window-read variant for compact cotangents)
    if compact:
        from gammagl_tpu.ops.pallas.segment_matmul import segment_sum_win
        w = jnp.asarray(plan.valid).astype(jnp.float32)
        return (segment_sum_win(g, w, plan, interpret)[:n_rows],)
    w = jnp.asarray(plan.valid).astype(g.dtype)
    return (_segment_matmul(g, w, plan, interpret)[:n_rows],)


expand_dst_csr.defvjp(_expand_fwd, _expand_bwd)


def sddmm_csr_mh(x_src, x_dst, plan, interpret=False, msg=None):
    """Multi-head `sddmm_csr`: x_src/x_dst (N, H, F) -> (E_pad, H).

    One (N, H*F) gather serves all heads; one pallas_call computes every
    head's scores (grid (H, T, F-tiles))."""
    if msg is None:
        N, H, F = x_src.shape
        msg = gather_rows(x_src.reshape(N, H * F), plan,
                          "src").reshape(-1, H, F)
    return _sddmm_inner_mh(msg, x_dst, plan, interpret)
