"""Sorted segment reduction as block one-hot matmul on the MXU.

This is the TPU-native answer to the reference's scatter-add kernels
(gammagl/mpops/torch_ext/cuda/segment_sum_cuda.cu:19-31 atomicAdd over 1024
threads; cpu/spmm_sum_cpu.cpp:26-40 OpenMP atomics). TPUs have no fast
random-scatter: instead we exploit that edges sorted by destination make the
selection matrix block-banded, so each edge tile reduces into its row block
via a dense (R x ET) weighted one-hot times (ET x F) message matmul -- work
the MXU executes at near peak, making the kernel HBM-bandwidth-bound like a
dense op. It is also fully deterministic (no atomics), unlike the reference.

Performance notes (measured on TPU v5e, arxiv-scale: 2.3M edges, F=256):
  * The XLA scatter-add this replaces runs ~48 ms; this reduce runs
    ~6-9 ms (bf16 single-pass / f32 bf16x3).
  * The random src-row gather feeding SpMM runs at ~240-350 Mrows/s while
    its touched source footprint stays under ~100 MB and collapses ~4x
    beyond -- `BlockedCSRPlan` partitions edges by source row block to
    stay in the fast regime (full SpMM: 26 ms vs 73 ms XLA, 2.8x).
  * The edge-weight multiply is fused into the one-hot factor -- the
    weighted message matrix is never materialized in HBM.

Layout, prepared once per graph on the host (`build_csr_plan`):
  * edges sorted by dst, grouped into row blocks of R destination rows;
  * each block's edge list padded to a multiple of ET (>= one tile per block
    so every output block is initialized);
  * per padded edge: source id (pad -> clamp), local row in [0,R) (pad -> R,
    which the one-hot drops);
  * per tile: its row block and a first-tile flag. Tiles of one block are
    consecutive, so the output block stays resident in VMEM and accumulates
    across grid steps (Pallas revisiting semantics).

The grid is (feature_tiles, edge_tiles) -- edge tiles innermost so the
accumulation pattern holds per feature stripe.
"""

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["CSRPlan", "BlockedCSRPlan", "build_csr_plan",
           "build_csr_plan_blocked", "segment_sum_csr", "spmm_csr",
           "pad_edge_weights", "gather_rows", "segment_matmul_dyn",
           "segment_matmul_dyn_vjp", "pack_halves", "unpack_halves"]


def _cdiv(a, b):
    return -(-a // b)


class CSRPlan:
    """Static per-graph layout for the sorted segment-matmul kernel.

    Hashable by identity so it can ride through ``jit`` as a static argument
    (its numpy arrays become compile-time constants -- one compilation per
    graph/bucket, which is the intended bucketing discipline).
    """

    def __init__(self, *, src_pad, perm, local_row, row_global, tile_block,
                 tile_first, num_nodes, num_src, num_edges, R, ET,
                 tile_src=None, gsrc=None):
        self.src_pad = src_pad          # (E_pad,) int32, pads clamped to 0
        self.perm = perm                # (E_pad,) int32 into original edges
        self.valid = (local_row < R)    # (E_pad,) bool
        self.local_row = local_row      # (E_pad,) int32 in [0,R], R = pad
        self.row_global = row_global    # (E_pad,) int32, pads OOB
        self.tile_block = tile_block    # (T,) int32
        self.tile_first = tile_first    # (T,) int32 0/1
        # Aligned-window ("streamed gather") companion layout, or None:
        #   tile_src : (T,) int32 -- ET-row window index into the COMPACT
        #              gathered array each tile reads (windows of adjacent
        #              dst blocks may overlap; garbage lanes are dropped by
        #              local_row == R exactly like pads)
        #   gsrc     : (G,) int32 -- dst-sorted src ids, UNPADDED except a
        #              clamped tail to a whole number of ET windows. The
        #              gather engine is row-rate-bound (PERF_NOTES), so
        #              gathering E instead of E_pad rows is a direct win.
        self.tile_src = tile_src
        self.gsrc = gsrc
        self.num_nodes = int(num_nodes)
        self.num_src = int(num_src)
        self.num_edges = int(num_edges)
        self.R = int(R)
        self.ET = int(ET)
        self.E_pad = int(local_row.shape[0])
        self.T = int(tile_block.shape[0])
        self.nblocks = _cdiv(self.num_nodes, self.R)
        self.gather_len = None if gsrc is None else int(gsrc.shape[0])

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def __repr__(self):
        return (f"CSRPlan(N={self.num_nodes}, E={self.num_edges}, "
                f"E_pad={self.E_pad}, R={self.R}, ET={self.ET}, T={self.T})")


def build_csr_plan(src, dst, num_nodes, num_src=None, R=256, ET=512,
                   window=False):
    """Build the kernel layout from COO edges (host-side, numpy).

    ``src``/``dst`` need not be pre-sorted; edges are stably sorted by ``dst``
    here and ``perm`` records the mapping back to the caller's edge order so
    per-edge attributes (weights, attention scores) can follow.

    ``window=True`` builds the aligned-window companion layout: the source
    gather is COMPACT (E rows, zero padding -- the gather engine's cost is
    per ROW, so padded rows are pure loss) and each kernel tile reads its
    (ET, F) slab of the gathered array at a per-tile window index
    (``tile_src``, delivered through scalar prefetch). A dst block whose
    edge range is not ET-aligned shares its boundary windows with the
    neighboring blocks; the out-of-range lanes carry ``local_row == R`` /
    zero weight and are dropped by the one-hot exactly like pads. The
    padding the classic layout gathers is +7..30% at arxiv scale
    (R/ET-dependent) -- all of it off the gather-engine clock here.
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    E = int(dst.shape[0])
    num_src = int(num_src if num_src is not None else num_nodes)
    if E:
        # out-of-range endpoints would silently clamp into the last row
        # block (overflowing its padding) — fail loudly instead. Callers
        # that want drop semantics must mask edges before building a plan.
        if int(dst.max()) >= num_nodes or int(dst.min()) < 0:
            raise ValueError(
                f"build_csr_plan: dst out of range [0, {num_nodes}) "
                f"(min {int(dst.min())}, max {int(dst.max())})")
        if int(src.max()) >= num_src or int(src.min()) < 0:
            raise ValueError(
                f"build_csr_plan: src out of range [0, {num_src}) "
                f"(min {int(src.min())}, max {int(src.max())})")
    order = np.argsort(dst, kind="stable")
    src_s = src[order]
    dst_s = dst[order]
    # CSR block boundaries over destination rows.
    block_edges = np.searchsorted(
        dst_s, np.arange(0, _cdiv(num_nodes, R) * R + 1, R), side="left")
    nblocks = len(block_edges) - 1

    if window:
        return _build_window_plan(src_s, dst_s, order, block_edges,
                                  nblocks, num_nodes, num_src, E, R, ET)

    # Fully vectorized layout (the per-block Python loop was the host
    # bottleneck at papers100M scale: ~15 min for a 57M-edge plan; this
    # path builds the same arrays in seconds).
    e_b = np.diff(block_edges)                      # edges per row block
    n_t = np.maximum(1, -(-e_b // ET))              # tiles per row block
    pad_len = n_t * ET                              # padded edges/block
    pad_off = np.concatenate([[0], np.cumsum(pad_len)])
    total = int(pad_off[-1])
    # destination slot of every real (sorted) edge in the padded layout
    blk_of = np.minimum(dst_s // R, nblocks - 1).astype(np.int64)
    idx_in_blk = np.arange(E, dtype=np.int64) - block_edges[blk_of]
    pos = pad_off[blk_of] + idx_in_blk
    perm = np.full(total, E, dtype=np.int64)
    src_pad = np.zeros(total, dtype=np.int64)
    local_row = np.full(total, R, dtype=np.int64)
    perm[pos] = order
    src_pad[pos] = src_s
    local_row[pos] = dst_s - blk_of * R
    tile_block = np.repeat(np.arange(nblocks, dtype=np.int32), n_t)
    tile_first = np.zeros(len(tile_block), dtype=np.int64)
    tile_first[np.concatenate([[0], np.cumsum(n_t)[:-1]])] = 1

    local_row = local_row.astype(np.int32)
    perm = perm.astype(np.int32)
    src_pad = src_pad.astype(np.int32)
    # Global destination row per padded edge (pads land out of range).
    blk_of_edge = np.repeat(tile_block, ET)
    row_global = (blk_of_edge * R + local_row).astype(np.int32)
    return CSRPlan(
        src_pad=src_pad, perm=perm, local_row=local_row,
        row_global=row_global, tile_block=tile_block,
        tile_first=np.asarray(tile_first, dtype=np.int32),
        num_nodes=num_nodes, num_src=num_src, num_edges=E, R=R, ET=ET)


def _build_window_plan(src_s, dst_s, order, block_edges, nblocks,
                       num_nodes, num_src, E, R, ET):
    """Aligned-window layout (see build_csr_plan(window=True)).

    Every tile t of dst block b reads gathered rows
    [tile_src[t]*ET, tile_src[t]*ET + ET) of the COMPACT dst-sorted
    gather; a lane is valid iff its global (sorted) edge index falls in
    block b's range [be[b], be[b+1])."""
    be = block_edges.astype(np.int64)
    if E == 0:
        # Empty relation (hetero graphs routinely carry these): every lane
        # is invalid, but the layout machinery below fancy-indexes
        # src_s/dst_s/order with clamped indices — swap in 1-element
        # dummies so that indexing is defined. `valid` is all-False, so
        # the dummy values never escape the np.where fallbacks.
        src_s = np.zeros(1, dtype=np.int64)
        dst_s = np.zeros(1, dtype=np.int64)
        order = np.zeros(1, dtype=np.int64)
    A = be[:-1] // ET                       # first window per block
    endw = -(-be[1:] // ET)                 # one-past-last window
    wt = np.maximum(1, endw - A)            # tiles per block (>=1)
    T = int(wt.sum())
    tile_block = np.repeat(np.arange(nblocks, dtype=np.int32), wt)
    first_t = np.concatenate([[0], np.cumsum(wt)[:-1]])
    tile_first = np.zeros(T, dtype=np.int32)
    tile_first[first_t] = 1
    k_in_block = np.arange(T, dtype=np.int64) - first_t[tile_block]
    tile_src = (A[tile_block] + k_in_block).astype(np.int32)

    # lane layout: (T, ET) global sorted-edge index per lane
    g_idx = (tile_src.astype(np.int64)[:, None] * ET
             + np.arange(ET, dtype=np.int64)[None, :])
    lo = be[tile_block][:, None]
    hi = be[tile_block + 1][:, None]
    valid = (g_idx >= lo) & (g_idx < hi)
    g_c = np.minimum(g_idx, E - 1) if E else np.zeros_like(g_idx)
    local_row = np.where(
        valid, dst_s[g_c] - tile_block.astype(np.int64)[:, None] * R,
        R).astype(np.int32).reshape(-1)
    perm = np.where(valid, order[g_c], E).astype(np.int32).reshape(-1)
    src_pad = np.where(valid, src_s[g_c], 0).astype(np.int32).reshape(-1)
    row_global = (np.repeat(tile_block, ET).astype(np.int64) * R
                  + local_row).astype(np.int32)

    # cover every window any tile reads (a trailing EMPTY block's forced
    # tile can point one window past ceil(E/ET) when ET divides E)
    G = (int(tile_src.max()) + 1 if T else 1) * ET
    gsrc = np.zeros(G, dtype=np.int32)
    gsrc[:E] = src_s[:E]
    return CSRPlan(
        src_pad=src_pad, perm=perm, local_row=local_row,
        row_global=row_global, tile_block=tile_block,
        tile_first=tile_first, num_nodes=num_nodes, num_src=num_src,
        num_edges=E, R=R, ET=ET, tile_src=tile_src, gsrc=gsrc)


def segment_matmul_dyn(msg, w2d, local_row, tile_block, tile_first, *,
                       R, ET, nblocks, interpret=False):
    """The segment-matmul kernel with the plan layout as *traced* operands.

    Same computation as `segment_sum_csr` but `local_row`/`tile_block`/
    `tile_first`/`w2d` are jnp arrays instead of plan constants, so one
    compiled program can serve differently-shaped layouts of equal padded
    size — the per-device plans of a `shard_map` body in particular
    (parallel/halo_plan.py stacks one plan per device and feeds each shard
    its own slice). Only the tile geometry (R, ET, T, nblocks) is static.

    msg:        (T*ET, F) messages in padded plan order
    w2d:        (T, 1, ET) weights, zero at pads
    local_row:  (T, 1, ET) int32 in [0, R]; R = pad (one-hot drops it)
    tile_block: (T,) int32 output block per tile (tiles of a block
                consecutive)
    tile_first: (T,) int32 1 on a block's first tile
    Returns (nblocks*R, F).
    """
    # auto-interpret off-TPU so library callers never thread the flag
    interpret = interpret or jax.default_backend() != "tpu"
    T = int(tile_block.shape[0])
    E_pad, F = msg.shape
    assert E_pad == T * ET, (E_pad, T, ET)
    F_pad = _cdiv(F, 128) * 128
    if F_pad != F:
        msg = jnp.pad(msg, ((0, 0), (0, F_pad - F)))
    FT = min(512, F_pad)
    while F_pad % FT:
        FT //= 2
    local_row = local_row.reshape(T, 1, ET)
    w2d = w2d.reshape(T, 1, ET)

    # The one-hot factor carries the edge weight. For f32 we run a manual
    # bf16x3 decomposition (split weights and messages into bf16 hi+lo,
    # drop only the lo*lo term, ~2^-16 relative error): three single-pass
    # bf16 MXU matmuls with f32 accumulation -- 2x faster than Mosaic's
    # HIGHEST path (which Precision.HIGH would give but is unsupported).
    # bf16 messages run one pass (the one-hot is exact in bf16).
    f32_path = msg.dtype == jnp.float32

    def kernel(tb_ref, tf_ref, lr_ref, w_ref, msg_ref, out_ref):
        t = pl.program_id(1)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (R, ET), 0) == lr_ref[0])
        m = msg_ref[:]
        if f32_path:
            w = w_ref[0]
            # hi/lo splits stay in f32 for the select (Mosaic cannot
            # relayout the i1 mask to bf16 tiling), then cast exactly.
            w_hi_f = w.astype(jnp.bfloat16).astype(jnp.float32)
            w_lo_f = w - w_hi_f
            m_hi = m.astype(jnp.bfloat16)
            m_lo = (m - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            oh_hi = jnp.where(sel, w_hi_f, 0.0).astype(jnp.bfloat16)
            oh_lo = jnp.where(sel, w_lo_f, 0.0).astype(jnp.bfloat16)
            acc = (jnp.dot(oh_hi, m_hi, preferred_element_type=jnp.float32)
                   + jnp.dot(oh_hi, m_lo,
                             preferred_element_type=jnp.float32)
                   + jnp.dot(oh_lo, m_hi,
                             preferred_element_type=jnp.float32))
        else:
            # select in f32 (Mosaic cannot relayout the i1 mask to bf16
            # tiling), then cast exactly -- weights are bf16-representable
            onehot_w = jnp.where(sel, w_ref[0].astype(jnp.float32),
                                 0.0).astype(m.dtype)
            acc = jnp.dot(onehot_w, m, preferred_element_type=jnp.float32)

        @pl.when(tf_ref[t] == 1)
        def _():
            out_ref[:] = acc.astype(out_ref.dtype)

        @pl.when(tf_ref[t] == 0)
        def _():
            out_ref[:] = out_ref[:] + acc.astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(F_pad // FT, T),
        in_specs=[
            pl.BlockSpec((1, 1, ET), lambda f, t, tb, tf: (t, 0, 0)),
            pl.BlockSpec((1, 1, ET), lambda f, t, tb, tf: (t, 0, 0)),
            pl.BlockSpec((ET, FT), lambda f, t, tb, tf: (t, f)),
        ],
        out_specs=pl.BlockSpec((R, FT), lambda f, t, tb, tf: (tb[t], f)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblocks * R, F_pad), msg.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * ET * F_pad * T,
            bytes_accessed=(E_pad * F_pad + nblocks * R * F_pad)
            * msg.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(tile_block, tile_first, local_row, w2d, msg)
    return out[:, :F]


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _segment_matmul_dyn_vjp(msg, w2d, local_row, tile_block, tile_first,
                            R, ET, nblocks, interpret):
    return segment_matmul_dyn(msg, w2d, local_row, tile_block, tile_first,
                              R=R, ET=ET, nblocks=nblocks,
                              interpret=interpret)


def _segment_matmul_dyn_fwd(msg, w2d, local_row, tile_block, tile_first,
                            R, ET, nblocks, interpret):
    out = segment_matmul_dyn(msg, w2d, local_row, tile_block, tile_first,
                             R=R, ET=ET, nblocks=nblocks,
                             interpret=interpret)
    return out, (msg, w2d, local_row, tile_block)


def _segment_matmul_dyn_bwd(R, ET, nblocks, interpret, res, g):
    # Same math as _segment_matmul_bwd, with rows rebuilt from the traced
    # layout arrays: row(e) = tile_block[t]*R + local_row[e]. Pad edges
    # carry w=0, which zeroes both cotangent leaks through the clamp.
    msg, w2d, local_row, tile_block = res
    T = tile_block.shape[0]
    rows = jnp.minimum(tile_block[:, None, None] * R + local_row,
                       nblocks * R - 1).reshape(-1)
    g_rows = jnp.take(g, rows, axis=0)
    dmsg = g_rows * w2d.reshape(-1)[:, None]
    valid = (local_row < R).reshape(-1)
    dw = (jnp.sum(g_rows * msg, axis=-1)
          * valid.astype(msg.dtype)).reshape(T, 1, ET).astype(w2d.dtype)
    f0 = jax.dtypes.float0
    return (dmsg, dw,
            np.zeros(local_row.shape, f0), np.zeros(tile_block.shape, f0),
            np.zeros(tile_block.shape, f0))


_segment_matmul_dyn_vjp.defvjp(_segment_matmul_dyn_fwd,
                               _segment_matmul_dyn_bwd)


def segment_matmul_dyn_vjp(msg, w2d, local_row, tile_block, tile_first, *,
                           R, ET, nblocks, interpret=False):
    """Differentiable `segment_matmul_dyn` (grads to msg and w2d)."""
    return _segment_matmul_dyn_vjp(msg, w2d, local_row, tile_block,
                                   tile_first, R, ET, nblocks, interpret)


def _segment_matmul_pallas(msg, w_pad, plan, interpret=False):
    """Weighted sorted segment sum: out[r] = sum_{e: row(e)=r} w[e] * msg[e].

    msg:   (E_pad, F) in padded sorted order
    w_pad: (E_pad,) with zeros at pads (zeros also drop padded messages, so
           no separate validity mask is needed)
    Returns (nblocks*R, F).
    """
    assert msg.shape[0] == plan.E_pad, (msg.shape, plan.E_pad)
    return segment_matmul_dyn(
        msg, w_pad.reshape(plan.T, 1, plan.ET),
        jnp.asarray(plan.local_row.reshape(plan.T, 1, plan.ET)),
        jnp.asarray(plan.tile_block), jnp.asarray(plan.tile_first),
        R=plan.R, ET=plan.ET, nblocks=plan.nblocks, interpret=interpret)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _segment_matmul(msg, w_pad, plan, interpret=False):
    return _segment_matmul_pallas(msg, w_pad, plan, interpret)


def _segment_matmul_fwd(msg, w_pad, plan, interpret=False):
    out = _segment_matmul_pallas(msg, w_pad, plan, interpret)
    return out, (msg, w_pad)


def _segment_matmul_bwd(plan, interpret, res, g):
    # d msg[e] = w[e] * g[row(e)]; d w[e] = <msg[e], g[row(e)]>. Zero w at
    # pads kills both leaks through the clamped gather (reference analog:
    # SegmentSum backward = gather, torch_ext/src/segment_sum.cpp:43-54).
    msg, w_pad = res
    rows = jnp.asarray(np.minimum(plan.row_global,
                                  plan.nblocks * plan.R - 1))
    g_rows = jnp.take(g, rows, axis=0)
    dmsg = g_rows * w_pad[:, None]
    dw = jnp.sum(g_rows * msg, axis=-1) * jnp.asarray(
        plan.valid).astype(msg.dtype)
    return dmsg, dw


_segment_matmul.defvjp(_segment_matmul_fwd, _segment_matmul_bwd)


def segment_sum_csr(msg_pad, plan, interpret=False):
    """Segment-sum of messages already laid out in the plan's padded order.

    Returns (num_nodes, F). Differentiable w.r.t. ``msg_pad``.
    """
    w = jnp.asarray(plan.valid).astype(msg_pad.dtype)
    out = _segment_matmul(msg_pad, w, plan, interpret)
    return out[:plan.num_nodes]


def _transpose_plan(plan, n_rows):
    """Source-sorted companion plan for the gather VJP, cached per plan.

    The VJP of the per-edge source gather is a scatter-add by src — on TPU
    that is exactly this module's sorted segment reduce with src playing
    the destination role. Forward-pad edges are routed to a sentinel row
    (n_rows) so their cotangents never touch real rows; the sentinel is
    sliced away by the caller.
    """
    cache = getattr(plan, "_tplans", None)
    if cache is None:
        cache = plan._tplans = {}
    tp = cache.get(n_rows)
    if tp is None:
        dst_t = np.where(plan.valid, plan.src_pad, n_rows).astype(np.int64)
        tp = build_csr_plan(np.zeros_like(dst_t), dst_t, n_rows + 1,
                            num_src=plan.E_pad, R=plan.R, ET=plan.ET)
        cache[n_rows] = tp
    return tp


def _scatter_rows_by(v, plan, index_kind, n_rows):
    """Segment-reduce padded-plan-order cotangents v (E_pad, ...) back to
    (n_rows, ...) rows: by 'src' (via the cached transpose plan) or by
    'dst' (the plan itself already IS dst-sorted — no permutation needed).
    1-D cotangents use the XLA scalar scatter (cheap); row cotangents run
    on the MXU kernel, replacing XLA's scatter-add (~5x at arxiv scale).
    """
    valid = jnp.asarray(plan.valid)
    if index_kind == "src":
        if v.ndim == 1:
            vv = jnp.where(valid, v, 0)
            return jax.ops.segment_sum(vv, jnp.asarray(plan.src_pad),
                                       num_segments=n_rows)
        tp = _transpose_plan(plan, n_rows)
        v_ext = jnp.concatenate(
            [v, jnp.zeros((1,) + v.shape[1:], v.dtype)])
        v_t = jnp.take(v_ext, jnp.asarray(
            np.minimum(tp.perm, plan.E_pad)), axis=0)
        w = jnp.asarray(tp.valid).astype(v.dtype)
        return _segment_matmul(v_t, w, tp, False)[:n_rows]
    # dst: v is already in the plan's dst-sorted order
    if v.ndim == 1:
        rows = jnp.asarray(np.minimum(plan.row_global,
                                      plan.nblocks * plan.R - 1))
        vv = jnp.where(valid, v, 0)
        return jax.ops.segment_sum(vv, rows,
                                   num_segments=plan.nblocks * plan.R
                                   )[:n_rows]
    w = jnp.asarray(plan.valid).astype(v.dtype)
    return _segment_matmul(v, w, plan, False)[:n_rows]


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def gather_rows(x, plan, index_kind="src"):
    """Per-edge endpoint gather x[src|dst] in padded plan order, with a
    kernel-backed VJP (scatter-add rides the sorted segment-matmul instead
    of XLA's scatter)."""
    if index_kind == "src":
        idx = jnp.asarray(plan.src_pad)
    else:
        idx = jnp.asarray(np.minimum(plan.row_global, plan.num_nodes - 1))
    return jnp.take(x, idx, axis=0)


def _gather_rows_fwd(x, plan, index_kind):
    return gather_rows(x, plan, index_kind), x.shape[0]


def _gather_rows_bwd(plan, index_kind, n_rows, v):
    return (_scatter_rows_by(v, plan, index_kind, n_rows),)


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def _swap_plan(plan, n_src_rows):
    """Transpose-graph companion plan over the ORIGINAL edges (endpoint
    roles swapped), plus the host-side lane map from swap-plan lanes to
    forward-plan lanes (so weights given in forward-plan padded order can
    follow). Cached per (plan, n_src_rows).

    This powers the direct SpMM backward: dx = A^T (w ⊙ g) as ONE
    gather + weighted segment reduce (one E x F read of g), instead of
    materializing the per-edge cotangent and re-permuting it (two extra
    E x F HBM round trips).
    """
    cache = getattr(plan, "_swapplans", None)
    if cache is None:
        cache = plan._swapplans = {}
    entry = cache.get(n_src_rows)
    if entry is None:
        # operate on the plan's own valid lanes (a blocked sub-plan holds
        # only a SUBSET of the graph's edges; its perm carries global ids,
        # so never index by perm here)
        valid = plan.valid
        lanes = np.nonzero(valid)[0]              # fwd lane per local edge
        src_o = plan.src_pad[valid].astype(np.int64)
        dst_o = plan.row_global[valid].astype(np.int64)
        k = len(lanes)
        tp = build_csr_plan(dst_o, src_o, n_src_rows,
                            num_src=plan.num_nodes, R=plan.R, ET=plan.ET,
                            window=plan.tile_src is not None)
        # swap-plan lane -> forward-plan lane (pads -> E_pad sentinel);
        # k == 0 (empty relation / empty bucket): every lane is a pad
        if k == 0:
            lane_map = np.full(tp.E_pad, plan.E_pad, np.int32)
        else:
            lane_map = np.where(
                tp.perm < k, lanes[np.minimum(tp.perm, k - 1)],
                plan.E_pad).astype(np.int32)
        entry = cache[n_src_rows] = (tp, lane_map)
    return entry


def _spmm_gather_reduce(x, w_pad, plan, interpret):
    """Endpoint gather + weighted segment reduce, picking the
    packed-gather kernel when the dtype/width qualifies (bf16, F % 256
    == 0): the f32 bitcast view halves the gather engine's lane groups —
    the dominant SpMM cost (see _packed_kernel). Window plans
    (build_csr_plan(window=True)) additionally gather COMPACT (E rows,
    no padding) and stream per-tile windows through scalar-prefetched
    block indices."""
    if plan.tile_src is not None and x.shape[1] % 128 == 0:
        return _spmm_win_forward(x, w_pad, plan, interpret)
    if _packed_eligible(x, w_pad):
        return _spmm_packed_forward(x, w_pad, plan, interpret)
    msg = jnp.take(x, jnp.asarray(plan.src_pad), axis=0)
    return _segment_matmul_pallas(msg, w_pad, plan, interpret)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _spmm_fused(x, w_pad, plan, interpret):
    """gather(x by src) + weighted segment reduce, with a transpose-plan
    backward (see _swap_plan). Weights are in the plan's padded order."""
    return _spmm_gather_reduce(x, w_pad, plan, interpret)


def _spmm_fused_fwd(x, w_pad, plan, interpret):
    return _spmm_fused(x, w_pad, plan, interpret), (x, w_pad)


def _spmm_fused_bwd(plan, interpret, res, g):
    x, w_pad = res
    tp, lane_map = _swap_plan(plan, x.shape[0])
    # dx[s] = sum_{e: src(e)=s} w_e g[dst_e]: the transpose-graph SpMM
    w_ext = jnp.concatenate([w_pad, jnp.zeros(1, w_pad.dtype)])
    w_t = jnp.take(w_ext, jnp.asarray(np.minimum(lane_map, plan.E_pad)))
    dx = _spmm_gather_reduce(g.astype(x.dtype), w_t, tp,
                             interpret)[:x.shape[0]]
    # dw[e] = <x[src_e], g[dst_e]> in forward-plan order (SDDMM); dead-code
    # eliminated by XLA when weights are constants (GCN norms)
    rows = jnp.asarray(np.minimum(plan.row_global,
                                  plan.nblocks * plan.R - 1))
    g_rows = jnp.take(g, rows, axis=0)
    msg = jnp.take(x, jnp.asarray(plan.src_pad), axis=0)
    dw = jnp.sum(g_rows.astype(jnp.float32) * msg.astype(jnp.float32),
                 axis=-1).astype(w_pad.dtype) * jnp.asarray(
        plan.valid).astype(w_pad.dtype)
    return dx, dw


_spmm_fused.defvjp(_spmm_fused_fwd, _spmm_fused_bwd)


def _packed_eligible(x, w_pad):
    """bf16 features whose half-width is a whole number of 128-lane
    groups (and fits one feature tile) ride the packed-gather kernel."""
    return (x.dtype == jnp.bfloat16 and x.ndim == 2
            and x.shape[1] % 256 == 0 and x.shape[1] // 2 <= 512)


def pack_halves(x):
    """Half-packed f32 view of bf16 features: word i of a row carries
    column i in its low 16 bits and column i + F/2 in its high 16 bits
    (both raw bf16 bit patterns).

    The gather engine is lane-group-rate-bound, so gathering the (N,
    F/2) f32 view instead of (N, F) bf16 halves the dominant SpMM cost.
    Pairing column i with i + F/2 (instead of the adjacent 2i/2i+1 that
    a plain bitcast view gives) keeps the pack a SAME-SHAPE elementwise
    fusion -- measured 3.8 ms -> <0.3 ms at arxiv scale, because the
    adjacent pairing forces an XLA relayout -- and makes the kernel's
    two unpacked halves land in natural [left | right] column order (no
    epilogue interleave transpose, another ~2.9 ms saved). bf16 -> f32
    conversion is exactly a 16-bit left shift of the bit pattern, which
    is what the (lo >> 16) | hi arithmetic below relies on.
    """
    F2 = x.shape[-1] // 2
    lo = jax.lax.bitcast_convert_type(
        x[..., :F2].astype(jnp.float32), jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        x[..., F2:].astype(jnp.float32), jnp.uint32)
    return jax.lax.bitcast_convert_type((lo >> 16) | hi, jnp.float32)


def unpack_halves(w):
    """Inverse of `pack_halves`: (..., F/2) f32 -> (..., F) bf16."""
    u = jax.lax.bitcast_convert_type(w, jnp.uint32)
    left = jax.lax.bitcast_convert_type(
        u << 16, jnp.float32).astype(jnp.bfloat16)
    right = jax.lax.bitcast_convert_type(
        u & jnp.uint32(0xFFFF0000), jnp.float32).astype(jnp.bfloat16)
    return jnp.concatenate([left, right], axis=-1)


def _unpack_tile(g):
    """In-kernel unpack of a half-packed (ET, F2) f32 slab into its two
    bf16 halves (left = low 16 bits = columns [0, F2), right = high =
    columns [F2, F)). u32 shifts + same-width bitcasts -- in-register,
    no relayout."""
    w32 = jax.lax.bitcast_convert_type(g, jnp.uint32)
    left = jax.lax.bitcast_convert_type(
        w32 << 16, jnp.float32).astype(jnp.bfloat16)
    right = jax.lax.bitcast_convert_type(
        w32 & jnp.uint32(0xFFFF0000), jnp.float32).astype(jnp.bfloat16)
    return left, right


def _packed_kernel(tb_ref, tf_ref, lr_ref, w_ref, g_ref, out_ref, *,
                   R, ET):
    """Packed-gather segment matmul: g holds (ET, F/2) f32 words in the
    `pack_halves` layout. The kernel splits each 32-bit word into its
    two bf16 halves with u32 shifts + same-width bitcasts in-register
    and reduces both halves with one-hot matmuls; [left | right] IS the
    natural column order. Bit-identical to the unpacked kernel."""
    t = pl.program_id(0)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (R, ET), 0) == lr_ref[0])
    left, right = _unpack_tile(g_ref[:])
    oh = jnp.where(sel, w_ref[0].astype(jnp.float32),
                   0.0).astype(jnp.bfloat16)
    acc = jnp.concatenate(
        [jnp.dot(oh, left, preferred_element_type=jnp.float32),
         jnp.dot(oh, right, preferred_element_type=jnp.float32)], axis=1)

    @pl.when(tf_ref[t] == 1)
    def _():
        out_ref[:] = acc.astype(out_ref.dtype)

    @pl.when(tf_ref[t] == 0)
    def _():
        out_ref[:] = out_ref[:] + acc.astype(out_ref.dtype)


def _spmm_packed_forward(x, w_pad, plan, interpret):
    """gather (half-packed f32 view) + packed-unpack reduce. Returns the
    full (nblocks*R, F) table like _spmm_fused's forward."""
    interpret = interpret or jax.default_backend() != "tpu"
    R, ET, T, nb = plan.R, plan.ET, plan.T, plan.nblocks
    N, F = x.shape
    F2 = F // 2
    g = jnp.take(pack_halves(x), jnp.asarray(plan.src_pad), axis=0)
    kern = partial(_packed_kernel, R=R, ET=ET)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, ET), lambda t, tb, tf: (t, 0, 0)),
            pl.BlockSpec((1, 1, ET), lambda t, tb, tf: (t, 0, 0)),
            pl.BlockSpec((ET, F2), lambda t, tb, tf: (t, 0)),
        ],
        out_specs=pl.BlockSpec((R, F), lambda t, tb, tf: (tb[t], 0)),
    )
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * R, F), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * ET * F * T,
            bytes_accessed=plan.E_pad * F2 * 4 + nb * R * F * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(plan.tile_block), jnp.asarray(plan.tile_first),
      jnp.asarray(plan.local_row.reshape(T, 1, ET)),
      w_pad.astype(jnp.float32).reshape(T, 1, ET), g)
    return out  # [left | right] IS natural order under pack_halves


def _packed_win_kernel(tb_ref, tf_ref, ts_ref, lr_ref, w_ref, g_ref,
                       out_ref, *, R, ET):
    """_packed_kernel body with the window index prefetch in the arg list
    (the g BlockSpec consumes ts_ref; the body itself is identical)."""
    t = pl.program_id(0)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (R, ET), 0) == lr_ref[0])
    left, right = _unpack_tile(g_ref[:])
    oh = jnp.where(sel, w_ref[0].astype(jnp.float32),
                   0.0).astype(jnp.bfloat16)
    acc = jnp.concatenate(
        [jnp.dot(oh, left, preferred_element_type=jnp.float32),
         jnp.dot(oh, right, preferred_element_type=jnp.float32)], axis=1)

    @pl.when(tf_ref[t] == 1)
    def _():
        out_ref[:] = acc.astype(out_ref.dtype)

    @pl.when(tf_ref[t] == 0)
    def _():
        out_ref[:] = out_ref[:] + acc.astype(out_ref.dtype)


def _plain_win_kernel(tb_ref, tf_ref, ts_ref, lr_ref, w_ref, g_ref,
                      out_ref, *, R, ET, f32):
    """Unpacked window kernel: one-hot reduce of a compact-gathered (ET,
    FT) slab (same math as segment_matmul_dyn's kernel)."""
    t = pl.program_id(1)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (R, ET), 0) == lr_ref[0])
    m = g_ref[:]
    if f32:
        w = w_ref[0]
        w_hi_f = w.astype(jnp.bfloat16).astype(jnp.float32)
        w_lo_f = w - w_hi_f
        m_hi = m.astype(jnp.bfloat16)
        m_lo = (m - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        oh_hi = jnp.where(sel, w_hi_f, 0.0).astype(jnp.bfloat16)
        oh_lo = jnp.where(sel, w_lo_f, 0.0).astype(jnp.bfloat16)
        acc = (jnp.dot(oh_hi, m_hi, preferred_element_type=jnp.float32)
               + jnp.dot(oh_hi, m_lo, preferred_element_type=jnp.float32)
               + jnp.dot(oh_lo, m_hi, preferred_element_type=jnp.float32))
    else:
        onehot_w = jnp.where(sel, w_ref[0].astype(jnp.float32),
                             0.0).astype(m.dtype)
        acc = jnp.dot(onehot_w, m, preferred_element_type=jnp.float32)

    @pl.when(tf_ref[t] == 1)
    def _():
        out_ref[:] = acc.astype(out_ref.dtype)

    @pl.when(tf_ref[t] == 0)
    def _():
        out_ref[:] = out_ref[:] + acc.astype(out_ref.dtype)


def _spmm_win_forward(x, w_pad, plan, interpret):
    """Compact gather + window-streamed reduce for a window plan.

    The gather fetches exactly E rows (plus a clamped tail to a whole
    window); each tile's (ET, F) slab is located by the scalar-prefetched
    ``tile_src``, so Mosaic's automatic block pipelining double-buffers
    the slab reads. bf16 F%256==0 rides the packed (f32 bitcast) view.
    Returns the full (nblocks*R, F) table like _spmm_fused's forward."""
    interpret = interpret or jax.default_backend() != "tpu"
    R, ET, T, nb = plan.R, plan.ET, plan.T, plan.nblocks
    N, F = x.shape
    tb = jnp.asarray(plan.tile_block)
    tf = jnp.asarray(plan.tile_first)
    ts = jnp.asarray(plan.tile_src)
    lr = jnp.asarray(plan.local_row.reshape(T, 1, ET))
    gsrc = jnp.asarray(plan.gsrc)
    if _packed_eligible(x, w_pad):
        F2 = F // 2
        g = jnp.take(pack_halves(x), gsrc, axis=0)
        kern = partial(_packed_win_kernel, R=R, ET=ET)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, 1, ET), lambda t, tb, tf, ts: (t, 0, 0)),
                pl.BlockSpec((1, 1, ET), lambda t, tb, tf, ts: (t, 0, 0)),
                pl.BlockSpec((ET, F2), lambda t, tb, tf, ts: (ts[t], 0)),
            ],
            out_specs=pl.BlockSpec((R, F),
                                   lambda t, tb, tf, ts: (tb[t], 0)),
        )
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb * R, F), jnp.bfloat16),
            cost_estimate=pl.CostEstimate(
                flops=2 * R * ET * F * T,
                bytes_accessed=T * ET * F2 * 4 + nb * R * F * 2,
                transcendentals=0,
            ),
            interpret=interpret,
        )(tb, tf, ts, lr, w_pad.astype(jnp.float32).reshape(T, 1, ET), g)
        return out  # [left | right] IS natural order under pack_halves
    # unpacked: any dtype, F a multiple of 128
    g = jnp.take(x, gsrc, axis=0)
    FT = min(512, F)
    while F % FT:
        FT //= 2
    nf = F // FT
    f32 = x.dtype == jnp.float32
    kern = partial(_plain_win_kernel, R=R, ET=ET, f32=f32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nf, T),
        in_specs=[
            pl.BlockSpec((1, 1, ET), lambda f, t, tb, tf, ts: (t, 0, 0)),
            pl.BlockSpec((1, 1, ET), lambda f, t, tb, tf, ts: (t, 0, 0)),
            pl.BlockSpec((ET, FT), lambda f, t, tb, tf, ts: (ts[t], f)),
        ],
        out_specs=pl.BlockSpec((R, FT),
                               lambda f, t, tb, tf, ts: (tb[t], f)),
    )
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * R, F), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * ET * F * T,
            bytes_accessed=(T * ET + nb * R) * F * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(tb, tf, ts, lr,
      w_pad.astype(jnp.float32).reshape(T, 1, ET), g)
    return out


def segment_sum_win(v, w_pad, plan, interpret=False):
    """Weighted segment reduce of COMPACT (window-order) per-edge rows.

    v (gather_len, F) holds one row per dst-sorted edge (plus clamped
    tail); each kernel tile reads its (ET, F) slab at the plan's window
    index and reduces via the weighted one-hot (w_pad is lane-order,
    zero at invalid lanes, so an edge shared between two tiles' windows
    contributes exactly once). This is the scatter side of the compact
    attention paths (expand_dst_csr(compact=True) backward and friends).
    Returns (nblocks*R, F).
    """
    interpret = interpret or jax.default_backend() != "tpu"
    assert plan.tile_src is not None, "segment_sum_win needs a window plan"
    R, ET, T, nb = plan.R, plan.ET, plan.T, plan.nblocks
    G, F = v.shape
    assert G == plan.gather_len, (G, plan.gather_len)
    FT = min(512, F)
    while F % FT:
        FT //= 2
    nf = F // FT
    f32 = v.dtype == jnp.float32
    kern = partial(_plain_win_kernel, R=R, ET=ET, f32=f32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nf, T),
        in_specs=[
            pl.BlockSpec((1, 1, ET), lambda f, t, tb, tf, ts: (t, 0, 0)),
            pl.BlockSpec((1, 1, ET), lambda f, t, tb, tf, ts: (t, 0, 0)),
            pl.BlockSpec((ET, FT), lambda f, t, tb, tf, ts: (ts[t], f)),
        ],
        out_specs=pl.BlockSpec((R, FT),
                               lambda f, t, tb, tf, ts: (tb[t], f)),
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * R, F), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * ET * F * T,
            bytes_accessed=(T * ET + nb * R) * F * v.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(plan.tile_block), jnp.asarray(plan.tile_first),
      jnp.asarray(plan.tile_src),
      jnp.asarray(plan.local_row.reshape(T, 1, ET)),
      w_pad.astype(jnp.float32).reshape(T, 1, ET), v)


def segment_matmul_dyn_packed(g_packed, w2d, local_row, tile_block,
                              tile_first, *, R, ET, nblocks,
                              interpret=False, out_acc=None):
    """Packed-gather segment matmul with TRACED layout operands (the
    `segment_matmul_dyn` analog of `_spmm_packed_forward`) — for the
    shard_map halo tiers, whose per-device plans arrive as sliced jnp
    arrays. ``g_packed`` is (T*ET, F/2) f32, the gather of the bf16
    feature table's `pack_halves` view. Returns (nblocks*R, F) bf16 in
    natural column order. NOT differentiable — callers must provide
    their own backward (the planned halo tiers run dx = A^T g via the
    transpose partition, bypassing autodiff here).

    ``out_acc``: optional (nblocks*R, F) bf16 accumulator the kernel
    FOLDS IN on each block's first tile — the src-blocked halo tiers
    chain per-block partial sums this way inside the kernel (2 HBM
    passes per block: read prev + write out) instead of materializing
    every partial and adding outside (4 passes: store + read,read,write
    — measured 9.05 -> 9.9 M e/s on the papers100M 3.6M-node shard).
    """
    interpret = interpret or jax.default_backend() != "tpu"
    T = int(tile_block.shape[0])
    E_pad, F2 = g_packed.shape
    assert E_pad == T * ET, (E_pad, T, ET)
    F = 2 * F2
    local_row = local_row.reshape(T, 1, ET)
    w2d = w2d.reshape(T, 1, ET)
    accumulate = out_acc is not None

    def kernel(tb_ref, tf_ref, lr_ref, w_ref, g_ref, *refs):
        if accumulate:
            prev_ref, out_ref = refs
        else:
            (out_ref,) = refs
        t = pl.program_id(0)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (R, ET), 0)
               == lr_ref[0])
        left, right = _unpack_tile(g_ref[:])
        oh = jnp.where(sel, w_ref[0].astype(jnp.float32),
                       0.0).astype(jnp.bfloat16)
        acc = jnp.concatenate(
            [jnp.dot(oh, left, preferred_element_type=jnp.float32),
             jnp.dot(oh, right, preferred_element_type=jnp.float32)],
            axis=1)

        @pl.when(tf_ref[t] == 1)
        def _():
            if accumulate:
                out_ref[:] = prev_ref[:] + acc.astype(out_ref.dtype)
            else:
                out_ref[:] = acc.astype(out_ref.dtype)

        @pl.when(tf_ref[t] == 0)
        def _():
            out_ref[:] = out_ref[:] + acc.astype(out_ref.dtype)

    acc_in, acc_spec = (), ()
    if accumulate:
        acc_in = (out_acc,)
        acc_spec = (pl.BlockSpec((R, F), lambda t, tb, tf: (tb[t], 0)),)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, ET), lambda t, tb, tf: (t, 0, 0)),
            pl.BlockSpec((1, 1, ET), lambda t, tb, tf: (t, 0, 0)),
            pl.BlockSpec((ET, F2), lambda t, tb, tf: (t, 0)),
            *acc_spec,
        ],
        out_specs=pl.BlockSpec((R, F), lambda t, tb, tf: (tb[t], 0)),
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblocks * R, F), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * ET * F * T,
            bytes_accessed=E_pad * F2 * 4
            + nblocks * R * F * 2 * (2 if accumulate else 1),
            transcendentals=0,
        ),
        interpret=interpret,
    )(tile_block, tile_first, local_row, w2d, g_packed, *acc_in)
    return out  # [left | right] IS natural order under pack_halves


class BlockedCSRPlan:
    """Per-source-block sub-plans (hashable by identity, like CSRPlan).

    The TPU gather engine's throughput collapses once the *touched source
    footprint* of one gather exceeds ~100 MB (measured: 309 Mrows/s at
    87 MB vs 75-88 Mrows/s at 170-350 MB). Partitioning edges by source
    row block keeps every gather inside the fast regime; the per-block
    partial sums are chained with adds, which also forces XLA to run the
    gathers sequentially instead of interleaving their working sets.
    """

    def __init__(self, blocks, num_nodes, num_src, num_edges):
        self.blocks = blocks            # list[CSRPlan] (disjoint edges)
        self.num_nodes = int(num_nodes)
        self.num_src = int(num_src)
        self.num_edges = int(num_edges)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def __repr__(self):
        return (f"BlockedCSRPlan(N={self.num_nodes}, E={self.num_edges}, "
                f"src_blocks={len(self.blocks)})")


def build_csr_plan_blocked(src, dst, num_nodes, num_src=None, R=256,
                           ET=256, num_src_blocks=2, window=False):
    """Source-blocked layout: edges partitioned by src row block, each
    block dst-sorted into its own CSRPlan (global src ids -- the gather
    stays on the full feature matrix but only touches the block's rows)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    num_src = int(num_src if num_src is not None else num_nodes)
    if num_src_blocks <= 1:
        return build_csr_plan(src, dst, num_nodes, num_src, R=R, ET=ET,
                              window=window)
    rows_per = -(-num_src // num_src_blocks)
    owner = np.minimum(src // rows_per, num_src_blocks - 1)
    blocks = []
    E = len(src)
    for b in range(num_src_blocks):
        sel = np.nonzero(owner == b)[0]
        sub = build_csr_plan(src[sel], dst[sel], num_nodes, num_src,
                             R=R, ET=ET, window=window)
        # remap perm from block-local to original edge ids (pads stay OOB;
        # an empty bucket has only pads, all of which map to E)
        if len(sel):
            perm = np.where(sub.perm < len(sel),
                            sel[np.minimum(sub.perm, len(sel) - 1)], E
                            ).astype(np.int32)
        else:
            perm = np.full_like(sub.perm, E, dtype=np.int32)
        sub.perm = perm
        sub.num_edges = E
        blocks.append(sub)
    return BlockedCSRPlan(blocks, num_nodes, num_src, E)


def _edge_weights_padded(edge_weight, plan, dtype):
    if edge_weight is not None:
        w_ext = jnp.concatenate(
            [edge_weight.reshape(-1), jnp.zeros(1, edge_weight.dtype)])
        return jnp.take(w_ext, jnp.asarray(
            np.minimum(plan.perm, plan.num_edges)))
    return jnp.asarray(plan.valid).astype(dtype)


def pad_edge_weights(plan, edge_weight):
    """Permute original-edge-order weights into the plan's padded order.

    The permutation is itself a 2-10ms scalar gather at arxiv scale -- for
    weights that are static per graph (GCN norms), call this ONCE outside
    the train step and pass the result via ``weights_padded=True``. Per-step
    weights (attention) should instead be computed directly in padded order
    from `plan.src_pad` / `plan.row_global` gathers.

    Returns one (E_pad,) array for a CSRPlan, a tuple of them for a
    BlockedCSRPlan.
    """
    if isinstance(plan, BlockedCSRPlan):
        return tuple(_edge_weights_padded(edge_weight, b,
                                          edge_weight.dtype)
                     for b in plan.blocks)
    return _edge_weights_padded(edge_weight, plan, edge_weight.dtype)


def spmm_csr(x, edge_weight, plan, interpret=False, weights_padded=False):
    """out[d] = sum_{(s,d)} w_sd * x[s] using the Pallas segment-matmul.

    ``edge_weight`` is in the caller's original edge order ((E,) or None);
    each plan's ``perm`` carries it into padded sorted order with zero
    pads, which both masks padded messages and zeroes their backward
    contribution. Pass ``weights_padded=True`` with the output of
    `pad_edge_weights` to skip the per-call permutation (recommended for
    static weights). Accepts a `CSRPlan` or a `BlockedCSRPlan` (use
    `build_csr_plan_blocked` when the feature matrix exceeds ~100 MB).
    """
    if isinstance(plan, BlockedCSRPlan):
        out = None
        for i, sub in enumerate(plan.blocks):
            if weights_padded:
                w_pad = edge_weight[i]
            else:
                w_pad = _edge_weights_padded(edge_weight, sub, x.dtype)
            part = _spmm_fused(x, w_pad, sub, interpret)
            out = part if out is None else out + part
        return out[:plan.num_nodes]
    if weights_padded:
        w_pad = edge_weight
    else:
        w_pad = _edge_weights_padded(edge_weight, plan, x.dtype)
    return _spmm_fused(x, w_pad, plan, interpret)[:plan.num_nodes]
