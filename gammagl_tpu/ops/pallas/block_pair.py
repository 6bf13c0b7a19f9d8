"""Block-pair SpMM: gather-free aggregation for bandwidth-reduced graphs.

The CSR segment-matmul (`segment_matmul.py`) gathers source rows from HBM —
a pass that is row-rate-limited (~240-350 Mrows/s) and collapses when the
touched footprint exceeds ~100 MB (PERF_NOTES.md "gather wall"). When the
graph is reordered for bandwidth (RCM — `parallel/halo.py:reorder_bandwidth`
— or METIS-style clustering), the adjacency becomes block-banded: each
destination row block draws its sources from only a few source row blocks.

This kernel exploits that: edges are grouped by (dst_block, src_block)
pairs; per edge tile, the source block x[sS:(s+1)S] is DMA'd to VMEM by the
Pallas pipeline (revisited tiles reuse it), and the per-edge "gather" is an
exact one-hot matmul (ET x S) @ (S x F) on the MXU — the random-access HBM
gather disappears entirely. The reduce into the destination block is the
same weighted one-hot matmul as the CSR kernel.

Cost model: 2*(S + R)*F MACs per edge (bf16; x2/x3 for the f32 hi/lo
split) vs one HBM row-touch per edge for the gather path. On banded graphs
the MXU path wins because the gather path is latency-bound, not
FLOP-bound. Use `build_block_pair_plan(..., reorder=True)` to get the RCM
permutation applied automatically; prefer the CSR plan for graphs with no
exploitable locality (a random graph makes every block pair non-empty and
the padding explodes — the builder reports this via `fill_ratio`).

Backward falls back to XLA gathers (exact, same gradients as spmm_csr).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["BlockPairPlan", "build_block_pair_plan", "spmm_block_pair",
           "HybridPlan", "build_hybrid_plan", "spmm_hybrid"]


def _cdiv(a, b):
    return -(-a // b)


class BlockPairPlan:
    """Static layout for the block-pair kernel (hashable by identity)."""

    def __init__(self, *, local_src, local_dst, w_perm, tile_dst_block,
                 tile_src_block, tile_first, num_nodes, num_src, num_edges,
                 R, S, ET, perm_nodes=None):
        self.local_src = local_src          # (E_pad,) in [0,S], S = pad
        self.local_dst = local_dst          # (E_pad,) in [0,R], R = pad
        self.w_perm = w_perm                # (E_pad,) into original edges
        self.tile_dst_block = tile_dst_block
        self.tile_src_block = tile_src_block
        self.tile_first = tile_first
        self.num_nodes = int(num_nodes)
        self.num_src = int(num_src)
        self.num_edges = int(num_edges)
        self.R, self.S, self.ET = int(R), int(S), int(ET)
        self.E_pad = int(local_src.shape[0])
        self.T = int(tile_dst_block.shape[0])
        self.nblocks = _cdiv(self.num_nodes, self.R)
        self.n_src_blocks = _cdiv(self.num_src, self.S)
        self.fill_ratio = self.num_edges / max(self.E_pad, 1)
        self.perm_nodes = perm_nodes        # RCM permutation, if applied

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def __repr__(self):
        return (f"BlockPairPlan(N={self.num_nodes}, E={self.num_edges}, "
                f"E_pad={self.E_pad}, R={self.R}, S={self.S}, "
                f"ET={self.ET}, T={self.T}, fill={self.fill_ratio:.2f})")


def build_block_pair_plan(src, dst, num_nodes, num_src=None, R=256, S=256,
                          ET=256, reorder=False):
    """Group edges into (dst_block, src_block) tiles.

    With `reorder=True`, an RCM permutation is computed and applied to BOTH
    endpoints (requires num_src == num_nodes); `plan.perm_nodes` maps new
    ids -> old ids, and callers must permute x and un-permute the output
    (or just keep everything in the reordered id space).
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    E = int(src.shape[0])
    num_src = int(num_src if num_src is not None else num_nodes)
    perm_nodes = None
    if reorder:
        assert num_src == num_nodes, "reorder needs a square adjacency"
        from gammagl_tpu.parallel.halo import reorder_bandwidth
        perm_nodes, inv = reorder_bandwidth(np.stack([src, dst]),
                                            num_nodes)
        src, dst = inv[src], inv[dst]

    db = dst // R
    sb = src // S
    order = np.lexsort((sb, db))            # dst block major, src block minor
    src_s, dst_s = src[order], dst[order]
    db_s, sb_s = db[order], sb[order]
    # pair boundaries
    pair_change = np.nonzero((db_s[1:] != db_s[:-1])
                             | (sb_s[1:] != sb_s[:-1]))[0] + 1
    starts = np.concatenate([[0], pair_change, [E]])

    ls_parts, ld_parts, perm_parts = [], [], []
    tile_db, tile_sb, tile_first = [], [], []
    seen_dst = set()
    nblocks = _cdiv(num_nodes, R)
    covered = set(db_s.tolist())
    for p in range(len(starts) - 1):
        lo, hi = int(starts[p]), int(starts[p + 1])
        if lo == hi:
            continue
        b, s = int(db_s[lo]), int(sb_s[lo])
        e_b = hi - lo
        n_t = _cdiv(e_b, ET)
        pad = n_t * ET - e_b
        ls_parts.append(src_s[lo:hi] - s * S)
        ls_parts.append(np.full(pad, S, np.int64))
        ld_parts.append(dst_s[lo:hi] - b * R)
        ld_parts.append(np.full(pad, R, np.int64))
        perm_parts.append(order[lo:hi])
        perm_parts.append(np.full(pad, E, np.int64))
        for t in range(n_t):
            tile_db.append(b)
            tile_sb.append(s)
            tile_first.append(1 if (b not in seen_dst and t == 0) else 0)
        seen_dst.add(b)
    # empty dst blocks still need one (zero) tile so the output block is
    # initialized
    for b in range(nblocks):
        if b not in covered:
            ls_parts.append(np.full(ET, S, np.int64))
            ld_parts.append(np.full(ET, R, np.int64))
            perm_parts.append(np.full(ET, E, np.int64))
            tile_db.append(b)
            tile_sb.append(0)
            tile_first.append(1)

    return BlockPairPlan(
        local_src=np.concatenate(ls_parts).astype(np.int32),
        local_dst=np.concatenate(ld_parts).astype(np.int32),
        w_perm=np.concatenate(perm_parts).astype(np.int32),
        tile_dst_block=np.asarray(tile_db, np.int32),
        tile_src_block=np.asarray(tile_sb, np.int32),
        tile_first=np.asarray(tile_first, np.int32),
        num_nodes=num_nodes, num_src=num_src, num_edges=E, R=R, S=S,
        ET=ET, perm_nodes=perm_nodes)


def _kernel(tdb_ref, tsb_ref, tf_ref, ls_ref, ld_ref, w_ref, x_ref,
            out_ref, *, R, S, ET, f32_path):
    t = pl.program_id(1)
    sel_src = (jax.lax.broadcasted_iota(jnp.int32, (ET, S), 1) == ls_ref[0].reshape(ET, 1))
    sel_dst = (jax.lax.broadcasted_iota(jnp.int32, (R, ET), 0) == ld_ref[0])
    oh_src = jnp.where(sel_src, 1.0, 0.0).astype(jnp.bfloat16)
    x = x_ref[:]
    if f32_path:
        # exact hi/lo split; the one-hot "gather" matmuls are exact row
        # selections under f32 accumulation
        x_hi = x.astype(jnp.bfloat16)
        x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        m_hi = jnp.dot(oh_src, x_hi,
                       preferred_element_type=jnp.float32).astype(
            jnp.bfloat16)
        m_lo = jnp.dot(oh_src, x_lo,
                       preferred_element_type=jnp.float32).astype(
            jnp.bfloat16)
        w = w_ref[0]
        w_hi_f = w.astype(jnp.bfloat16).astype(jnp.float32)
        w_lo_f = w - w_hi_f
        oh_hi = jnp.where(sel_dst, w_hi_f, 0.0).astype(jnp.bfloat16)
        oh_lo = jnp.where(sel_dst, w_lo_f, 0.0).astype(jnp.bfloat16)
        acc = (jnp.dot(oh_hi, m_hi, preferred_element_type=jnp.float32)
               + jnp.dot(oh_hi, m_lo, preferred_element_type=jnp.float32)
               + jnp.dot(oh_lo, m_hi, preferred_element_type=jnp.float32))
    else:
        msg = jnp.dot(oh_src, x,
                      preferred_element_type=jnp.float32).astype(x.dtype)
        oh_w = jnp.where(sel_dst, w_ref[0].astype(jnp.float32),
                         0.0).astype(x.dtype)
        acc = jnp.dot(oh_w, msg, preferred_element_type=jnp.float32)

    @pl.when(tf_ref[t] == 1)
    def _():
        out_ref[:] = acc.astype(out_ref.dtype)

    @pl.when(tf_ref[t] == 0)
    def _():
        out_ref[:] = out_ref[:] + acc.astype(out_ref.dtype)


def _forward(x, w_pad, plan, interpret):
    interpret = interpret or jax.default_backend() != "tpu"
    R, S, ET, T = plan.R, plan.S, plan.ET, plan.T
    N_src, F = x.shape
    F_pad = _cdiv(F, 128) * 128
    S_rows = plan.n_src_blocks * S
    pad_rows = S_rows - N_src
    if F_pad != F or pad_rows:
        x = jnp.pad(x, ((0, pad_rows), (0, F_pad - F)))
    FT = min(256, F_pad)
    while F_pad % FT:
        FT //= 2

    ls = jnp.asarray(plan.local_src.reshape(T, 1, ET))
    ld = jnp.asarray(plan.local_dst.reshape(T, 1, ET))
    w2d = w_pad.astype(jnp.float32).reshape(T, 1, ET)

    kern = functools.partial(_kernel, R=R, S=S, ET=ET,
                             f32_path=x.dtype == jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(F_pad // FT, T),
        in_specs=[
            pl.BlockSpec((1, 1, ET), lambda f, t, db, sb, tf: (t, 0, 0)),
            pl.BlockSpec((1, 1, ET), lambda f, t, db, sb, tf: (t, 0, 0)),
            pl.BlockSpec((1, 1, ET), lambda f, t, db, sb, tf: (t, 0, 0)),
            pl.BlockSpec((S, FT), lambda f, t, db, sb, tf: (sb[t], f)),
        ],
        out_specs=pl.BlockSpec((R, FT),
                               lambda f, t, db, sb, tf: (db[t], f)),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.nblocks * R, F_pad), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * (R + S) * ET * F_pad * T,
            bytes_accessed=(T * S * F_pad
                            + plan.nblocks * R * F_pad) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(plan.tile_dst_block), jnp.asarray(plan.tile_src_block),
      jnp.asarray(plan.tile_first), ls, ld, w2d, x)
    return out[:plan.num_nodes, :F]


def _w_padded(edge_weight, plan, dtype):
    if edge_weight is None:
        return jnp.asarray(plan.local_dst < plan.R).astype(dtype)
    w_ext = jnp.concatenate(
        [edge_weight.reshape(-1).astype(dtype),
         jnp.zeros(1, dtype)])
    return jnp.take(w_ext, jnp.asarray(
        np.minimum(plan.w_perm, plan.num_edges)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _spmm_block_pair(x, w_pad, plan, interpret=False):
    return _forward(x, w_pad, plan, interpret)


def _fwd(x, w_pad, plan, interpret):
    return _forward(x, w_pad, plan, interpret), (x, w_pad)


def _bwd(plan, interpret, res, g):
    x, w_pad = res
    # global padded endpoint ids (pads out of range -> dropped/clamped)
    tile_of_edge_dst = np.repeat(plan.tile_dst_block, plan.ET)
    tile_of_edge_src = np.repeat(plan.tile_src_block, plan.ET)
    rows = tile_of_edge_dst * plan.R + plan.local_dst
    srcs = tile_of_edge_src * plan.S + plan.local_src
    valid = jnp.asarray((plan.local_dst < plan.R)).astype(x.dtype)
    rows_c = jnp.asarray(np.minimum(rows, plan.num_nodes - 1))
    srcs_c = jnp.asarray(np.minimum(srcs, plan.num_src - 1))
    g_rows = jnp.take(g, rows_c, axis=0)
    x_rows = jnp.take(x, srcs_c, axis=0)
    # dx = scatter-add of w*g back to sources
    contrib = g_rows * (w_pad * valid)[:, None]
    dx = jax.ops.segment_sum(contrib, jnp.asarray(
        np.where(plan.local_src < plan.S, srcs, plan.num_src)),
        num_segments=plan.num_src + 1)[:plan.num_src]
    dw = jnp.sum(g_rows * x_rows, axis=-1) * valid
    return dx, dw


_spmm_block_pair.defvjp(_fwd, _bwd)


def spmm_block_pair(x, edge_weight, plan, interpret=False,
                    weights_padded=False):
    """out[d] = sum_{(s,d)} w_sd * x[s], gather-free (see module doc).

    `x` must be in the plan's node id space (apply `plan.perm_nodes`
    first when the plan was built with reorder=True).
    """
    w_pad = edge_weight if weights_padded else _w_padded(
        edge_weight, plan, jnp.float32)
    return _spmm_block_pair(x, w_pad, plan, interpret)


class HybridPlan:
    """Dense (dst_block, src_block) pairs on the gather-free block-pair
    kernel + the scattered tail on the CSR-gather kernel.

    Real graphs are rarely uniformly banded: even a perfectly recovered
    community ordering (`Graph.reorder_cluster`) leaves a scattered
    cross-cluster tail whose near-empty pairs would pad the pure
    block-pair plan to uselessness (fill << 0.8), while the dense
    intra-community pairs are exactly where the HBM gather is wasted.
    The hybrid takes each regime's best kernel: pairs holding >=
    `dense_threshold` edges aggregate via VMEM-resident one-hot matmuls
    (no gather), the rest ride the packed-gather CSR kernel — the
    gather's row count shrinks by the dense fraction. Both partial sums
    add; per-edge weights in ORIGINAL edge order follow each sub-plan's
    remapped perm.
    """

    def __init__(self, bp, csr, num_nodes, num_edges, dense_frac):
        self.bp = bp            # BlockPairPlan or None (no dense pairs)
        self.csr = csr          # CSRPlan or None (everything dense)
        self.num_nodes = int(num_nodes)
        self.num_edges = int(num_edges)
        self.dense_frac = float(dense_frac)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def __repr__(self):
        return (f"HybridPlan(N={self.num_nodes}, E={self.num_edges}, "
                f"dense={self.dense_frac:.2f}, bp={self.bp!r}, "
                f"csr={self.csr!r})")


def build_hybrid_plan(src, dst, num_nodes, num_src=None, R=256, S=256,
                      ET=256, dense_threshold=None, csr_R=128,
                      csr_ET=512):
    """Split edges by (dst_block, src_block) pair occupancy (host-side).

    ``dense_threshold`` (default 0.75*ET) is the minimum real edges a
    pair must hold to go gather-free; sub-plan perms are remapped to the
    ORIGINAL edge ids so one weight vector serves both kernels.
    """
    from gammagl_tpu.ops.pallas.segment_matmul import build_csr_plan
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    E = int(src.shape[0])
    num_src = int(num_src if num_src is not None else num_nodes)
    if dense_threshold is None:
        dense_threshold = (3 * ET) // 4
    pair = (dst // R) * (1 + num_src // S) + (src // S)
    uniq, inverse, counts = np.unique(pair, return_inverse=True,
                                      return_counts=True)
    dense = counts[inverse] >= dense_threshold
    d_idx = np.nonzero(dense)[0]
    t_idx = np.nonzero(~dense)[0]

    bp = None
    if len(d_idx):
        bp = build_block_pair_plan(src[d_idx], dst[d_idx], num_nodes,
                                   num_src, R=R, S=S, ET=ET)
        bp.w_perm = np.where(bp.w_perm < len(d_idx),
                             d_idx[np.minimum(bp.w_perm,
                                              len(d_idx) - 1)],
                             E).astype(np.int32)
        bp.num_edges = E
    csr = None
    if len(t_idx):
        csr = build_csr_plan(src[t_idx], dst[t_idx], num_nodes,
                             num_src=num_src, R=csr_R, ET=csr_ET)
        csr.perm = np.where(csr.perm < len(t_idx),
                            t_idx[np.minimum(csr.perm, len(t_idx) - 1)],
                            E).astype(np.int32)
        csr.num_edges = E
    return HybridPlan(bp, csr, num_nodes, E, len(d_idx) / max(E, 1))


def spmm_hybrid(x, edge_weight, plan: HybridPlan, interpret=False):
    """out[d] = sum w_sd x[s] over BOTH sub-plans (see HybridPlan).

    ``edge_weight`` is in the caller's original edge order ((E,) or
    None); each sub-plan's remapped perm routes it."""
    from gammagl_tpu.ops.pallas.segment_matmul import spmm_csr
    out = None
    if plan.bp is not None:
        out = spmm_block_pair(x, edge_weight, plan.bp, interpret)
    if plan.csr is not None:
        part = spmm_csr(x, edge_weight, plan.csr,
                        interpret)[:plan.num_nodes]
        out = part if out is None else out + part
    return out
