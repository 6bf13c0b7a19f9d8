"""Overlapped, kernel-backed halo SpMM — the "planned halo" tier.

Two upgrades over `parallel/halo.py` (SURVEY.md §7 hard-parts: "halo
exchange overlap" and "scatter performance on TPU"; no reference analog —
the reference is single-device, gammagl/ has no distributed layer):

1. **Interior/boundary edge split.** `halo.make_halo_spmm` concatenates
   the received halo rows into the gather table, so every local FLOP waits
   on the `all_to_all`. Here edges whose source is locally owned
   ("interior") aggregate straight from the resident block with NO data
   dependency on the collective; XLA's async collectives then overlap the
   ICI exchange with the interior SpMM, and only the (much smaller)
   boundary aggregation waits on the wire.

2. **Pallas local aggregation.** The per-device reduce runs on the MXU
   one-hot segment-matmul (`ops/pallas/segment_matmul.py`) instead of the
   XLA scatter path (~4x per chip at arxiv scale, measured bf16 F=256).
   One per-device `CSRPlan` per edge class is built host-side, padded to a
   common tile count, and stacked into sharded operands — the `shard_map`
   body stays a single program; each shard prefetches its own layout
   (`segment_matmul_dyn_vjp` takes the plan arrays as traced inputs).

Weights are baked into the stacked plans at build time (GCN norms are
static per graph); per-step edge weights need the decomposed tier.
"""

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gammagl_tpu.ops import segment_sum
from gammagl_tpu.ops.pallas.segment_matmul import (
    build_csr_plan, pack_halves, segment_matmul_dyn_packed,
    segment_matmul_dyn_vjp)
from gammagl_tpu.parallel.halo import _balanced_relabel, _halo_sets
from gammagl_tpu.parallel.hier_halo import (HierHaloPartition,
                                            build_hier_halo_partition)

# Packed gather in the HALO tiers is ON by default (GGL_PACKED_HALO=0
# opts out). History: the round-3 A/B measured packed LOSING (2584 vs
# 1646 ms/epoch at papers100M mid-shard scale) — but that measurement
# was dominated by the adjacent-pair pack's XLA relayout and the
# [evens|odds] un-interleave epilogue, BOTH eliminated by the round-4
# `pack_halves` convention (same-shape elementwise pack, natural-order
# output). Re-measured round 4 at the 3.61M-node shard (52.5M edges,
# 3-layer GCN, staged): packed 6198 ms/epoch vs 7121 unpacked (+15%).
import os as _os
_PACKED_HALO = _os.environ.get("GGL_PACKED_HALO", "1") == "1"


__all__ = ["PlannedHaloPartition", "build_halo_partition_planned",
           "make_halo_spmm_planned", "auto_src_blocks",
           "PlannedHierHaloPartition",
           "build_hier_halo_partition_planned",
           "make_hier_halo_spmm_planned"]


class PlannedHaloPartition(NamedTuple):
    """Per-device interior/boundary kernel plans, stacked over devices.

    `*_src` index the device's OWN rows (interior, in [0, rows_per)) or its
    received halo table (boundary, in [0, P*H)); `*_w` carry the edge
    weights already permuted into each plan's padded order (zero at pads);
    `*_lr/tb/tf` are the segment-matmul layout arrays (see CSRPlan).
    """
    send_idx: np.ndarray     # (P, P, H) owner-side rows to send to peer
    in_src: np.ndarray       # (P, T_in*ET)
    in_w: np.ndarray         # (P, T_in, 1, ET) f32
    in_lr: np.ndarray        # (P, T_in, 1, ET) int32
    in_tb: np.ndarray        # (P, T_in) int32
    in_tf: np.ndarray        # (P, T_in) int32
    bd_src: np.ndarray       # (P, T_bd*ET)
    bd_w: np.ndarray
    bd_lr: np.ndarray
    bd_tb: np.ndarray
    bd_tf: np.ndarray
    num_parts: int
    rows_per: int
    halo_per_peer: int
    num_nodes: int
    R: int
    ET: int
    # Extra interior source blocks ((src, w, lr, tb, tf) each), present
    # when `num_src_blocks > 1`: the gather engine's throughput collapses
    # ~4x once one gather's touched footprint passes ~100 MB (see
    # BlockedCSRPlan), so at papers100M scale the interior edges are
    # partitioned by source row block and their partial sums chained —
    # the data dependency also stops XLA from interleaving the gathers.
    in_extra: tuple = ()
    # PlannedHaloPartition of the REVERSED graph (same weights): dx = A^T g
    # runs as one more planned halo SpMM instead of an XLA scatter-add
    # (the distributed analog of spmm_csr's _swap_plan backward).
    transpose: object = None
    # Per-block source row spans ((lo, hi) each, one per interior block);
    # () = uniform spans. Edge-balanced spans cap the per-block
    # gathered-message footprint on power-law graphs, where uniform
    # spans put most edges in the hub block (observed 10.3 GB
    # single-block msg = OOM at papers100M shard scale); blocks whose
    # edge mass still exceeds the cap (a single hub ROW can) are split
    # into several plans SHARING a span.
    src_spans: tuple = ()
    # balanced relabeling (default-on; see HaloPartition.node_perm)
    node_perm: object = None
    node_inv: object = None

    @property
    def nblocks(self):
        return -(-self.rows_per // self.R)


def _pad_plans(plans, weights, R, ET, nblocks):
    """Stack per-device CSRPlans to a common tile count T_max.

    Pad tiles continue the LAST real block (tb = nblocks-1, tf = 0, w = 0,
    local_row = R): tiles of one output block must be consecutive in the
    grid for the kernel's accumulate-in-VMEM pattern, and the final real
    tile already belongs to block nblocks-1, so appending there never
    revisits a flushed block.
    """
    T_max = max(p.T for p in plans)
    src, w_s, lr, tb, tf = [], [], [], [], []
    for p, w in zip(plans, weights):
        pad_t = T_max - p.T
        pad_e = pad_t * ET
        src.append(np.pad(p.src_pad, (0, pad_e)))
        w_s.append(np.pad(w, (0, pad_e)).reshape(T_max, 1, ET))
        lr.append(np.pad(p.local_row, (0, pad_e),
                         constant_values=R).reshape(T_max, 1, ET))
        tb.append(np.pad(p.tile_block, (0, pad_t),
                         constant_values=nblocks - 1))
        tf.append(np.pad(p.tile_first, (0, pad_t)))
    return (np.stack(src).astype(np.int32),
            np.stack(w_s).astype(np.float32),
            np.stack(lr).astype(np.int32),
            np.stack(tb).astype(np.int32),
            np.stack(tf).astype(np.int32))


def auto_src_blocks(rows_per, feat_dim, dtype=np.float32,
                    budget_bytes=90 * 2**20):
    """Source blocks needed to keep one interior gather's touched
    footprint under the measured ~100 MB gather-wall boundary."""
    return max(1, -(-rows_per * feat_dim * np.dtype(dtype).itemsize
                    // budget_bytes))


def build_halo_partition_planned(edge_index, num_nodes, num_parts,
                                 edge_weight=None, R=256, ET=512,
                                 num_src_blocks=1, with_transpose=True,
                                 balance=True):
    """Contiguous node blocks + per-device interior/boundary kernel plans.

    Same partition/halo analysis as `build_halo_partition` (`_halo_sets`),
    then each device's edge list is split by source ownership and laid out
    for the segment-matmul kernel. R is clipped so tiny partitions keep at
    least one full row block. With `with_transpose` (default) the reversed
    graph's partition is attached so `make_halo_spmm_planned` can run the
    backward pass through the kernel too. Set `num_src_blocks` (helper:
    `auto_src_blocks`) when a device's feature block exceeds ~100 MB so
    each interior gather stays inside the fast-gather regime.

    ``balance`` (default) applies the in-degree-balanced node relabeling
    (`balance_permutation`) so the default invocation meets the >=75%
    scaling-efficiency target on power-law graphs; the permutation rides
    on `node_perm`/`node_inv` and `shard_nodes` applies it. The transpose
    partition shares the same labeling.
    """
    if balance:
        ei_b, perm, inv = _balanced_relabel(edge_index, num_nodes,
                                            num_parts)
        if perm is not None:
            return build_halo_partition_planned(
                ei_b, num_nodes, num_parts, edge_weight, R=R, ET=ET,
                num_src_blocks=num_src_blocks,
                with_transpose=with_transpose,
                balance=False)._replace(node_perm=perm, node_inv=inv)
        edge_index = ei_b
    if with_transpose:
        ei = np.asarray(edge_index)
        part_t = build_halo_partition_planned(
            ei[[1, 0]], num_nodes, num_parts, edge_weight, R=R, ET=ET,
            num_src_blocks=num_src_blocks, with_transpose=False,
            balance=False)
        return build_halo_partition_planned(
            ei, num_nodes, num_parts, edge_weight, R=R, ET=ET,
            num_src_blocks=num_src_blocks,
            with_transpose=False, balance=False)._replace(transpose=part_t)
    rows_per, H, part_edges, halo, send_idx = _halo_sets(
        edge_index, num_nodes, num_parts, edge_weight)
    R = min(R, _round8(rows_per))
    nblocks = -(-rows_per // R)
    B = max(1, int(num_src_blocks))
    spans, span_chunks, cap = _src_block_spans(part_edges, num_parts,
                                               rows_per, B)
    blocks = [(lo, hi, k) for (lo, hi), K in zip(spans, span_chunks)
              for k in range(K)]
    B = len(blocks)

    in_plans, in_w, bd_plans, bd_w = [[] for _ in range(B)], \
        [[] for _ in range(B)], [], []
    for p in range(num_parts):
        sub, sub_w, src_owner = part_edges[p]
        own = src_owner == p
        dst_local = sub[1] - p * rows_per

        src_own = sub[0][own] - p * rows_per
        dst_own = dst_local[own]
        w_own = sub_w[own]
        lows = np.asarray([lo for lo, _ in spans])
        span_of = np.searchsorted(lows, src_own, side="right") - 1
        b = 0
        for s, ((lo, hi), K) in enumerate(zip(spans, span_chunks)):
            idx = np.nonzero(span_of == s)[0]
            sz = -(-len(idx) // K)
            for k in range(K):
                part_idx = idx[k * sz:(k + 1) * sz]
                # block-LOCAL src ids: the kernel gathers from a sliced
                # source (the gather engine's rate is set by the source
                # ARRAY size, not the touched span — measured 600k-row
                # source: 122 Mrows/s vs 214 for a 150k-row slice)
                plan_i = build_csr_plan(
                    src_own[part_idx] - lo, dst_own[part_idx], rows_per,
                    num_src=hi - lo, R=R, ET=ET)
                in_plans[b].append(plan_i)
                in_w[b].append(_permute_w(w_own[part_idx], plan_i))
                b += 1

        # boundary: src indexes the received halo table [q*H + pos]
        bsel = ~own
        src_halo = np.zeros(int(bsel.sum()), np.int64)
        bsrc = sub[0][bsel]
        bowner = src_owner[bsel]
        for q in range(num_parts):
            if q == p:
                continue
            qm = bowner == q
            if qm.any():
                src_halo[qm] = q * H + np.searchsorted(halo[p][q], bsrc[qm])
        plan_b = build_csr_plan(src_halo, dst_local[bsel], rows_per,
                                num_src=num_parts * H, R=R, ET=ET)
        bd_plans.append(plan_b)
        bd_w.append(_permute_w(sub_w[bsel], plan_b))

    in_stacks = [_pad_plans(in_plans[b], in_w[b], R, ET, nblocks)
                 for b in range(B)]
    in_src, in_ws, in_lr, in_tb, in_tf = in_stacks[0]
    bd_src, bd_ws, bd_lr, bd_tb, bd_tf = _pad_plans(bd_plans, bd_w, R, ET,
                                                    nblocks)
    return PlannedHaloPartition(
        send_idx=send_idx, in_src=in_src, in_w=in_ws, in_lr=in_lr,
        in_tb=in_tb, in_tf=in_tf, bd_src=bd_src, bd_w=bd_ws, bd_lr=bd_lr,
        bd_tb=bd_tb, bd_tf=bd_tf, num_parts=num_parts, rows_per=rows_per,
        halo_per_peer=H, num_nodes=num_nodes, R=R, ET=ET,
        in_extra=tuple(in_stacks[1:]),
        src_spans=tuple((int(lo), int(hi)) for lo, hi, _ in blocks))


def _src_block_spans(part_edges, num_parts, rows_per, B):
    """Source-block row spans balancing BOTH constraints:

    - footprint: row span per block <= ceil(rows_per / B) (the ~90 MB
      gather-regime cap that motivated src blocking), via the uniform
      grid;
    - edge mass: interior edges per block <= ~total/B. Row boundaries
      come from quantiles of the global local-src-row edge histogram; a
      span whose mass STILL exceeds the cap (a single hub row can, on
      power-law graphs) is split into several chunk plans sharing the
      span. Uniform spans alone put most edges in the hub block, whose
      gathered (E_blk, F) message then dominates HBM (10.3 GB observed
      at papers100M shard scale).

    Returns (spans, chunks_per_span, cap): spans are (lo, hi) row pairs
    shared across devices (multiple-of-8 rows).
    """
    if B <= 1 or rows_per <= 8:
        return [(0, rows_per)], [1], None
    hist = np.zeros(rows_per, np.int64)
    per_dev_total = np.zeros(num_parts, np.int64)
    for p in range(num_parts):
        sub, _, src_owner = part_edges[p]
        own = src_owner == p
        if own.any():
            hist += np.bincount(sub[0][own] - p * rows_per,
                                minlength=rows_per)[:rows_per]
            per_dev_total[p] = int(own.sum())
    cum = np.cumsum(hist)
    total = int(cum[-1])
    if total == 0:
        edge_bounds = np.empty(0, np.int64)
    else:
        targets = total * np.arange(1, B) / B
        edge_bounds = np.searchsorted(cum, targets)
    rows_blk = -(-rows_per // B)
    grid = np.arange(rows_blk, rows_per, rows_blk)
    bounds = np.union1d(edge_bounds, grid)
    bounds = np.unique(np.clip((bounds // 8) * 8, 0, rows_per))
    bounds = bounds[(bounds > 0) & (bounds < rows_per)]
    bounds = [0] + bounds.tolist() + [rows_per]
    spans = list(zip(bounds[:-1], bounds[1:]))
    # chunking cap from the WORST per-device interior mass (chunk counts
    # below compare per-device span mass — a cap from the global total
    # would let a device-local hub block grow num_parts x past the
    # per-device OOM target before ever chunking)
    worst_total = int(per_dev_total.max()) if num_parts else total
    cap = max(1, -(-worst_total // B))
    # worst-case per-DEVICE mass decides the chunk count (plans stack
    # per device; every device gets the same number of chunk plans)
    chunks = []
    for lo, hi in spans:
        worst = 0
        for p in range(num_parts):
            sub, _, src_owner = part_edges[p]
            own = src_owner == p
            s = sub[0][own] - p * rows_per
            worst = max(worst, int(((s >= lo) & (s < hi)).sum()))
        chunks.append(max(1, -(-worst // cap)))
    return spans, chunks, cap


def _round8(x):
    return max(8, (x // 8) * 8)


def _permute_w(w, plan):
    """Host-side `pad_edge_weights`: class-local weights -> padded order."""
    E = len(w)
    if E == 0:
        return np.zeros(plan.E_pad, np.float32)
    w_pad = np.where(plan.perm < E, np.asarray(w, np.float64)[
        np.minimum(plan.perm, E - 1)], 0.0)
    return w_pad.astype(np.float32)


def make_halo_spmm_planned(mesh: Mesh, part: PlannedHaloPartition,
                           axis: str = "dp", kernel: bool = True,
                           interpret: bool = False, as_args: bool = False):
    """Jit-able overlapped halo SpMM: x (P*rows_per, F) sharded -> same.

    Per device: start the halo `all_to_all`, aggregate interior edges from
    the resident block while it is in flight, then aggregate boundary
    edges from the received table and add. `kernel=False` keeps the same
    overlap structure on the XLA scatter path (for comparison and for
    dtypes the kernel does not carry).

    With ``as_args=True`` returns ``(spmm, consts)`` where the layout
    buffers live on device and must be threaded through the caller's jit
    boundary: ``spmm(x, consts)``. Use this for partitions beyond a few
    million edges — embedded-literal programs scale O(E) in bytes and
    break remote compilation (HTTP 413) at papers100M shard scale.
    """
    has_t = part.transpose is not None
    # packed gather only when the transpose partition supplies the
    # backward (the packed kernel is not differentiable)
    fn, consts = _planned_spmm_callable(mesh, part, axis, kernel,
                                        interpret, allow_packed=has_t)
    if has_t:
        fn_t, consts_t = _planned_spmm_callable(
            mesh, part.transpose._replace(transpose=None), axis, kernel,
            interpret, allow_packed=True)

    if as_args:
        # Plan buffers become DEVICE-RESIDENT JIT ARGUMENTS instead of
        # HLO literals. Embedding is O(E) program bytes: at papers100M
        # shard scale (50M+ edges, ~400 MB of layout constants) the
        # serialized program exceeds remote-compile request limits
        # (observed HTTP 413) and constant-folding passes dominate
        # compile time. Returns (spmm, consts): call spmm(x, consts)
        # inside jit, passing consts through the jit boundary.
        def put(cs):
            return tuple(jax.device_put(
                jnp.asarray(c), NamedSharding(mesh, P(axis)))
                for c in cs)
        consts_dev = {"fwd": put(consts),
                      "bwd": put(consts_t) if has_t else ()}
        if not has_t:
            return (lambda x, cd: fn(x, *cd["fwd"])), consts_dev

        @jax.custom_vjp
        def spmm_a(x, cd):
            return fn(x, *cd["fwd"])

        def _fwd_a(x, cd):
            return fn(x, *cd["fwd"]), cd

        def _bwd_a(cd, g):
            return fn_t(g, *cd["bwd"]), _zero_cotangents(cd)

        spmm_a.defvjp(_fwd_a, _bwd_a)
        return spmm_a, consts_dev

    def run(x_sharded):
        return fn(x_sharded, *consts)

    if not has_t:
        return run

    # Kernel-backed backward: the SpMM is linear in x with static
    # weights, so dx = A^T g is the planned halo SpMM of the reversed
    # graph -- autodiff's alternative is the transpose of `take` (an XLA
    # scatter-add over E_pad rows) plus a reversed all_to_all, which
    # dominates the train step (measured ~2x whole-epoch win at
    # papers100M synthetic scale).
    @jax.custom_vjp
    def spmm(x):
        return run(x)

    def _fwd(x):
        return run(x), None

    def _bwd(_, g):
        return (fn_t(g, *consts_t),)

    spmm.defvjp(_fwd, _bwd)
    return spmm


def make_halo_spmm_planned_pair(mesh: Mesh, part: PlannedHaloPartition,
                                axis: str = "dp", kernel: bool = True,
                                interpret: bool = False):
    """(spmm, spmm_t, consts): BOTH directions of the planned halo SpMM
    as separate raw callables over device-resident plan arguments.

    For layer-staged training loops that run dx = A^T g in its own jit:
    differentiating the custom-vjp `make_halo_spmm_planned` spmm under
    `jax.vjp` places the forward recompute AND the transpose pass in one
    program -- at papers100M shard scale that one jit's working set is
    the difference between fitting a 16 GB chip and not (round 4:
    jit(bwd_layer) compiled to 16.15 G). Call `spmm(x, consts)` /
    `spmm_t(g, consts)`; neither is differentiable (the staged loop owns
    the chain rule).
    """
    if part.transpose is None:
        raise ValueError("make_halo_spmm_planned_pair needs a partition "
                         "built with with_transpose=True")
    fn, consts = _planned_spmm_callable(mesh, part, axis, kernel,
                                        interpret, allow_packed=True)
    fn_t, consts_t = _planned_spmm_callable(
        mesh, part.transpose._replace(transpose=None), axis, kernel,
        interpret, allow_packed=True)

    def put(cs):
        return tuple(jax.device_put(
            jnp.asarray(c), NamedSharding(mesh, P(axis)))
            for c in cs)

    consts_dev = {"fwd": put(consts), "bwd": put(consts_t)}
    return ((lambda x, cd: fn(x, *cd["fwd"])),
            (lambda g, cd: fn_t(g, *cd["bwd"])), consts_dev)


def _zero_cotangents(tree):
    """Cotangents for non-differentiable plan buffers (float0 for ints)."""
    import jax.dtypes as _dt
    return jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, _dt.float0)
        if not jnp.issubdtype(a.dtype, jnp.inexact)
        else jnp.zeros_like(a), tree)


def _planned_spmm_callable(mesh, part, axis, kernel, interpret,
                           allow_packed=False):
    """shard_map halo-SpMM callable + its numpy layout buffers.

    Returns (fn, consts) with fn(x_sharded, *consts) -> x-like. The
    caller decides how consts cross the jit boundary: embedded as
    literals (fine for <~5M-edge partitions) or device_put once and
    passed as arguments (required at papers100M scale; see
    make_halo_spmm_planned(as_args=True))."""
    rows_per, H, nparts = part.rows_per, part.halo_per_peer, part.num_parts
    R, ET, nblocks = part.R, part.ET, part.nblocks

    def _agg(msg, w, lr, tb, tf):
        if kernel:
            return segment_matmul_dyn_vjp(
                msg, w.astype(msg.dtype), lr, tb, tf,
                R=R, ET=ET, nblocks=nblocks, interpret=interpret)[:rows_per]
        rows = jnp.minimum(tb[:, None, None] * R + lr,
                           nblocks * R).reshape(-1)
        return segment_sum(msg * w.reshape(-1, 1).astype(msg.dtype),
                           rows, nblocks * R + 1)[:rows_per]

    def _packed_ok(tbl):
        return (allow_packed and _PACKED_HALO and kernel
                and tbl.dtype == jnp.bfloat16
                and tbl.shape[-1] % 256 == 0
                and tbl.shape[-1] // 2 <= 1024)

    def _gather_agg_packed(tbl, src, w, lr, tb, tf, out_acc):
        # packed gather (bf16 features via the f32 bitcast view): halves
        # the gather engine's lane groups — the dominant cost of the
        # interior aggregation at papers100M scale (segment_matmul.py
        # _packed_kernel; +23% whole-SpMM on chip). Non-differentiable:
        # enabled only when the transpose partition provides dx.
        # Returns the FULL (nblocks*R, F) buffer; the src-blocked chain
        # folds the previous block's partial in-kernel (out_acc) instead
        # of materializing every partial and adding outside.
        g = jnp.take(pack_halves(tbl), src, axis=0, mode="clip")
        return segment_matmul_dyn_packed(
            g, w.astype(jnp.float32), lr, tb, tf, R=R, ET=ET,
            nblocks=nblocks, interpret=interpret, out_acc=out_acc)

    def _gather_agg(tbl, src, w, lr, tb, tf):
        if _packed_ok(tbl):
            return _gather_agg_packed(tbl, src, w, lr, tb, tf,
                                      None)[:rows_per]
        msg = jnp.take(tbl, src, axis=0, mode="clip")
        return _agg(msg, w, lr, tb, tf)

    in_blocks = [(part.in_src, part.in_w, part.in_lr, part.in_tb,
                  part.in_tf)] + list(part.in_extra)
    nb = len(in_blocks)
    spec = (P(axis),) * (7 + 5 * nb)

    # check_vma=False: pallas_call does not declare varying-mesh-axes on
    # its out_shape, which the default shard_map validation rejects
    @partial(shard_map, mesh=mesh, in_specs=spec, out_specs=P(axis),
             check_vma=False)
    def _spmm(x_blk, send_idx, *rest):
        send = jnp.take(x_blk, send_idx[0].reshape(-1), axis=0,
                        mode="clip").reshape(nparts, H, -1)
        recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0,
                                  tiled=False)
        # interior: no dependency on recv -> overlaps the collective.
        # Per src block the gather reads a SLICED source (block-local ids;
        # the gather engine's rate follows the source array size), and the
        # optimization_barrier serializes the blocks' gathers: chaining
        # the partial sums alone does not order the gathers themselves,
        # and two concurrent gathers run at < half the speed of one.
        rows_blk = -(-rows_per // nb)
        spans = part.src_spans or tuple(
            (b * rows_blk, min((b + 1) * rows_blk, rows_per))
            for b in range(nb))
        bd_src, bd_w, bd_lr, bd_tb, bd_tf = rest[5 * nb:]
        table = recv.reshape(nparts * H, -1)
        if _packed_ok(x_blk):
            # src-blocked chain with IN-KERNEL partial folding: each
            # block's kernel reads the previous full-size partial and
            # writes the running sum (2 HBM passes/block instead of the
            # store + outside-add 4) — measured +9% epoch rate on the
            # papers100M 3.6M-node shard. The boundary aggregation folds
            # in the same way, removing the last outside add too.
            out_full = None
            x_dep = x_blk
            for b in range(nb):
                src, w, lr, tb, tf = rest[5 * b:5 * b + 5]
                x_b = jax.lax.slice_in_dim(
                    x_dep, spans[b][0], spans[b][1]) if nb > 1 else x_dep
                out_full = _gather_agg_packed(x_b, src[0], w[0], lr[0],
                                              tb[0], tf[0], out_full)
                if nb > 1 and b < nb - 1:
                    out_full, x_dep = jax.lax.optimization_barrier(
                        (out_full, x_blk))
            if _packed_ok(table):
                out_full = _gather_agg_packed(
                    table, bd_src[0], bd_w[0], bd_lr[0], bd_tb[0],
                    bd_tf[0], out_full)
                return out_full[:rows_per]
            return (out_full[:rows_per]
                    + _gather_agg(table, bd_src[0], bd_w[0], bd_lr[0],
                                  bd_tb[0], bd_tf[0]))
        out = None
        x_dep = x_blk
        for b in range(nb):
            src, w, lr, tb, tf = rest[5 * b:5 * b + 5]
            x_b = jax.lax.slice_in_dim(x_dep, spans[b][0], spans[b][1]) \
                if nb > 1 else x_dep
            part_sum = _gather_agg(x_b, src[0], w[0], lr[0], tb[0], tf[0])
            out = part_sum if out is None else out + part_sum
            if nb > 1 and b < nb - 1:
                out, x_dep = jax.lax.optimization_barrier((out, x_blk))
        return out + _gather_agg(table, bd_src[0], bd_w[0], bd_lr[0],
                                 bd_tb[0], bd_tf[0])

    # Layout constants stay numpy here; the caller chooses embed-vs-args
    # (closed-over DEVICE arrays are never acceptable: lowering fetches
    # them back through the tunnel to embed as MLIR constants).
    consts = [np.asarray(part.send_idx)]
    for blk in in_blocks:
        consts.extend(np.asarray(a) for a in blk)
    consts.extend(np.asarray(a) for a in
                  (part.bd_src, part.bd_w, part.bd_lr, part.bd_tb,
                   part.bd_tf))
    return _spmm, consts


class PlannedHierHaloPartition(NamedTuple):
    """Two-level (slice x dp) variant: three edge classes per device.

    `base` keeps the sender tables and traffic counters of the underlying
    `HierHaloPartition`; the stacked plan arrays are shaped (S, D, ...).
    Sources index the own block (interior), the intra-slice ICI table
    [0, D*H1) or the inter-slice DCN table [0, D*S*H2).
    """
    base: HierHaloPartition
    in_src: np.ndarray
    in_w: np.ndarray
    in_lr: np.ndarray
    in_tb: np.ndarray
    in_tf: np.ndarray
    ia_src: np.ndarray
    ia_w: np.ndarray
    ia_lr: np.ndarray
    ia_tb: np.ndarray
    ia_tf: np.ndarray
    ir_src: np.ndarray
    ir_w: np.ndarray
    ir_lr: np.ndarray
    ir_tb: np.ndarray
    ir_tf: np.ndarray
    R: int
    ET: int
    transpose: object = None
    # balanced relabeling (default-on; see halo.HaloPartition.node_perm)
    node_perm: object = None
    node_inv: object = None

    @property
    def num_slices(self):
        return self.base.num_slices

    @property
    def dp_per_slice(self):
        return self.base.dp_per_slice

    @property
    def num_parts(self):
        return self.base.num_parts

    @property
    def rows_per(self):
        return self.base.rows_per

    @property
    def num_nodes(self):
        return self.base.num_nodes

    @property
    def nblocks(self):
        return -(-self.base.rows_per // self.R)


def build_hier_halo_partition_planned(edge_index, num_nodes, num_slices,
                                      dp_per_slice, edge_weight=None,
                                      R=256, ET=512, with_transpose=True,
                                      balance=True):
    """Planned (overlap + kernel) layout on top of the two-level analysis.

    Reuses `build_hier_halo_partition`'s local edge remap, then splits each
    device's edges by source table (own / intra ICI / inter DCN) and lays
    every class out for the segment-matmul kernel. The interior class
    overlaps BOTH collectives; the intra class additionally overlaps the
    DCN all_to_all + redistribute all_gather.

    ``balance`` (default) applies the in-degree-balanced relabeling (see
    build_halo_partition_planned); the permutation rides on the OUTER
    partition's `node_perm`/`node_inv`.
    """
    if balance:
        ei_b, perm, inv = _balanced_relabel(edge_index, num_nodes,
                                            int(num_slices)
                                            * int(dp_per_slice))
        if perm is not None:
            return build_hier_halo_partition_planned(
                ei_b, num_nodes, num_slices, dp_per_slice, edge_weight,
                R=R, ET=ET, with_transpose=with_transpose,
                balance=False)._replace(node_perm=perm, node_inv=inv)
        edge_index = ei_b
    if with_transpose:
        ei = np.asarray(edge_index)
        part_t = build_hier_halo_partition_planned(
            ei[[1, 0]], num_nodes, num_slices, dp_per_slice, edge_weight,
            R=R, ET=ET, with_transpose=False, balance=False)
        return build_hier_halo_partition_planned(
            ei, num_nodes, num_slices, dp_per_slice, edge_weight,
            R=R, ET=ET, with_transpose=False,
            balance=False)._replace(transpose=part_t)

    base = build_hier_halo_partition(edge_index, num_nodes, num_slices,
                                     dp_per_slice, edge_weight,
                                     balance=False)
    S, D = base.num_slices, base.dp_per_slice
    rows_per, H1, H2 = base.rows_per, base.h_intra, base.h_inter
    R = min(R, _round8(rows_per))
    nblocks = -(-rows_per // R)
    off_ia, off_ir = rows_per, rows_per + D * H1
    classes = {"in": (0, rows_per), "ia": (off_ia, D * H1),
               "ir": (off_ir, D * S * H2)}
    plans = {k: [] for k in classes}
    ws = {k: [] for k in classes}
    for s in range(S):
        for d in range(D):
            src = base.edge_index[s, d, 0].astype(np.int64)
            dst = base.edge_index[s, d, 1].astype(np.int64)
            w = base.edge_weight[s, d]
            valid = dst < rows_per  # pads carry dst = rows_per
            src, dst, w = src[valid], dst[valid], w[valid]
            for k, (lo, nsrc) in classes.items():
                m = (src >= lo) & (src < lo + nsrc)
                plan = build_csr_plan(src[m] - lo, dst[m], rows_per,
                                      num_src=nsrc, R=R, ET=ET)
                plans[k].append(plan)
                ws[k].append(_permute_w(w[m], plan))

    stacked = {}
    for k in classes:
        arrs = _pad_plans(plans[k], ws[k], R, ET, nblocks)
        stacked[k] = tuple(a.reshape((S, D) + a.shape[1:]) for a in arrs)
    (in_src, in_w, in_lr, in_tb, in_tf) = stacked["in"]
    (ia_src, ia_w, ia_lr, ia_tb, ia_tf) = stacked["ia"]
    (ir_src, ir_w, ir_lr, ir_tb, ir_tf) = stacked["ir"]
    return PlannedHierHaloPartition(
        base=base, in_src=in_src, in_w=in_w, in_lr=in_lr, in_tb=in_tb,
        in_tf=in_tf, ia_src=ia_src, ia_w=ia_w, ia_lr=ia_lr, ia_tb=ia_tb,
        ia_tf=ia_tf, ir_src=ir_src, ir_w=ir_w, ir_lr=ir_lr, ir_tb=ir_tb,
        ir_tf=ir_tf, R=R, ET=ET)


def make_hier_halo_spmm_planned(mesh: Mesh, part: PlannedHierHaloPartition,
                                axes=("slice", "dp"), kernel: bool = True,
                                interpret: bool = False,
                                as_args: bool = False):
    """Overlapped two-level halo SpMM with Pallas local aggregation.

    Collective/compute schedule per device: launch the ICI and DCN
    all_to_alls, aggregate interior edges (depends on neither), add the
    intra-slice contribution (hides the DCN leg + the redistribute
    all_gather), then the inter-slice contribution.

    ``as_args=True`` mirrors `make_halo_spmm_planned`: returns
    ``(spmm, consts)`` with the stacked plan buffers device_put once and
    threaded through the caller's jit boundary as sharded arguments —
    required beyond a few million edges per device, where embedded HLO
    literals scale O(E) in program bytes (HTTP 413 / constant-folding
    crawl at papers100M shard scale).
    """
    slice_ax, dp_ax = axes
    S, D = part.num_slices, part.dp_per_slice
    rows_per, H1, H2 = part.rows_per, part.base.h_intra, part.base.h_inter
    R, ET, nblocks = part.R, part.ET, part.nblocks

    def _agg(msg, w, lr, tb, tf):
        if kernel:
            return segment_matmul_dyn_vjp(
                msg, w.astype(msg.dtype), lr, tb, tf,
                R=R, ET=ET, nblocks=nblocks, interpret=interpret)[:rows_per]
        rows = jnp.minimum(tb[:, None, None] * R + lr,
                           nblocks * R).reshape(-1)
        return segment_sum(msg * w.reshape(-1, 1).astype(msg.dtype),
                           rows, nblocks * R + 1)[:rows_per]

    allow_packed = kernel and part.transpose is not None

    def _gather_agg(tbl, src, w, lr, tb, tf):
        # packed gather (see _planned_spmm_callable._gather_agg)
        if (allow_packed and _PACKED_HALO
                and tbl.dtype == jnp.bfloat16
                and tbl.shape[-1] % 256 == 0
                and tbl.shape[-1] // 2 <= 1024):
            g = jnp.take(pack_halves(tbl), src, axis=0, mode="clip")
            return segment_matmul_dyn_packed(
                g, w.astype(jnp.float32), lr, tb, tf, R=R, ET=ET,
                nblocks=nblocks, interpret=interpret)[:rows_per]
        msg = jnp.take(tbl, src, axis=0, mode="clip")
        return _agg(msg, w, lr, tb, tf)

    spec = (P((slice_ax, dp_ax)),) + (P(slice_ax, dp_ax),) * 17

    @partial(shard_map, mesh=mesh, in_specs=spec,
             out_specs=P((slice_ax, dp_ax)), check_vma=False)
    def _spmm(x_blk, s_intra, s_inter, in_src, in_w, in_lr, in_tb, in_tf,
              ia_src, ia_w, ia_lr, ia_tb, ia_tf,
              ir_src, ir_w, ir_lr, ir_tb, ir_tf):
        send1 = jnp.take(x_blk, s_intra.reshape(-1), axis=0, mode="clip")
        recv1 = jax.lax.all_to_all(send1.reshape(D, H1, -1), dp_ax,
                                   split_axis=0, concat_axis=0, tiled=False)
        send2 = jnp.take(x_blk, s_inter.reshape(-1), axis=0, mode="clip")
        recv2 = jax.lax.all_to_all(send2.reshape(S, H2, -1), slice_ax,
                                   split_axis=0, concat_axis=0, tiled=False)
        # interior: depends on neither collective
        out = _gather_agg(x_blk, in_src[0, 0], in_w[0, 0], in_lr[0, 0],
                          in_tb[0, 0], in_tf[0, 0])
        # intra: hides the DCN all_to_all and the redistribute all_gather
        out = out + _gather_agg(recv1.reshape(D * H1, -1), ia_src[0, 0],
                                ia_w[0, 0], ia_lr[0, 0], ia_tb[0, 0],
                                ia_tf[0, 0])
        table2 = jax.lax.all_gather(recv2, dp_ax, axis=0, tiled=False)
        return out + _gather_agg(table2.reshape(D * S * H2, -1),
                                 ir_src[0, 0], ir_w[0, 0], ir_lr[0, 0],
                                 ir_tb[0, 0], ir_tf[0, 0])

    # numpy closures: device-array constants are fetched back through the
    # remote tunnel at lowering time (see make_halo_spmm_planned)
    consts = [np.asarray(a) for a in
              (part.base.send_intra, part.base.send_inter,
               part.in_src, part.in_w, part.in_lr, part.in_tb, part.in_tf,
               part.ia_src, part.ia_w, part.ia_lr, part.ia_tb, part.ia_tf,
               part.ir_src, part.ir_w, part.ir_lr, part.ir_tb, part.ir_tf)]

    has_t = part.transpose is not None
    if as_args:
        # device-resident plan buffers as jit arguments (same rationale
        # as make_halo_spmm_planned(as_args=True))
        def put(cs):
            return tuple(jax.device_put(
                jnp.asarray(c), NamedSharding(mesh, P(slice_ax, dp_ax)))
                for c in cs)
        if has_t:
            fn_t = make_hier_halo_spmm_planned(
                mesh, part.transpose._replace(transpose=None), axes=axes,
                kernel=kernel, interpret=interpret, as_args=True)
            spmm_t, consts_t_dev = fn_t
            consts_dev = {"fwd": put(consts), "bwd": consts_t_dev["fwd"]}

            @jax.custom_vjp
            def spmm_a(x, cd):
                return _spmm(x, *cd["fwd"])

            def _fwd_a(x, cd):
                return _spmm(x, *cd["fwd"]), cd

            def _bwd_a(cd, g):
                return (spmm_t(g, {"fwd": cd["bwd"]}),
                        _zero_cotangents(cd))

            spmm_a.defvjp(_fwd_a, _bwd_a)
            return spmm_a, consts_dev
        return (lambda x, cd: _spmm(x, *cd["fwd"])), {"fwd": put(consts)}

    def run(x_sharded):
        return _spmm(x_sharded, *consts)

    if not has_t:
        return run

    run_t = make_hier_halo_spmm_planned(
        mesh, part.transpose._replace(transpose=None), axes=axes,
        kernel=kernel, interpret=interpret)

    @jax.custom_vjp
    def spmm(x):
        return run(x)

    def _fwd(x):
        return run(x), None

    def _bwd(_, g):
        return (run_t(g),)

    spmm.defvjp(_fwd, _bwd)
    return spmm
