"""Sorted segment reduction as block one-hot matmul on the MXU.

This is the TPU-native answer to the reference's scatter-add kernels
(gammagl/mpops/torch_ext/cuda/segment_sum_cuda.cu:19-31 atomicAdd over 1024
threads; cpu/spmm_sum_cpu.cpp:26-40 OpenMP atomics). TPUs have no fast
random-scatter: instead we exploit that edges sorted by destination make the
selection matrix block-banded, so each edge tile reduces into its row block
via a dense (R x ET) one-hot times (ET x F) message matmul -- work the MXU
executes at near peak, making the kernel HBM-bandwidth-bound like a dense op.
It is also fully deterministic (no atomics), unlike the reference.

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

__all__ = ["CSRPlan", "build_csr_plan", "segment_sum_csr", "spmm_csr"]


def _cdiv(a, b):
    return -(-a // b)


class CSRPlan:
    """Static per-graph layout for the sorted segment-matmul kernel.

    Hashable by identity so it can ride through ``jit`` as a static argument
    (its numpy arrays become compile-time constants -- one compilation per
    graph/bucket, which is the intended bucketing discipline).
    """

    def __init__(self, *, src_pad, perm, local_row, row_global, tile_block,
                 tile_first, num_nodes, num_src, num_edges, R, ET):
        self.src_pad = src_pad          # (E_pad,) int32, pads clamped to 0
        self.perm = perm                # (E_pad,) int32 into original edges
        self.valid = (local_row < R)    # (E_pad,) bool
        self.local_row = local_row      # (E_pad,) int32 in [0,R], R = pad
        self.row_global = row_global    # (E_pad,) int32, pads OOB
        self.tile_block = tile_block    # (T,) int32
        self.tile_first = tile_first    # (T,) int32 0/1
        self.num_nodes = int(num_nodes)
        self.num_src = int(num_src)
        self.num_edges = int(num_edges)
        self.R = int(R)
        self.ET = int(ET)
        self.E_pad = int(local_row.shape[0])
        self.T = int(tile_block.shape[0])
        self.nblocks = _cdiv(self.num_nodes, self.R)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def __repr__(self):
        return (f"CSRPlan(N={self.num_nodes}, E={self.num_edges}, "
                f"E_pad={self.E_pad}, R={self.R}, ET={self.ET}, T={self.T})")


def build_csr_plan(src, dst, num_nodes, num_src=None, R=256, ET=512):
    """Build the kernel layout from COO edges (host-side, numpy).

    ``src``/``dst`` need not be pre-sorted; edges are stably sorted by ``dst``
    here and ``perm`` records the mapping back to the caller's edge order so
    per-edge attributes (weights, attention scores) can follow.
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    E = int(dst.shape[0])
    num_src = int(num_src if num_src is not None else num_nodes)
    order = np.argsort(dst, kind="stable")
    src_s = src[order]
    dst_s = dst[order]
    # CSR block boundaries over destination rows.
    block_edges = np.searchsorted(
        dst_s, np.arange(0, _cdiv(num_nodes, R) * R + 1, R), side="left")
    nblocks = len(block_edges) - 1

    perm_parts, src_parts, lr_parts = [], [], []
    tile_block, tile_first = [], []
    for b in range(nblocks):
        lo, hi = int(block_edges[b]), int(block_edges[b + 1])
        e_b = hi - lo
        n_t = max(1, _cdiv(e_b, ET))
        pad = n_t * ET - e_b
        perm_parts.append(order[lo:hi])
        perm_parts.append(np.full(pad, E, dtype=np.int64))
        src_parts.append(src_s[lo:hi])
        src_parts.append(np.zeros(pad, dtype=np.int64))
        lr_parts.append(dst_s[lo:hi] - b * R)
        lr_parts.append(np.full(pad, R, dtype=np.int64))
        tile_block.extend([b] * n_t)
        tile_first.extend([1] + [0] * (n_t - 1))

    local_row = np.concatenate(lr_parts).astype(np.int32)
    perm = np.concatenate(perm_parts).astype(np.int32)
    src_pad = np.concatenate(src_parts).astype(np.int32)
    tile_block = np.asarray(tile_block, dtype=np.int32)
    # Global destination row per padded edge (pads land out of range).
    blk_of_edge = np.repeat(tile_block, ET)
    row_global = (blk_of_edge * R + local_row).astype(np.int32)
    return CSRPlan(
        src_pad=src_pad, perm=perm, local_row=local_row,
        row_global=row_global, tile_block=tile_block,
        tile_first=np.asarray(tile_first, dtype=np.int32),
        num_nodes=num_nodes, num_src=num_src, num_edges=E, R=R, ET=ET)


def _pick_f_tile(F):
    if F % 512 == 0:
        return 512
    if F % 256 == 0:
        return 256
    return 128


def _segment_matmul_pallas(msg, plan, interpret=False):
    """msg: (E_pad, F) already in padded sorted order -> (nblocks*R, F)."""
    R, ET, T = plan.R, plan.ET, plan.T
    E_pad, F = msg.shape
    assert E_pad == plan.E_pad, (E_pad, plan.E_pad)
    F_pad = _cdiv(F, 128) * 128
    if F_pad != F:
        msg = jnp.pad(msg, ((0, 0), (0, F_pad - F)))
    FT = _pick_f_tile(F_pad)
    # (T, 1, ET): Mosaic requires the last two block dims to match the array
    # when they are not multiples of (8, 128).
    local_row = jnp.asarray(plan.local_row.reshape(T, 1, ET))

    def kernel(tb_ref, tf_ref, lr_ref, msg_ref, out_ref):
        t = pl.program_id(1)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (R, ET), 0)
                  == lr_ref[0]).astype(msg_ref.dtype)
        # The one-hot factor is exact in bf16; for f32 messages force the
        # multi-pass f32 MXU path so the reduction is full precision (the
        # reference keeps f32 accumulators too, SURVEY.md section 7).
        precision = (jax.lax.Precision.HIGHEST
                     if msg_ref.dtype == jnp.float32 else None)
        acc = jnp.dot(onehot, msg_ref[:], preferred_element_type=jnp.float32,
                      precision=precision)

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
            pl.BlockSpec((ET, FT), lambda f, t, tb, tf: (t, f)),
        ],
        out_specs=pl.BlockSpec((R, FT), lambda f, t, tb, tf: (tb[t], f)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.nblocks * R, F_pad), msg.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * ET * F_pad * T,
            bytes_accessed=(E_pad * F_pad + plan.nblocks * R * F_pad)
            * msg.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(plan.tile_block), jnp.asarray(plan.tile_first),
      local_row, msg)
    return out[:, :F]


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _segment_matmul(msg, plan, interpret=False):
    return _segment_matmul_pallas(msg, plan, interpret)


def _segment_matmul_fwd(msg, plan, interpret=False):
    return _segment_matmul_pallas(msg, plan, interpret), None


def _segment_matmul_bwd(plan, interpret, res, g):
    # d msg[e] = g[row(e)]; pads get zero so no gradient leaks through the
    # clamped gather (reference analog: SegmentSum backward = gather,
    # gammagl/mpops/torch_ext/src/segment_sum.cpp:43-54).
    rows = jnp.asarray(np.minimum(plan.row_global,
                                  plan.nblocks * plan.R - 1))
    dmsg = jnp.take(g, rows, axis=0)
    dmsg = dmsg * jnp.asarray(plan.valid)[:, None].astype(dmsg.dtype)
    return (dmsg,)


_segment_matmul.defvjp(_segment_matmul_fwd, _segment_matmul_bwd)


def segment_sum_csr(msg_pad, plan, interpret=False):
    """Segment-sum of messages already laid out in the plan's padded order.

    Returns (num_nodes, F). Differentiable w.r.t. ``msg_pad``.
    """
    out = _segment_matmul(msg_pad, plan, interpret)
    return out[:plan.num_nodes]


def spmm_csr(x, edge_weight, plan, interpret=False):
    """out[d] = sum_{(s,d)} w_sd * x[s] using the Pallas segment-matmul.

    ``edge_weight`` is in the caller's original edge order ((E,) or None);
    the plan's ``perm`` carries it into padded sorted order with zero pads,
    which both masks padded messages and zeroes their backward contribution.
    """
    src = jnp.asarray(plan.src_pad)
    msg = jnp.take(x, src, axis=0)
    if edge_weight is not None:
        w = jnp.concatenate(
            [edge_weight.reshape(-1), jnp.zeros(1, edge_weight.dtype)])
        w_pad = jnp.take(w, jnp.asarray(
            np.minimum(plan.perm, plan.num_edges)))
        msg = msg * w_pad[:, None]
    else:
        msg = msg * jnp.asarray(plan.valid)[:, None].astype(msg.dtype)
    out = _segment_matmul(msg, plan, interpret)
    return out[:plan.num_nodes]
