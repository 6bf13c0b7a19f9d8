"""Attention-path primitives over a CSR plan.

The reference expresses attention as gather-scores -> segment softmax ->
weighted scatter (gat_conv.py:100-112 + utils/softmax.py:10 + bspmm). Here
the whole pipeline runs in the plan's padded sorted edge order:

  * endpoint gathers use `plan.src_pad` / `plan.row_global` (no separate
    permutation of per-edge tensors);
  * the softmax normalizes over `row_global` (destination-sorted scalar
    segments -- cheap XLA scatters);
  * the weighted aggregation is H calls into the MXU segment-matmul kernel
    (one per head), never materializing the weighted message matrix.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.ops.pallas.segment_matmul import (_segment_matmul,
                                                   BlockedCSRPlan, CSRPlan,
                                                   gather_rows)

__all__ = ["plan_gather_src", "plan_gather_dst", "segment_softmax_padded",
           "bspmm_csr"]


def _single(plan):
    if isinstance(plan, BlockedCSRPlan):
        raise ValueError(
            "attention path expects a single-block CSRPlan; build with "
            "num_src_blocks=1 (attention scores are per-edge, the gather "
            "footprint win applies to features, not scores)")
    return plan


def plan_gather_src(x, plan):
    """x[src] in padded plan order: (E_pad, ...). The VJP scatter rides
    the sorted segment-matmul kernel (see gather_rows)."""
    return gather_rows(x, _single(plan), "src")


def plan_gather_dst(x, plan):
    """x[dst] in padded plan order (pads clamped; mask via plan.valid).
    The VJP scatter is a direct plan-order segment reduce (edges are
    already dst-sorted)."""
    return gather_rows(x, _single(plan), "dst")


def segment_softmax_padded(scores, plan):
    """Per-destination softmax of (E_pad, ...) scores in plan order.

    Padded entries get probability 0 (masked before the max/sum scatters).
    """
    p = _single(plan)
    rows = jnp.asarray(p.row_global.astype(np.int32))
    valid = jnp.asarray(p.valid)
    vshape = (-1,) + (1,) * (scores.ndim - 1)
    scores = jnp.where(valid.reshape(vshape), scores, -jnp.inf)
    mx = jax.ops.segment_max(scores, rows, num_segments=p.nblocks * p.R)
    mx = jnp.where(jnp.isneginf(mx), 0.0, mx)
    rows_c = jnp.asarray(np.minimum(p.row_global, p.nblocks * p.R - 1))
    exp = jnp.exp(scores - mx[rows_c])
    exp = jnp.where(valid.reshape(vshape), exp, 0.0)
    denom = jax.ops.segment_sum(exp, rows, num_segments=p.nblocks * p.R)
    return exp / (denom[rows_c] + 1e-16)


def bspmm_csr(x_heads, alpha_pad, plan, interpret=False):
    """Multi-head weighted aggregation: out[d,h] = sum w[e,h] x[src_e,h].

    x_heads: (N, H, F); alpha_pad: (E_pad, H) in plan order.
    Returns (num_nodes, H, F). One gather for all heads (separate gathers
    in one program interleave and thrash, see PERF_NOTES.md), then one MXU
    kernel call per head over a free slice.
    """
    p = _single(plan)
    N, H, F = x_heads.shape
    msg_all = gather_rows(x_heads.reshape(N, H * F), p, "src")
    outs = []
    for h in range(H):
        msg = jax.lax.slice_in_dim(msg_all, h * F, (h + 1) * F, axis=1)
        outs.append(_segment_matmul(msg, alpha_pad[:, h], p,
                                    interpret)[:p.num_nodes])
    return jnp.stack(outs, axis=1)
