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

import functools

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.ops.pallas.segment_matmul import (_segment_matmul,
                                                   BlockedCSRPlan, CSRPlan,
                                                   build_csr_plan,
                                                   gather_rows)

__all__ = ["plan_gather_src", "plan_gather_dst", "plan_gather_src_compact",
           "segment_softmax_padded", "bspmm_csr"]


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


def _compact_transpose_plan(plan, n_rows):
    """Companion plan reducing COMPACT-gather cotangents back to source
    rows (dst role = the sorted src ids), cached per (plan, n_rows)."""
    cache = getattr(plan, "_ctplans", None)
    if cache is None:
        cache = plan._ctplans = {}
    tp = cache.get(n_rows)
    if tp is None:
        E = plan.num_edges
        tp = build_csr_plan(np.arange(E, dtype=np.int64),
                            plan.gsrc[:E].astype(np.int64), n_rows,
                            num_src=max(E, 1), R=plan.R, ET=plan.ET)
        cache[n_rows] = tp
    return tp


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def plan_gather_src_compact(x, plan):
    """x[src] in COMPACT gather order for a window plan: (gather_len,
    ...) -- row g is the g-th dst-sorted edge's source row (tail pads
    clamped to row 0). The gather fetches E rows instead of E_pad (the
    engine is row-rate-bound; padding is pure loss), and
    `flash_edge_attention` / `flash_softmax_spmm` accept the result
    directly (they detect compact inputs by length). The VJP scatter
    rides the sorted segment-matmul kernel like `gather_rows`."""
    return jnp.take(x, jnp.asarray(_single(plan).gsrc), axis=0)


def _gather_compact_fwd(x, plan):
    return plan_gather_src_compact(x, plan), x.shape[0]


def _gather_compact_bwd(plan, n_rows, v):
    E = plan.num_edges
    if v.ndim == 1:
        dx = jax.ops.segment_sum(v[:E], jnp.asarray(plan.gsrc[:E]),
                                 num_segments=n_rows)
        return (dx,)
    tp = _compact_transpose_plan(plan, n_rows)
    v_ext = jnp.concatenate(
        [v[:E], jnp.zeros((1,) + v.shape[1:], v.dtype)])
    msg = jnp.take(v_ext, jnp.asarray(np.minimum(tp.perm, E)), axis=0)
    w = jnp.asarray(tp.valid).astype(v.dtype)
    return (_segment_matmul(msg, w, tp, False)[:n_rows],)


plan_gather_src_compact.defvjp(_gather_compact_fwd, _gather_compact_bwd)


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
