"""SpMM / BSpMM: fused message + aggregate over COO edges.

TPU-native counterpart of the reference's gspmm/bspmm C++ autograd kernels
(gammagl/mpops/torch.py:302,354; gammagl/mpops/torch_ext/src/gspmm.cpp:26-80).
The reference hand-writes forward scatter + backward gather; here the forward
is gather -> scale -> segment reduce, expressed so XLA fuses the gather and
multiply into the scatter, and autodiff produces the transposed-graph SpMM
backward for free.

A Pallas fast path (`gammagl_tpu.ops.pallas.segment_matmul`) is available for
row-sorted edges via `Graph.csr_plan`; this module is the format-agnostic COO
entry point used by `MessagePassing`.
"""

from typing import Optional

import jax.numpy as jnp

from gammagl_tpu.ops.segment import (segment_max, segment_mean, segment_min,
                                     segment_sum)

__all__ = ["spmm", "bspmm", "gspmm"]


def spmm(edge_index, edge_weight, x, num_nodes: Optional[int] = None,
         reduce: str = "sum"):
    """out[d] = reduce_{(s,d) in E} w_{sd} * x[s].

    Parameters
    ----------
    edge_index : (2, E) int array, row 0 = src, row 1 = dst
        (reference convention gammagl/layers/conv/message_passing.py:55-61).
    edge_weight : (E,) or None
    x : (N, F) node features
    num_nodes : static int; defaults to x.shape[0]
    reduce : 'sum' | 'mean' | 'max' | 'min'
    """
    if num_nodes is None:
        num_nodes = x.shape[0]
    src, dst = edge_index[0], edge_index[1]
    # Clamp the gather (OOB pad src would otherwise clamp anyway; make it
    # explicit) -- the scatter drops OOB dst so pads are exact no-ops.
    msg = jnp.take(x, jnp.minimum(src, x.shape[0] - 1), axis=0)
    if edge_weight is not None:
        msg = msg * edge_weight.reshape((-1,) + (1,) * (x.ndim - 1))
    if reduce == "sum":
        return segment_sum(msg, dst, num_nodes)
    if reduce == "mean":
        return segment_mean(msg, dst, num_nodes)
    if reduce == "max":
        return segment_max(msg, dst, num_nodes)
    if reduce == "min":
        return segment_min(msg, dst, num_nodes)
    raise ValueError(f"unknown reduce {reduce!r}")


# Reference name (gammagl/mpops/torch.py:302).
def gspmm(edge_index, edge_weight, x, reduce: str = "sum",
          num_nodes: Optional[int] = None):
    return spmm(edge_index, edge_weight, x, num_nodes=num_nodes,
                reduce=reduce)


def bspmm(edge_index, edge_weight, x, num_nodes: Optional[int] = None,
          reduce: str = "sum"):
    """Batched (multi-head) SpMM for attention convs.

    Reference: gammagl/mpops/torch.py:354 (BSpMMSum); x is (N, H, F),
    edge_weight is (E, H) per-head attention coefficients.
    """
    if num_nodes is None:
        num_nodes = x.shape[0]
    src, dst = edge_index[0], edge_index[1]
    msg = jnp.take(x, jnp.minimum(src, x.shape[0] - 1), axis=0)  # (E, H, F)
    if edge_weight is not None:
        msg = msg * edge_weight[..., None]
    if reduce == "sum":
        return segment_sum(msg, dst, num_nodes)
    if reduce == "mean":
        return segment_mean(msg, dst, num_nodes)
    if reduce == "max":
        return segment_max(msg, dst, num_nodes)
    raise ValueError(f"unknown reduce {reduce!r}")
