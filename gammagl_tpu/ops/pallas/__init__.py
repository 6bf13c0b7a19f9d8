"""Pallas TPU kernels for the hot message-passing primitives."""

from gammagl_tpu.ops.pallas.segment_matmul import (  # noqa: F401
    CSRPlan,
    build_csr_plan,
    segment_sum_csr,
    spmm_csr,
)

__all__ = ["CSRPlan", "build_csr_plan", "segment_sum_csr", "spmm_csr"]
