"""Pallas TPU kernels for the hot message-passing primitives."""

from gammagl_tpu.ops.pallas.segment_matmul import (  # noqa: F401
    CSRPlan,
    BlockedCSRPlan,
    build_csr_plan,
    build_csr_plan_blocked,
    segment_sum_csr,
    spmm_csr,
    pad_edge_weights,
    gather_rows,
    pack_halves,
    unpack_halves,
)
from gammagl_tpu.ops.pallas.segment_max import (  # noqa: F401
    segment_max_csr,
    segment_min_csr,
    spmm_max_csr,
    spmm_min_csr,
)
from gammagl_tpu.ops.pallas.block_pair import (  # noqa: F401
    BlockPairPlan,
    build_block_pair_plan,
    spmm_block_pair,
    HybridPlan,
    build_hybrid_plan,
    spmm_hybrid,
)
from gammagl_tpu.ops.pallas.flash_attention import (  # noqa: F401
    flash_edge_attention,
    flash_edge_attention_mh,
    flash_softmax_spmm,
    flash_softmax_spmm_mh,
)
from gammagl_tpu.ops.pallas.flash_attention import (  # noqa: F401
    attention_keep_mask,
)
from gammagl_tpu.ops.pallas.hetero_flash import (  # noqa: F401
    hgt_flash_packed,
)
from gammagl_tpu.ops.pallas.attention import (  # noqa: F401
    plan_gather_src,
    plan_gather_dst,
    plan_gather_src_compact,
    segment_softmax_padded,
    bspmm_csr,
)
from gammagl_tpu.ops.pallas.sddmm_csr import (  # noqa: F401
    sddmm_csr,
    sddmm_csr_mh,
    expand_dst_csr,
)

__all__ = ["CSRPlan", "BlockedCSRPlan", "build_csr_plan",
           "build_csr_plan_blocked", "segment_sum_csr", "spmm_csr",
           "segment_max_csr", "spmm_max_csr", "segment_min_csr",
           "spmm_min_csr",
           "pad_edge_weights", "gather_rows", "plan_gather_src",
           "plan_gather_dst", "plan_gather_src_compact",
           "segment_softmax_padded", "bspmm_csr",
           "flash_edge_attention", "flash_softmax_spmm",
           "flash_edge_attention_mh", "flash_softmax_spmm_mh",
           "hgt_flash_packed",
           "attention_keep_mask", "BlockPairPlan",
           "build_block_pair_plan", "spmm_block_pair",
           "sddmm_csr", "sddmm_csr_mh", "expand_dst_csr",
           "HybridPlan", "build_hybrid_plan", "spmm_hybrid",
           "pack_halves", "unpack_halves"]
