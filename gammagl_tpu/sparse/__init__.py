"""Sparse adjacency containers (reference: gammagl/sparse/).

`SparseGraph` mirrors the reference's torch_sparse-like COO/CSR/CSC tensor
(gammagl/sparse/graph.py:14, storage.py:22 with csr2csc:200); `CSRAdj`
mirrors sparse_adj.py:48. Host-side numpy with cached conversions feeding
jit-ready arrays + the Pallas plan.
"""

from gammagl_tpu.sparse.sparse_graph import SparseGraph, CSRAdj

__all__ = ["SparseGraph", "CSRAdj"]
