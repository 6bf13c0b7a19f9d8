"""Sparse-format conversions and edge bookkeeping.

Replaces the reference's C++ `_sparse` module surface
(gammagl/ops/sparse/cpu/sparse_module.cpp:8-19 `c_ind2ptr`, `c_ptr2ind`,
convert.cpp COO<->CSR) with two tiers:
  * numpy host versions (for graph preprocessing, used by loaders/samplers)
  * jnp device versions (jit-safe, static shapes)
"""

import numpy as np
import jax.numpy as jnp

__all__ = [
    "ind2ptr",
    "ptr2ind",
    "ind2ptr_np",
    "ptr2ind_np",
    "unique_np",
]


def ind2ptr(ind, M: int):
    """Sorted COO row indices -> CSR rowptr of length M+1 (device, jit-safe).

    Reference: gammagl/ops/sparse/cpu/convert.cpp ind2ptr.
    """
    # rowptr[r] = number of indices < r = searchsorted-left.
    return jnp.searchsorted(ind, jnp.arange(M + 1), side="left").astype(
        jnp.int32)


def ptr2ind(ptr, E: int):
    """CSR rowptr -> row index per nonzero (device, jit-safe; E static)."""
    # row[e] = number of ptr entries <= e, minus 1 over interior pointers.
    return (jnp.searchsorted(ptr[1:], jnp.arange(E), side="right")
            .astype(jnp.int32))


def ind2ptr_np(ind, M: int):
    """Host/numpy ind2ptr."""
    ind = np.asarray(ind)
    return np.searchsorted(ind, np.arange(M + 1), side="left").astype(
        np.int32)


def ptr2ind_np(ptr, E: int = None):
    ptr = np.asarray(ptr)
    if E is None:
        E = int(ptr[-1])
    return np.searchsorted(ptr[1:], np.arange(E), side="right").astype(
        np.int32)


def unique_np(x, return_inverse=False, return_counts=False):
    """Sorted unique with optional inverse/counts.

    Reference: gammagl/ops/tensor/cpu/unique.cpp:1-81 (module `_tensor`).
    """
    return np.unique(np.asarray(x), return_inverse=return_inverse,
                     return_counts=return_counts)
