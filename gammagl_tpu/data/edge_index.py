"""EdgeIndex: COO edge tensor with cached CSR/CSC views.

Reference: gammagl/data/EdgeIndex.py:15 (partially NotImplemented there;
complete here). Host-side numpy container used by loaders and stores.
"""

import numpy as np

from gammagl_tpu.ops.sparse import ind2ptr_np

__all__ = ["EdgeIndex"]


class EdgeIndex:
    def __init__(self, edge_index, sparse_size=None, sort_order=None):
        self.data = np.asarray(edge_index, np.int64)
        if sparse_size is None:
            m = int(self.data.max()) + 1 if self.data.size else 0
            sparse_size = (m, m)
        self.sparse_size = tuple(sparse_size)
        self.sort_order = sort_order  # None | 'row' | 'col'
        self._rowptr = None
        self._colptr = None
        self._perm_row = None
        self._perm_col = None

    @property
    def num_edges(self):
        return self.data.shape[1]

    def sort_by(self, order):
        """Return a new EdgeIndex sorted by 'row' or 'col' plus the perm."""
        key = self.data[0] if order == "row" else self.data[1]
        perm = np.argsort(key, kind="stable")
        return EdgeIndex(self.data[:, perm], self.sparse_size, order), perm

    def get_csr(self):
        if self._rowptr is None:
            srt, perm = (self, np.arange(self.num_edges)) \
                if self.sort_order == "row" else self.sort_by("row")
            self._rowptr = ind2ptr_np(srt.data[0], self.sparse_size[0])
            self._perm_row = perm
            self._csr_col = srt.data[1]
        return self._rowptr, self._csr_col, self._perm_row

    def get_csc(self):
        if self._colptr is None:
            srt, perm = (self, np.arange(self.num_edges)) \
                if self.sort_order == "col" else self.sort_by("col")
            self._colptr = ind2ptr_np(srt.data[1], self.sparse_size[1])
            self._perm_col = perm
            self._csc_row = srt.data[0]
        return self._colptr, self._csc_row, self._perm_col

    def __array__(self, dtype=None):
        return self.data if dtype is None else self.data.astype(dtype)

    def __getitem__(self, idx):
        return self.data[idx]

    def __repr__(self):
        return (f"EdgeIndex({list(self.data.shape)}, "
                f"sparse_size={self.sparse_size}, "
                f"sort_order={self.sort_order})")
