"""Edge coalescing and sorting (reference: gammagl/utils/{coalesce,sort_edge_index}.py).

Host-side (numpy) graph canonicalization: dynamic output shapes keep these out
of jit; they run once during preprocessing.
"""

import numpy as np

__all__ = ["coalesce", "sort_edge_index"]


def sort_edge_index(edge_index, edge_attr=None, num_nodes=None,
                    sort_by_row=True):
    """Sort edges lexicographically by (row, col) (or (col, row))."""
    ei = np.asarray(edge_index)
    if num_nodes is None:
        num_nodes = int(ei.max()) + 1 if ei.size else 0
    key = ei[0] * num_nodes + ei[1] if sort_by_row else ei[1] * num_nodes + ei[0]
    perm = np.argsort(key, kind="stable")
    out = ei[:, perm]
    if edge_attr is None:
        return out
    if isinstance(edge_attr, (list, tuple)):
        return out, [np.asarray(a)[perm] for a in edge_attr]
    return out, np.asarray(edge_attr)[perm]


def coalesce(edge_index, edge_attr=None, num_nodes=None, reduce="sum",
             is_sorted=False):
    """Deduplicate edges, reducing duplicate attributes ('sum'|'mean'|'max'|'min'|'mul')."""
    ei = np.asarray(edge_index)
    if num_nodes is None:
        num_nodes = int(ei.max()) + 1 if ei.size else 0
    key = ei[0].astype(np.int64) * num_nodes + ei[1]
    if not is_sorted:
        perm = np.argsort(key, kind="stable")
        ei, key = ei[:, perm], key[perm]
        if edge_attr is not None:
            edge_attr = np.asarray(edge_attr)[perm]
    uniq, first_idx, inverse = np.unique(key, return_index=True,
                                         return_inverse=True)
    out = ei[:, first_idx]
    if edge_attr is None:
        return out
    attr = np.asarray(edge_attr)
    shape = (len(uniq),) + attr.shape[1:]
    if reduce == "sum" or reduce == "add":
        red = np.zeros(shape, attr.dtype)
        np.add.at(red, inverse, attr)
    elif reduce == "mean":
        red = np.zeros(shape, np.float64)
        np.add.at(red, inverse, attr)
        cnt = np.zeros(len(uniq), np.int64)
        np.add.at(cnt, inverse, 1)
        red = (red / cnt.reshape((-1,) + (1,) * (attr.ndim - 1))).astype(
            attr.dtype)
    elif reduce == "max":
        red = np.full(shape, -np.inf, np.float64)
        np.maximum.at(red, inverse, attr)
        red = red.astype(attr.dtype)
    elif reduce == "min":
        red = np.full(shape, np.inf, np.float64)
        np.minimum.at(red, inverse, attr)
        red = red.astype(attr.dtype)
    elif reduce == "mul":
        red = np.ones(shape, attr.dtype)
        np.multiply.at(red, inverse, attr)
    else:
        raise ValueError(f"unknown reduce {reduce!r}")
    return out, red
