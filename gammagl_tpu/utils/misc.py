"""Assorted graph utilities.

Covers the reference's homophily, laplacian, scipy conversion, and split
helpers (gammagl/utils/{homophily,get_laplacian,convert,get_split}.py).
"""

import numpy as np
import jax.numpy as jnp

from gammagl_tpu.ops.segment import segment_mean
from gammagl_tpu.utils.degree import degree

__all__ = [
    "homophily",
    "get_laplacian",
    "to_scipy_sparse_matrix",
    "from_scipy_sparse_matrix",
    "get_train_val_test_split",
]


def homophily(edge_index, y, method="edge"):
    """Edge or node homophily ratio (reference: gammagl/utils/homophily.py)."""
    src, dst = np.asarray(edge_index)
    y = np.asarray(y)
    same = (y[src] == y[dst]).astype(np.float32)
    if method == "edge":
        return float(same.mean())
    if method == "node":
        num_nodes = len(y)
        out = np.asarray(segment_mean(jnp.asarray(same), jnp.asarray(dst),
                                      num_nodes))
        deg = np.asarray(degree(jnp.asarray(dst), num_nodes))
        return float(out[deg > 0].mean())
    raise ValueError(f"unknown method {method!r}")


def get_laplacian(edge_index, num_nodes, edge_weight=None,
                  normalization=None):
    """Graph Laplacian edges: L = D - A, or normalized variants ('sym'|'rw').

    Reference: gammagl/utils/get_laplacian.py. Returns (edge_index, weight)
    including the diagonal entries appended at the end.
    """
    src, dst = edge_index[0], edge_index[1]
    if edge_weight is None:
        edge_weight = jnp.ones(src.shape[0], dtype=jnp.float32)
    deg = degree(dst, num_nodes, dtype=edge_weight.dtype)
    diag = jnp.arange(num_nodes, dtype=edge_index.dtype)
    if normalization is None:
        w = jnp.concatenate([-edge_weight, deg])
    elif normalization == "sym":
        dis = jnp.where(deg > 0, deg ** -0.5, 0.0)
        w = jnp.concatenate([-dis[src] * edge_weight * dis[dst],
                             jnp.ones(num_nodes, edge_weight.dtype)])
    elif normalization == "rw":
        dinv = jnp.where(deg > 0, 1.0 / deg, 0.0)
        w = jnp.concatenate([-dinv[dst] * edge_weight,
                             jnp.ones(num_nodes, edge_weight.dtype)])
    else:
        raise ValueError(f"unknown normalization {normalization!r}")
    ei = jnp.concatenate([edge_index, jnp.stack([diag, diag])], axis=1)
    return ei, w


def to_scipy_sparse_matrix(edge_index, edge_attr=None, num_nodes=None):
    import scipy.sparse as sp
    ei = np.asarray(edge_index)
    if num_nodes is None:
        num_nodes = int(ei.max()) + 1 if ei.size else 0
    vals = (np.ones(ei.shape[1]) if edge_attr is None
            else np.asarray(edge_attr).reshape(-1))
    return sp.coo_matrix((vals, (ei[0], ei[1])),
                         shape=(num_nodes, num_nodes))


def from_scipy_sparse_matrix(mat):
    mat = mat.tocoo()
    return (np.stack([mat.row, mat.col]).astype(np.int64),
            np.asarray(mat.data))


def get_train_val_test_split(num_nodes, train_per_class=None, labels=None,
                             num_classes=None, train_ratio=0.1,
                             val_ratio=0.1, rng=None):
    """Random split masks (reference: gammagl/utils/get_split.py style)."""
    rng = rng or np.random.default_rng(0)
    perm = rng.permutation(num_nodes)
    if train_per_class is not None and labels is not None:
        labels = np.asarray(labels)
        if num_classes is None:
            num_classes = int(labels.max()) + 1
        train_idx = np.concatenate([
            rng.permutation(np.nonzero(labels == c)[0])[:train_per_class]
            for c in range(num_classes)])
        rest = np.setdiff1d(perm, train_idx)
        n_val = int(val_ratio * num_nodes)
        val_idx, test_idx = rest[:n_val], rest[n_val:]
    else:
        n_train = int(train_ratio * num_nodes)
        n_val = int(val_ratio * num_nodes)
        train_idx = perm[:n_train]
        val_idx = perm[n_train:n_train + n_val]
        test_idx = perm[n_train + n_val:]
    def mask(idx):
        m = np.zeros(num_nodes, dtype=bool)
        m[idx] = True
        return m
    return mask(train_idx), mask(val_idx), mask(test_idx)
