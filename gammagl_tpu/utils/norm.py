"""GCN normalization weights (reference: gammagl/utils/norm.py:5)."""

import numpy as np
import jax.numpy as jnp

from gammagl_tpu.utils.degree import degree

__all__ = ["calc_gcn_norm", "calc_gcn_norm_np"]


def calc_gcn_norm(edge_index, num_nodes, edge_weight=None):
    """Symmetric GCN edge weights D^-1/2 A D^-1/2 (self-loops assumed added).

    Matches the 'both' norm of the reference GCNConv
    (gammagl/layers/conv/gcn_conv.py:90-104).
    """
    src, dst = edge_index[0], edge_index[1]
    if edge_weight is None:
        edge_weight = jnp.ones(src.shape[0], dtype=jnp.float32)
    deg = degree(dst, num_nodes=num_nodes, dtype=edge_weight.dtype)
    deg_inv_sqrt = jnp.where(deg > 0, jax_rsqrt(deg), 0.0)
    return deg_inv_sqrt[src] * edge_weight * deg_inv_sqrt[dst]


def jax_rsqrt(x):
    return x ** -0.5


def calc_gcn_norm_np(edge_index, num_nodes, edge_weight=None):
    """Host-side (numpy) `calc_gcn_norm` for graphs whose edge list must
    never touch a device whole — e.g. papers100M's ~1.7B edges (~27 GB
    int64) before partitioning. Same math (UNWEIGHTED in-degree, like
    the jnp version), streaming bincount."""
    src, dst = np.asarray(edge_index[0]), np.asarray(edge_index[1])
    if edge_weight is None:
        edge_weight = np.ones(src.shape[0], np.float32)
    deg = np.bincount(dst, minlength=num_nodes).astype(np.float32)
    dis = np.zeros_like(deg)
    nz = deg > 0
    dis[nz] = deg[nz] ** -0.5
    return (dis[src] * np.asarray(edge_weight, np.float32)
            * dis[dst]).astype(np.float32)
