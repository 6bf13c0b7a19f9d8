"""GCN normalization weights (reference: gammagl/utils/norm.py:5)."""

import jax.numpy as jnp

from gammagl_tpu.utils.degree import degree

__all__ = ["calc_gcn_norm"]


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
