"""Undirected-graph helpers (reference: gammagl/utils/{to_undirected,undirected}.py)."""

import numpy as np

from gammagl_tpu.utils.coalesce import coalesce

__all__ = ["to_undirected", "is_undirected"]


def to_undirected(edge_index, edge_attr=None, num_nodes=None, reduce="sum"):
    """Add reversed edges and coalesce."""
    ei = np.asarray(edge_index)
    full = np.concatenate([ei, ei[::-1]], axis=1)
    if edge_attr is not None:
        edge_attr = np.concatenate([np.asarray(edge_attr)] * 2, axis=0)
        return coalesce(full, edge_attr, num_nodes=num_nodes, reduce=reduce)
    return coalesce(full, None, num_nodes=num_nodes, reduce=reduce)


def is_undirected(edge_index, num_nodes=None):
    ei = np.asarray(edge_index)
    if num_nodes is None:
        num_nodes = int(ei.max()) + 1 if ei.size else 0
    fwd = set(zip(ei[0].tolist(), ei[1].tolist()))
    return all((d, s) in fwd for s, d in fwd)
