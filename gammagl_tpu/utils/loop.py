"""Self-loop insertion / removal (reference: gammagl/utils/loop.py).

Eager (numpy/jnp, dynamic-shape) helpers for graph preprocessing. Inside jit,
prefer adding self-loops at preprocessing time so shapes stay static.
"""

import jax.numpy as jnp
import numpy as np

__all__ = ["add_self_loops", "remove_self_loops", "contains_self_loops"]


def add_self_loops(edge_index, edge_attr=None, fill_value=1.0,
                   num_nodes=None, n_loops=1):
    """Append (i, i) edges for every node; returns (edge_index, edge_attr)."""
    xp = jnp if isinstance(edge_index, jnp.ndarray) else np
    if num_nodes is None:
        num_nodes = int(edge_index.max()) + 1
    loops = xp.arange(num_nodes, dtype=edge_index.dtype)
    loops = xp.stack([loops, loops])
    if n_loops != 1:
        loops = xp.concatenate([loops] * n_loops, axis=1)
    out = xp.concatenate([edge_index, loops], axis=1)
    if edge_attr is not None:
        shape = (num_nodes * n_loops,) + tuple(edge_attr.shape[1:])
        fill = xp.full(shape, fill_value, dtype=edge_attr.dtype)
        edge_attr = xp.concatenate([edge_attr, fill], axis=0)
    return out, edge_attr


def remove_self_loops(edge_index, edge_attr=None):
    """Drop (i, i) edges (eager only: output shape is data-dependent)."""
    ei = np.asarray(edge_index)
    mask = ei[0] != ei[1]
    out = ei[:, mask]
    if edge_attr is not None:
        edge_attr = np.asarray(edge_attr)[mask]
    return out, edge_attr


def contains_self_loops(edge_index):
    ei = np.asarray(edge_index)
    return bool((ei[0] == ei[1]).any())
