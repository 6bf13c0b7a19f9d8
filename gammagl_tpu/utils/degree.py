"""Node degree (reference: gammagl/utils/degree.py)."""

import jax.numpy as jnp

from gammagl_tpu.ops.segment import segment_count

__all__ = ["degree"]


def degree(index, num_nodes=None, dtype=jnp.float32):
    """Count occurrences of each node id in ``index``.

    ``num_nodes`` must be static under jit; defaults to max(index)+1 when
    called eagerly.
    """
    if num_nodes is None:
        num_nodes = int(index.max()) + 1
    return segment_count(index, num_nodes, dtype=dtype)
