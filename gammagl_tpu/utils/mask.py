"""Mask/index conversion (reference: gammagl/utils/mask.py)."""

import jax.numpy as jnp
import numpy as np

__all__ = ["mask_to_index", "index_to_mask"]


def mask_to_index(mask):
    """Boolean mask -> int index array (eager: output shape data-dependent)."""
    return np.nonzero(np.asarray(mask))[0]


def index_to_mask(index, size=None):
    index = jnp.asarray(index)
    if size is None:
        size = int(index.max()) + 1
    return jnp.zeros(size, dtype=bool).at[index].set(True)
