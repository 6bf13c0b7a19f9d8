"""Common type aliases.

Mirrors the role of the reference's implicit typing conventions
(reference: gammagl/data/graph_store.py:47-59 edge layouts, hetero types).
"""

from typing import Any, Dict, Optional, Tuple, Union

import jax

Array = jax.Array
ArrayLike = Any  # jnp arrays, numpy arrays, python scalars

# Heterogeneous graph typing (reference: gammagl/data/heterograph.py:20).
NodeType = str
EdgeType = Tuple[str, str, str]  # (src_type, relation, dst_type)
Metadata = Tuple[list, list]

OptArray = Optional[Array]
AdjDict = Dict[EdgeType, Array]
FeatDict = Dict[NodeType, Array]

__all__ = [
    "Array",
    "ArrayLike",
    "NodeType",
    "EdgeType",
    "Metadata",
    "OptArray",
    "AdjDict",
    "FeatDict",
]
