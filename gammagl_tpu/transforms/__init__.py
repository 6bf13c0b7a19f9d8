"""Graph transforms (reference: gammagl/transforms/ -- 861 LoC)."""

from gammagl_tpu.transforms.transforms import (
    BaseTransform, Compose, NormalizeFeatures, AddSelfLoops, DropEdge,
    SVDFeatureReduction, SIGN, RandomLinkSplit, AddMetaPaths)

from gammagl_tpu.transforms.vgae_pre import (sparse_to_tuple, mask_test_edges, normalize_adj_for_vgae)

__all__ = [
    "BaseTransform",
    "Compose",
    "NormalizeFeatures",
    "AddSelfLoops",
    "DropEdge",
    "SVDFeatureReduction",
    "SIGN",
    "RandomLinkSplit",
    "AddMetaPaths",
    "sparse_to_tuple",
    "mask_test_edges",
    "normalize_adj_for_vgae",
]
