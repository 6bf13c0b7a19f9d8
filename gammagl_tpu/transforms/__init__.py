"""Graph transforms (reference: gammagl/transforms/ -- 861 LoC)."""

from gammagl_tpu.transforms.transforms import (
    BaseTransform, Compose, NormalizeFeatures, AddSelfLoops, DropEdge,
    SVDFeatureReduction, SIGN, RandomLinkSplit, AddMetaPaths)

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
]
