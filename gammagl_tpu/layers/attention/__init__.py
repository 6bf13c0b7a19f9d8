from gammagl_tpu.layers.attention.graphormer import (
    CentralityEncoder, SpatialEncoder, EdgeEncoder, GraphormerLayer)

from gammagl_tpu.layers.attention.rgt import (
    CrossManifoldAttention, EuclideanAttention, HyperbolicStructureLearner,
    SphericalStructureLearner, EuclideanStructureLearner)

__all__ = ["CentralityEncoder", "SpatialEncoder", "EdgeEncoder",
           "GraphormerLayer", "CrossManifoldAttention", "EuclideanAttention",
           "HyperbolicStructureLearner", "SphericalStructureLearner",
           "EuclideanStructureLearner"]
