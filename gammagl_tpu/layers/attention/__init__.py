from gammagl_tpu.layers.attention.graphormer import (
    CentralityEncoder, SpatialEncoder, EdgeEncoder, GraphormerLayer)

__all__ = ["CentralityEncoder", "SpatialEncoder", "EdgeEncoder",
           "GraphormerLayer"]
