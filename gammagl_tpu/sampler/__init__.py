"""Sampler abstraction (reference: gammagl/sampler/)."""

from gammagl_tpu.sampler.neighbor_sampler import (
    SamplerOutput, NeighborSampler, sample_neighbors_padded)

__all__ = ["SamplerOutput", "NeighborSampler", "sample_neighbors_padded"]
