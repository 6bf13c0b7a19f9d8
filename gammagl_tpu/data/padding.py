"""Padding / bucketing: the static-shape discipline XLA requires.

The reference never faces this (eager backends tolerate ragged shapes --
SURVEY.md section 7 "hard parts"); here it is a first-class data utility:
  * `pad_graph` pads nodes/edges up to bucket sizes; padded edges point
    src->num_nodes (gather-clamped) and dst->num_nodes (scatter-dropped), so
    every reduction treats them as exact no-ops.
  * `size_bucket` rounds sizes to a geometric grid so jit compiles once per
    bucket rather than once per batch.
"""

import math

import numpy as np

from gammagl_tpu.data.graph import Graph

__all__ = ["pad_graph", "size_bucket", "pad_to"]


def size_bucket(n, base=64, factor=1.25):
    """Smallest bucket >= n on a geometric grid of `base * factor**k`."""
    if n <= base:
        return base
    k = math.ceil(math.log(n / base) / math.log(factor))
    return int(math.ceil(base * factor ** k / base) * base)


def pad_to(arr, size, axis=0, fill=0):
    arr = np.asarray(arr)
    pad = size - arr.shape[axis]
    if pad < 0:
        raise ValueError(f"array dim {arr.shape[axis]} exceeds pad size {size}")
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, constant_values=fill)


def pad_graph(graph: Graph, num_nodes=None, num_edges=None, bucket=False):
    """Pad a graph to static (num_nodes, num_edges) sizes.

    Adds `node_mask` / `edge_mask` boolean attrs marking real entries.
    Padded edges use src = dst = padded-node region start (= original
    num_nodes), which is outside the real node range: scatters drop dst
    (index >= num_nodes only if we scatter with real-node num_segments), and
    to be safe masked models should multiply by edge_mask.
    """
    n, e = graph.num_nodes, graph.num_edges
    if num_nodes is None:
        num_nodes = size_bucket(n) if bucket else n
    if num_edges is None:
        num_edges = size_bucket(e) if bucket else e
    g = Graph(num_nodes=num_nodes)
    for k, v in graph.items():
        v = np.asarray(v)
        if k == "edge_index":
            g[k] = pad_to(v, num_edges, axis=1, fill=num_nodes)
        elif v.ndim > 0 and v.shape[0] == n:
            g[k] = pad_to(v, num_nodes, axis=0)
        elif v.ndim > 0 and v.shape[0] == e:
            g[k] = pad_to(v, num_edges, axis=0)
        else:
            g[k] = v
    g["node_mask"] = np.arange(num_nodes) < n
    g["edge_mask"] = np.arange(num_edges) < e
    return g
