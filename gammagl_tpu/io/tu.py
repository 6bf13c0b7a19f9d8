"""TU-dataset reader (graph classification collections).

Reference: gammagl/io/tu.py:17 -- DS_A.txt edge list, DS_graph_indicator.txt
node->graph map, optional node/edge labels & attributes, DS_graph_labels.txt.
"""

import glob
import os.path as osp

import numpy as np

from gammagl_tpu.data.graph import Graph
from gammagl_tpu.io.txt_array import read_txt_array

__all__ = ["read_tu_data"]


def _cat(seq):
    seq = [s.reshape(s.shape[0], -1) for s in seq if s is not None]
    return np.concatenate(seq, axis=-1) if seq else None


def _one_hot(labels):
    labels = labels - labels.min()
    n = int(labels.max()) + 1
    out = np.zeros((labels.shape[0], n), np.float32)
    out[np.arange(labels.shape[0]), labels] = 1
    return out


def read_tu_data(folder, prefix):
    files = glob.glob(osp.join(folder, f"{prefix}_*.txt"))
    names = [osp.basename(f)[len(prefix) + 1:-4] for f in files]

    edge_index = read_txt_array(osp.join(folder, f"{prefix}_A.txt"),
                                sep=",").T - 1
    batch = read_txt_array(
        osp.join(folder, f"{prefix}_graph_indicator.txt")) - 1

    node_attrs = node_labels = None
    if "node_attributes" in names:
        node_attrs = read_txt_array(
            osp.join(folder, f"{prefix}_node_attributes.txt"), sep=",",
            dtype=np.float32)
    if "node_labels" in names:
        node_labels = _one_hot(read_txt_array(
            osp.join(folder, f"{prefix}_node_labels.txt")))
    x = _cat([node_attrs, node_labels])

    edge_attrs = edge_labels = None
    if "edge_attributes" in names:
        edge_attrs = read_txt_array(
            osp.join(folder, f"{prefix}_edge_attributes.txt"), sep=",",
            dtype=np.float32)
    if "edge_labels" in names:
        edge_labels = _one_hot(read_txt_array(
            osp.join(folder, f"{prefix}_edge_labels.txt")))
    edge_attr = _cat([edge_attrs, edge_labels])

    y = None
    if "graph_labels" in names:
        y = read_txt_array(osp.join(folder, f"{prefix}_graph_labels.txt"))
        _, y = np.unique(y, return_inverse=True)
    elif "graph_attributes" in names:
        y = read_txt_array(
            osp.join(folder, f"{prefix}_graph_attributes.txt"),
            dtype=np.float32)

    # split into per-graph Graph objects
    num_graphs = int(batch.max()) + 1
    node_ptr = np.concatenate([[0], np.cumsum(np.bincount(
        batch.astype(np.int64), minlength=num_graphs))])
    edge_batch = batch[edge_index[0]]
    graphs = []
    for g in range(num_graphs):
        lo, hi = node_ptr[g], node_ptr[g + 1]
        emask = edge_batch == g
        ei = edge_index[:, emask] - lo
        graph = Graph(edge_index=ei, num_nodes=int(hi - lo))
        if x is not None:
            graph.x = x[lo:hi]
        if edge_attr is not None:
            graph.edge_attr = edge_attr[emask]
        if y is not None:
            graph.y = np.asarray([y[g]])
        graphs.append(graph)
    return graphs
