"""Disjoint-union batching of graphs.

Reference: gammagl/data/batch.py:13 `BatchGraph.from_data_list:55`,
`to_data_list:154` and the collate/separate pair (gammagl/data/collate.py:11,
separate.py:9): concatenate along `__cat_dim__`, offset index-valued
attributes by cumulative `__inc__`, keep slice bookkeeping for unbatching.
Host-side numpy (batching shapes are data-dependent); the result is a static
`Graph` ready for device_put / padding.
"""

from typing import List

import numpy as np

from gammagl_tpu.data.graph import Graph

__all__ = ["BatchGraph"]


class BatchGraph(Graph):
    """A Graph formed as the disjoint union of a list of graphs, with a
    `batch` vector mapping each node to its source graph."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        object.__setattr__(self, "_slices", None)
        object.__setattr__(self, "_incs", None)
        object.__setattr__(self, "_num_graphs", None)

    @property
    def num_graphs(self):
        return self._num_graphs

    @classmethod
    def from_data_list(cls, data_list: List[Graph], follow_batch=None,
                       exclude_keys=None):
        exclude = set(exclude_keys or ())
        keys = [k for k in data_list[0].keys() if k not in exclude]
        batch = cls()
        slices = {k: [0] for k in keys}
        incs = {k: [0] for k in keys}
        parts = {k: [] for k in keys}
        batch_vec = []
        node_counts = []
        for i, g in enumerate(data_list):
            n = g.num_nodes
            node_counts.append(n)
            batch_vec.append(np.full(n, i, dtype=np.int64))
            for k in keys:
                v = np.asarray(g[k])
                if v.ndim == 0:
                    # graph-level scalar (class label, category id):
                    # stack to one row per graph
                    v = v.reshape(1)
                inc = incs[k][-1]
                if g.__inc__(k) != 0:
                    v = v + inc
                parts[k].append(v)
                cat_dim = g.__cat_dim__(k)
                slices[k].append(slices[k][-1] + v.shape[cat_dim])
                incs[k].append(inc + g.__inc__(k))
        for k in keys:
            cat_dim = data_list[0].__cat_dim__(k)
            batch[k] = np.concatenate(parts[k], axis=cat_dim)
        batch["batch"] = np.concatenate(batch_vec)
        batch["ptr"] = np.cumsum([0] + node_counts).astype(np.int64)
        if follow_batch:
            for k in follow_batch:
                if k in keys:
                    vec = [np.full(np.asarray(g[k]).shape[g.__cat_dim__(k)],
                                   i, np.int64)
                           for i, g in enumerate(data_list)]
                    batch[f"{k}_batch"] = np.concatenate(vec)
        object.__setattr__(batch, "_slices",
                           {k: np.asarray(v) for k, v in slices.items()})
        object.__setattr__(batch, "_num_graphs", len(data_list))
        batch.num_nodes = int(sum(node_counts))
        return batch

    def to_data_list(self):
        if self._slices is None:
            raise RuntimeError(
                "BatchGraph was not created via from_data_list")
        out = []
        ptr = np.asarray(self["ptr"])
        for i in range(self._num_graphs):
            g = Graph()
            for k, sl in self._slices.items():
                v = np.asarray(self[k])
                cat_dim = self.__cat_dim__(k)
                piece = np.take(v, np.arange(sl[i], sl[i + 1]), axis=cat_dim)
                if self.__inc__(k) != 0 or k == "edge_index":
                    piece = piece - ptr[i]
                g[k] = piece
            g.num_nodes = int(ptr[i + 1] - ptr[i])
            out.append(g)
        return out
