"""Graph: the core homogeneous graph container, as a JAX pytree.

TPU-first re-design of the reference's dict-backed eager `Graph`
(gammagl/data/graph.py:31,358): attributes live in one flat mapping and the
whole object is a registered pytree, so a `Graph` flows through `jit`,
`grad`, `vmap`, and `shard_map` directly. Shapes are static per instance --
the padding/bucketing utilities (`gammagl_tpu.data.padding`) produce
fixed-shape graphs so XLA compiles once per bucket.

The `__cat_dim__` / `__inc__` batching protocol (reference graph.py:85-107)
is kept verbatim in spirit: `Batch.from_data_list` uses the same offset
algebra.
"""

import copy as _copy
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["Graph", "BaseGraph"]


def _is_array(v):
    return isinstance(v, (jax.Array, np.ndarray))


class BaseGraph:
    """Shared attribute-mapping behavior for Graph / HeteroGraph stores."""

    def __init__(self, **kwargs):
        self._store: Dict[str, Any] = {}
        for k, v in kwargs.items():
            if v is not None:
                self._store[k] = v

    # -- mapping protocol ---------------------------------------------------
    def __getattr__(self, key):
        store = self.__dict__.get("_store")
        if store is not None and key in store:
            return store[key]
        raise AttributeError(key)

    def __setattr__(self, key, value):
        if key.startswith("_") or key == "num_nodes":
            object.__setattr__(self, key, value)
        else:
            self._store[key] = value

    def __getitem__(self, key):
        return self._store[key]

    def __setitem__(self, key, value):
        self._store[key] = value

    def __delitem__(self, key):
        del self._store[key]

    def __contains__(self, key):
        return key in self._store

    def keys(self):
        return self._store.keys()

    def items(self):
        return self._store.items()

    def values(self):
        return self._store.values()

    def to_dict(self):
        return dict(self._store)


class Graph(BaseGraph):
    """Homogeneous graph: `x` (N, F) node features, `edge_index` (2, E) COO
    src/dst rows, plus arbitrary named attributes.

    Parameters mirror the reference `Graph` (gammagl/data/graph.py:358):
    x, edge_index, edge_attr/edge_weight, y, plus any kwargs.
    """

    def __init__(self, x=None, edge_index=None, edge_attr=None, y=None,
                 num_nodes=None, **kwargs):
        super().__init__(x=x, edge_index=edge_index, edge_attr=edge_attr,
                         y=y, **kwargs)
        object.__setattr__(self, "_num_nodes", num_nodes)
        object.__setattr__(self, "_csr_plan", None)
        object.__setattr__(self, "_csc_plan", None)

    # -- sizes --------------------------------------------------------------
    @property
    def num_nodes(self):
        if self._num_nodes is not None:
            return self._num_nodes
        x = self._store.get("x")
        if x is not None:
            return int(x.shape[0])
        ei = self._store.get("edge_index")
        if ei is not None:
            return int(np.asarray(ei).max()) + 1
        return None

    @num_nodes.setter
    def num_nodes(self, v):
        object.__setattr__(self, "_num_nodes", v)

    @property
    def num_edges(self):
        ei = self._store.get("edge_index")
        return int(ei.shape[1]) if ei is not None else 0

    @property
    def num_node_features(self):
        x = self._store.get("x")
        return int(x.shape[-1]) if x is not None else 0

    num_features = num_node_features

    @property
    def num_edge_features(self):
        ea = self._store.get("edge_attr")
        return int(ea.shape[-1]) if ea is not None and ea.ndim > 1 else 0

    # -- degree (reference graph.py:557-575) --------------------------------
    @property
    def in_degree(self):
        from gammagl_tpu.utils.degree import degree
        return degree(jnp.asarray(self.edge_index[1]), self.num_nodes)

    @property
    def out_degree(self):
        from gammagl_tpu.utils.degree import degree
        return degree(jnp.asarray(self.edge_index[0]), self.num_nodes)

    # -- batching protocol (reference graph.py:85-107) ----------------------
    def __cat_dim__(self, key, value=None):
        if key == "edge_index":
            return 1
        return 0

    def __inc__(self, key, value=None):
        if key == "edge_index":
            return self.num_nodes
        if "index" in key or key == "face":
            return self.num_nodes
        return 0

    # -- graph ops ----------------------------------------------------------
    def add_self_loop(self, n_loops=1):
        """Reference: gammagl/data/graph.py:577."""
        from gammagl_tpu.utils.loop import add_self_loops
        ei, ea = add_self_loops(self.edge_index,
                                self._store.get("edge_attr"),
                                num_nodes=self.num_nodes, n_loops=n_loops)
        g = self.clone()
        g.edge_index = ei
        if ea is not None:
            g.edge_attr = ea
        return g

    def sorted_edges(self, sort_by="dst"):
        """Reference: gammagl/data/graph.py:592."""
        ei = np.asarray(self.edge_index)
        key = ei[1] if sort_by == "dst" else ei[0]
        perm = np.argsort(key, kind="stable")
        return ei[:, perm], perm

    def _auto_src_blocks(self):
        """Source blocks sized so one gather touches < ~90MB (the measured
        TPU gather fast-footprint regime)."""
        x = self._store.get("x")
        if x is None:
            return 1
        bytes_ = self.num_nodes * int(np.prod(x.shape[1:])) * 4
        return max(1, -(-bytes_ // 90_000_000))

    def csr_plan(self, R=128, ET=None, num_src_blocks=None, window=True):
        """Cached Pallas segment-matmul layout (dst-major), source-blocked
        automatically for large feature matrices. ``window=True`` (the
        default) builds the aligned-window layout: the per-edge source
        gather is COMPACT (E rows instead of the padded E_pad -- the
        gather engine is row-rate-bound) and the SpMM / SDDMM / flash
        kernels stream per-tile slabs at scalar-prefetched window
        indices. R=128/ET=512 won the round-3/4 on-chip tile scans."""
        if self._csr_plan is None:
            from gammagl_tpu.ops.pallas import build_csr_plan_blocked
            nb = (num_src_blocks if num_src_blocks is not None
                  else self._auto_src_blocks())
            et = ET if ET is not None else (256 if nb > 1 else 512)
            if not isinstance(self.edge_index, np.ndarray):
                import warnings
                warnings.warn(
                    "csr_plan() on a device-resident edge_index forces a "
                    "device->host fetch (minutes-slow through remote-TPU "
                    "tunnels for lazily-placed arrays). Keep graphs numpy "
                    "on host and device_put only the training inputs.",
                    stacklevel=2)
            ei = np.asarray(self.edge_index)
            object.__setattr__(self, "_csr_plan", build_csr_plan_blocked(
                ei[0], ei[1], self.num_nodes, R=R, ET=et,
                num_src_blocks=nb, window=window))
        return self._csr_plan

    def reorder_rcm(self):
        """Bandwidth-reducing (reverse Cuthill-McKee) node relabeling.

        Returns (graph', perm) where graph' has every per-node attribute
        permuted and edge ids remapped (new_id i holds old node perm[i]).
        Run this ONCE before `auto_plan()` — a banded adjacency is what
        makes the gather-free block-pair kernel win (PERF_NOTES.md)."""
        from gammagl_tpu.parallel.halo import reorder_bandwidth
        ei = np.asarray(self.edge_index)
        perm, inv = reorder_bandwidth(ei, self.num_nodes)
        return self._permuted(perm, inv), perm

    def _permuted(self, perm, inv):
        n = self.num_nodes
        ei = np.asarray(self.edge_index)
        attrs = {}
        for k, v in self.items():
            if k == "edge_index":
                attrs[k] = inv[ei]
            elif _is_array(v) and v.ndim >= 1 and v.shape[0] == n:
                attrs[k] = np.asarray(v)[perm]
            else:
                attrs[k] = v
        return Graph(num_nodes=n, **attrs)

    def reorder_cluster(self, rounds=8):
        """Community-clustering relabeling (vectorized label propagation,
        parallel/partition.py:cluster_permutation): lays nodes out
        cluster-contiguously so the (dst_block, src_block) tiling of the
        gather-free block-pair kernel is dense. Complements
        `reorder_rcm` (bandwidth): LP wins on clustered/social graphs,
        RCM on banded meshes. Returns (graph', perm)."""
        from gammagl_tpu.parallel.partition import cluster_permutation
        perm, inv = cluster_permutation(np.asarray(self.edge_index),
                                        self.num_nodes, rounds=rounds)
        return self._permuted(perm, inv), perm

    def reorder_best(self, R=256, S=256, ET=256, rounds=8):
        """Try natural / RCM / label-propagation orders and keep the one
        with the highest block-pair fill (the quantity that decides the
        gather-free kernel's crossover — PERF_NOTES). O(E log E) per
        candidate, no plan materialization. Returns
        (graph', perm, name, fill); natural order returns (self,
        identity, 'natural', fill)."""
        ei = np.asarray(self.edge_index)
        n = self.num_nodes

        def fill_of(e):
            pair = ((e[1] // R).astype(np.int64) * (1 + n // S)
                    + e[0] // S)
            _, counts = np.unique(pair, return_counts=True)
            return e.shape[1] / max(int((-(-counts // ET) * ET).sum()), 1)

        best = ("natural", np.arange(n), np.arange(n), fill_of(ei))
        from gammagl_tpu.parallel.halo import reorder_bandwidth
        from gammagl_tpu.parallel.partition import cluster_permutation
        for name, fn in (("rcm", lambda: reorder_bandwidth(ei, n)),
                         ("cluster", lambda: cluster_permutation(
                             ei, n, rounds=rounds))):
            try:
                perm, inv = fn()
            except Exception:   # scipy missing etc.
                continue
            f = fill_of(inv[ei])
            if f > best[3]:
                best = (name, perm, inv, f)
        name, perm, inv, fill = best
        if name == "natural":
            return self, perm, name, fill
        return self._permuted(perm, inv), perm, name, fill

    def block_pair_fill(self, R=256, S=256, ET=256):
        """O(E) estimate of the block-pair plan's fill_ratio — unique
        (dst_block, src_block) pair counts, each padded to a multiple of
        ET — WITHOUT materializing the padded plan arrays (which would
        be O(pairs*ET) memory: ruinous on exactly the scattered graphs
        the estimate is meant to reject)."""
        ei = np.asarray(self.edge_index)
        pair = ((ei[1] // R).astype(np.int64)
                * (1 + self.num_nodes // S) + ei[0] // S)
        _, counts = np.unique(pair, return_counts=True)
        e_pad = int((-(-counts // ET) * ET).sum())
        return ei.shape[1] / max(e_pad, 1)

    def auto_plan(self, fill_threshold=0.8, R=256, S=256, ET=256,
                  hybrid_threshold=0.25):
        """Pick the best Pallas SpMM layout by the measured crossover
        rule (PERF_NOTES.md): the gather-free block-pair kernel when the
        whole (dst_block, src_block) tiling is dense (fill >= 0.8,
        typical after `reorder_rcm()`/`reorder_cluster()`); a
        `HybridPlan` when at least ``hybrid_threshold`` of the edges sit
        in dense pairs (those go gather-free, the scattered tail keeps
        the CSR gather kernel); the CSR plan otherwise. The fill test is
        O(E); plans are cached per (R, S, ET). The returned object goes
        into any conv's `plan=` argument."""
        key = (R, S, ET)
        cache = getattr(self, "_bp_plans", None)
        if cache is None:
            cache = {}
            object.__setattr__(self, "_bp_plans", cache)
        if key in cache and cache[key][1] is not None:
            return cache[key][1]
        ei = np.asarray(self.edge_index)
        fill = self.block_pair_fill(R, S, ET)
        if fill >= fill_threshold:
            from gammagl_tpu.ops.pallas import build_block_pair_plan
            plan = build_block_pair_plan(ei[0], ei[1], self.num_nodes,
                                         R=R, S=S, ET=ET)
            cache[key] = (fill, plan)
            return plan
        # dense-pair fraction (pairs holding >= 0.75*ET real edges)
        pair = ((ei[1] // R).astype(np.int64)
                * (1 + self.num_nodes // S) + ei[0] // S)
        _, inverse, counts = np.unique(pair, return_inverse=True,
                                       return_counts=True)
        dense_frac = float((counts[inverse] >= (3 * ET) // 4).mean())
        if dense_frac >= hybrid_threshold:
            from gammagl_tpu.ops.pallas import build_hybrid_plan
            plan = build_hybrid_plan(ei[0], ei[1], self.num_nodes,
                                     R=R, S=S, ET=ET)
            cache[key] = (fill, plan)
            return plan
        plan = self.csr_plan()
        cache[key] = (fill, plan)
        return plan

    def csc_plan(self, R=256, ET=None, num_src_blocks=None):
        """Transposed layout (src-major) -- the backward-pass graph."""
        if self._csc_plan is None:
            from gammagl_tpu.ops.pallas import build_csr_plan_blocked
            nb = (num_src_blocks if num_src_blocks is not None
                  else self._auto_src_blocks())
            et = ET if ET is not None else (256 if nb > 1 else 512)
            ei = np.asarray(self.edge_index)
            object.__setattr__(self, "_csc_plan", build_csr_plan_blocked(
                ei[1], ei[0], self.num_nodes, R=R, ET=et,
                num_src_blocks=nb))
        return self._csc_plan

    # -- conversion (reference graph.py:616,649) ----------------------------
    def tensor(self):
        """Move array attrs onto device (jnp)."""
        g = self.clone()
        for k, v in g.items():
            if _is_array(v):
                g[k] = jnp.asarray(v)
        return g

    def numpy(self):
        g = self.clone()
        for k, v in g.items():
            if _is_array(v):
                g[k] = np.asarray(v)
        return g

    def clone(self):
        g = self.__class__()
        g._store = dict(self._store)
        object.__setattr__(g, "_num_nodes", self._num_nodes)
        return g

    def copy(self):
        return self.clone()

    def deepcopy(self):
        g = self.__class__()
        g._store = _copy.deepcopy(self._store)
        object.__setattr__(g, "_num_nodes", self._num_nodes)
        return g

    def to_heterogeneous(self, node_type=None, edge_type=None,
                         node_type_names=None, edge_type_names=None):
        """Reference: gammagl/data/graph.py:683."""
        from gammagl_tpu.data.heterograph import HeteroGraph
        ei = np.asarray(self.edge_index)
        node_type = np.zeros(self.num_nodes, np.int64) if node_type is None \
            else np.asarray(node_type)
        edge_type = np.zeros(self.num_edges, np.int64) if edge_type is None \
            else np.asarray(edge_type)
        ntypes = node_type_names or [str(i) for i in
                                     range(int(node_type.max()) + 1)]
        out = HeteroGraph()
        local = np.zeros(self.num_nodes, np.int64)
        for i, nt in enumerate(ntypes):
            mask = node_type == i
            local[mask] = np.arange(mask.sum())
            if "x" in self:
                out[nt].x = np.asarray(self.x)[mask]
            out[nt].num_nodes = int(mask.sum())
        n_et = int(edge_type.max()) + 1 if len(edge_type) else 0
        for j in range(n_et):
            mask = edge_type == j
            sub = ei[:, mask]
            st = ntypes[int(node_type[sub[0, 0]])] if sub.size else ntypes[0]
            dt = ntypes[int(node_type[sub[1, 0]])] if sub.size else ntypes[0]
            name = (edge_type_names[j] if edge_type_names
                    else (st, f"e{j}", dt))
            out[name].edge_index = local[sub]
        return out

    def dump(self, path):
        """Pickle to disk (reference graph.py:886)."""
        import pickle
        with open(path, "wb") as f:
            pickle.dump(self.numpy(), f)

    @staticmethod
    def load(path):
        import pickle
        with open(path, "rb") as f:
            return pickle.load(f)

    def __repr__(self):
        fields = []
        for k, v in self._store.items():
            if _is_array(v):
                fields.append(f"{k}={list(v.shape)}")
            else:
                fields.append(f"{k}={v}")
        return f"{self.__class__.__name__}({', '.join(fields)})"


def _graph_flatten(g: Graph):
    keys = sorted(g._store.keys())
    children = [g._store[k] for k in keys]
    aux = (tuple(keys), g._num_nodes)
    return children, aux


def _graph_unflatten(aux, children):
    keys, num_nodes = aux
    g = Graph(num_nodes=num_nodes)
    g._store = dict(zip(keys, children))
    return g


jax.tree_util.register_pytree_node(Graph, _graph_flatten, _graph_unflatten)
