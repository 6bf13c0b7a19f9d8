"""Native sampling core: lazy g++ build + ctypes bindings.

Plays the role of the reference's compiled `_sparse` extension
(gammagl/ops/sparse/cpu/sparse_module.cpp:8-19) but binds via ctypes (the
image has no pybind11). The shared object is built once per machine into
the package directory and cached; every entry point has a numpy fallback in
`gammagl_tpu.sampler`, so a missing compiler only costs speed.
"""

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

__all__ = ["get_lib", "available", "neighbor_sample_c",
           "neighbor_sample_many_c", "random_walk_c",
           "saint_subgraph_c", "ind2ptr_c", "ptr2ind_c",
           "hetero_neighbor_sample_c"]

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, "sampler.cpp")
_LIB_PATH = osp.join(_HERE, "_sampler.so")
_lock = threading.Lock()
_lib = None
_build_failed = False

_I64 = ctypes.POINTER(ctypes.c_int64)


def _build():
    cmd = ["g++", "-O3", "-std=c++17", "-fopenmp", "-shared",
           "-fPIC", "-o", _LIB_PATH, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def _declare(lib):
    lib.ind2ptr.argtypes = [_I64, ctypes.c_int64, ctypes.c_int64, _I64]
    lib.ptr2ind.argtypes = [_I64, ctypes.c_int64, _I64]
    lib.neighbor_sample.restype = ctypes.c_int
    lib.neighbor_sample.argtypes = [
        _I64, _I64, _I64, _I64, ctypes.c_int64, _I64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_uint64, ctypes.c_int64, ctypes.c_int64,
        _I64, _I64, _I64, _I64, _I64, _I64, _I64, _I64]
    lib.neighbor_sample_many.argtypes = [
        _I64, _I64, _I64, _I64, _I64, ctypes.c_int64, _I64,
        ctypes.c_int64, ctypes.c_int, ctypes.c_uint64, ctypes.c_int64,
        ctypes.c_int64, _I64, _I64, _I64, _I64, _I64, _I64, _I64, _I64,
        _I64]
    lib.random_walk.argtypes = [_I64, _I64, _I64, ctypes.c_int64,
                                ctypes.c_int64, ctypes.c_uint64, _I64]
    lib.saint_subgraph.restype = ctypes.c_int64
    lib.saint_subgraph.argtypes = [_I64, _I64, _I64, _I64, ctypes.c_int64,
                                   _I64, _I64, _I64, ctypes.c_int64]
    lib.hetero_neighbor_sample.restype = ctypes.c_int
    lib.hetero_neighbor_sample.argtypes = [
        ctypes.c_int64, ctypes.c_int64, _I64, _I64, _I64, _I64, _I64,
        _I64, _I64, _I64, ctypes.c_int64, _I64, _I64, ctypes.c_int64,
        ctypes.c_uint64, ctypes.c_int64, ctypes.c_int64,
        _I64, _I64, _I64, _I64, _I64, _I64]


def get_lib():
    """Build (once) and return the ctypes library, or None if unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not osp.exists(_LIB_PATH) or (
                    os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            _declare(lib)
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def available():
    return get_lib() is not None


def _p(arr):
    return arr.ctypes.data_as(_I64)


def _as_i64(x):
    return np.ascontiguousarray(np.asarray(x), dtype=np.int64)


def ind2ptr_c(ind, n):
    lib = get_lib()
    ind = _as_i64(ind)
    out = np.empty(n + 1, np.int64)
    lib.ind2ptr(_p(ind), len(ind), n, _p(out))
    return out


def ptr2ind_c(ptr):
    lib = get_lib()
    ptr = _as_i64(ptr)
    out = np.empty(int(ptr[-1]), np.int64)
    lib.ptr2ind(_p(ptr), len(ptr) - 1, _p(out))
    return out


def _caps(seeds, fanouts, colptr, n_edges):
    """Tight hop-sum output bounds. The old bounds (node_cap * max_fanout,
    or the full edge count) over-allocated ~20x at Reddit scale — the
    allocation + page faulting dominated the sample call itself.

    Duplicate seeds occupy duplicate node slots AND duplicate hop-0
    frontier entries (sampler.cpp keeps them), so the full-neighborhood
    bound for hop 0 is n_edges + dups * max_degree, not n_edges; later
    hops' frontiers are hash-deduped, where n_edges is exact."""
    num_seeds = len(seeds)
    n_nodes = len(colptr) - 1
    frontier = num_seeds
    ncap = frontier
    ecap = 0
    dup0 = None  # computed lazily: only full-neighborhood hop 0 needs it
    for h, f in enumerate(fanouts):
        f = int(f)
        if f < 0:
            e_h = int(n_edges)
            if h == 0:
                if dup0 is None:
                    dup0 = num_seeds - len(np.unique(seeds))
                if dup0:
                    max_deg = int(np.max(colptr[1:] - colptr[:-1],
                                         initial=0))
                    e_h += dup0 * max_deg
        else:
            e_h = frontier * f
        ecap += e_h
        frontier = min(e_h, n_nodes)
        ncap += frontier
    return (min(max(ncap, num_seeds + 1), n_nodes + num_seeds),
            max(ecap, 1))


def neighbor_sample_c(colptr, row, edge_perm, seeds, fanouts, replace,
                      rng_seed, node_cap=None, edge_cap=None):
    """Returns (nodes, rows, cols, edges, hop_nodes, hop_edges)."""
    lib = get_lib()
    colptr, row = _as_i64(colptr), _as_i64(row)
    edge_perm = _as_i64(edge_perm)
    seeds, fanouts = _as_i64(seeds), _as_i64(fanouts)
    ncap_auto, ecap_auto = _caps(seeds, fanouts, colptr, len(row))
    if node_cap is None:
        node_cap = ncap_auto
    if edge_cap is None:
        edge_cap = ecap_auto
    nodes = np.empty(node_cap, np.int64)
    rows = np.empty(edge_cap, np.int64)
    cols = np.empty(edge_cap, np.int64)
    edges = np.empty(edge_cap, np.int64)
    n_nodes = np.zeros(1, np.int64)
    n_edges = np.zeros(1, np.int64)
    hop_nodes = np.zeros(len(fanouts) + 1, np.int64)
    hop_edges = np.zeros(len(fanouts), np.int64)
    rc = lib.neighbor_sample(
        _p(colptr), _p(row), _p(edge_perm), _p(seeds), len(seeds),
        _p(fanouts), len(fanouts), int(replace), rng_seed,
        node_cap, edge_cap, _p(nodes), _p(rows), _p(cols), _p(edges),
        _p(n_nodes), _p(n_edges), _p(hop_nodes), _p(hop_edges))
    if rc != 0:
        raise RuntimeError("neighbor_sample capacity exceeded")
    nn, ne = int(n_nodes[0]), int(n_edges[0])
    return (nodes[:nn], rows[:ne], cols[:ne], edges[:ne],
            hop_nodes.tolist(), hop_edges.tolist())


def neighbor_sample_many_c(colptr, row, edge_perm, seed_batches, fanouts,
                           replace, rng_seed):
    """Batch-parallel sampling: `seed_batches` is a list of seed arrays.
    Returns a list of (nodes, rows, cols, edges, hop_nodes, hop_edges)
    tuples — one per batch, sampled concurrently with OpenMP threads."""
    lib = get_lib()
    colptr, row = _as_i64(colptr), _as_i64(row)
    edge_perm = _as_i64(edge_perm)
    fanouts = _as_i64(fanouts)
    B = len(seed_batches)
    seeds = _as_i64(np.concatenate([np.asarray(b) for b in seed_batches]))
    seeds_ptr = _as_i64(np.cumsum([0] + [len(b) for b in seed_batches]))
    per_batch = [_caps(np.asarray(b), fanouts, colptr, len(row))
                 for b in seed_batches]
    node_cap = max(c[0] for c in per_batch)
    edge_cap = max(c[1] for c in per_batch)
    H = len(fanouts)
    nodes = np.empty(B * node_cap, np.int64)
    rows = np.empty(B * edge_cap, np.int64)
    cols = np.empty(B * edge_cap, np.int64)
    edges = np.empty(B * edge_cap, np.int64)
    n_nodes = np.zeros(B, np.int64)
    n_edges = np.zeros(B, np.int64)
    hop_nodes = np.zeros(B * (H + 1), np.int64)
    hop_edges = np.zeros(B * H, np.int64)
    status = np.zeros(B, np.int64)
    lib.neighbor_sample_many(
        _p(colptr), _p(row), _p(edge_perm), _p(seeds), _p(seeds_ptr), B,
        _p(fanouts), H, int(replace), rng_seed, node_cap, edge_cap,
        _p(nodes), _p(rows), _p(cols), _p(edges), _p(n_nodes),
        _p(n_edges), _p(hop_nodes), _p(hop_edges), _p(status))
    if (status != 0).any():
        raise RuntimeError("neighbor_sample_many capacity exceeded")
    out = []
    for b in range(B):
        nn, ne = int(n_nodes[b]), int(n_edges[b])
        out.append((nodes[b * node_cap:b * node_cap + nn],
                    rows[b * edge_cap:b * edge_cap + ne],
                    cols[b * edge_cap:b * edge_cap + ne],
                    edges[b * edge_cap:b * edge_cap + ne],
                    hop_nodes[b * (H + 1):(b + 1) * (H + 1)].tolist(),
                    hop_edges[b * H:(b + 1) * H].tolist()))
    return out


def random_walk_c(rowptr, col, starts, walk_length, rng_seed):
    lib = get_lib()
    rowptr, col, starts = _as_i64(rowptr), _as_i64(col), _as_i64(starts)
    out = np.empty((len(starts), walk_length + 1), np.int64)
    lib.random_walk(_p(rowptr), _p(col), _p(starts), len(starts),
                    walk_length, rng_seed, _p(out))
    return out


def saint_subgraph_c(rowptr, col, edge_perm, nodes):
    lib = get_lib()
    rowptr, col = _as_i64(rowptr), _as_i64(col)
    edge_perm, nodes = _as_i64(edge_perm), _as_i64(nodes)
    cap = len(col)
    rows = np.empty(cap, np.int64)
    cols = np.empty(cap, np.int64)
    edges = np.empty(cap, np.int64)
    ne = lib.saint_subgraph(_p(rowptr), _p(col), _p(edge_perm), _p(nodes),
                            len(nodes), _p(rows), _p(cols), _p(edges), cap)
    if ne < 0:
        raise RuntimeError("saint_subgraph capacity exceeded")
    return rows[:ne], cols[:ne], edges[:ne]


def hetero_neighbor_sample_c(csc_per_etype, et_src, et_dst, fanouts,
                             seed_nodes, seed_types, num_ntypes,
                             rng_seed, node_cap, edge_cap):
    """csc_per_etype: list of (colptr, row, eperm) per edge type;
    fanouts: (num_hops, num_etypes). Returns (nodes (T, cap), node_counts,
    rows/cols/edges (E_t, cap), edge_counts)."""
    lib = get_lib()
    num_etypes = len(csc_per_etype)
    colptr_cat = _as_i64(np.concatenate(
        [c[0] for c in csc_per_etype]))
    colptr_off = _as_i64(np.concatenate(
        [[0], np.cumsum([len(c[0]) for c in csc_per_etype])]))
    row_cat = _as_i64(np.concatenate([c[1] for c in csc_per_etype]))
    eperm_cat = _as_i64(np.concatenate([c[2] for c in csc_per_etype]))
    row_off = _as_i64(np.concatenate(
        [[0], np.cumsum([len(c[1]) for c in csc_per_etype])]))
    fanouts = _as_i64(fanouts)
    num_hops = fanouts.shape[0]
    seed_nodes = _as_i64(seed_nodes)
    seed_types = _as_i64(seed_types)
    nodes = np.empty((num_ntypes, node_cap), np.int64)
    node_counts = np.zeros(num_ntypes, np.int64)
    rows = np.empty((num_etypes, edge_cap), np.int64)
    cols = np.empty((num_etypes, edge_cap), np.int64)
    edges = np.empty((num_etypes, edge_cap), np.int64)
    edge_counts = np.zeros(num_etypes, np.int64)
    rc = lib.hetero_neighbor_sample(
        num_ntypes, num_etypes, _p(_as_i64(et_src)), _p(_as_i64(et_dst)),
        _p(colptr_cat), _p(colptr_off), _p(row_cat), _p(eperm_cat),
        _p(row_off), _p(fanouts.reshape(-1)), num_hops,
        _p(seed_nodes), _p(seed_types), len(seed_nodes),
        rng_seed, node_cap, edge_cap,
        _p(nodes), _p(node_counts), _p(rows), _p(cols), _p(edges),
        _p(edge_counts))
    if rc != 0:
        raise RuntimeError("hetero_neighbor_sample capacity exceeded")
    return nodes, node_counts, rows, cols, edges, edge_counts
