"""Real citation-graph adjacency structure for benches and partition
studies.

The reference repo bundles real Cora/Citeseer/PubMed CSR adjacencies
in-tree (reference examples/citgnn/datasets/{cora,citeseer,pubmed}_add_
{0.5,0.75}.npz: 2708/3327/19717-node scipy CSR, edges perturbed by +50%/
+75% random additions, no features). Uniform-random synthetic graphs
flatten degree skew and gather locality, so kernel/halo/sampler numbers
on them flatter the implementation; these loaders give real power-law
structure offline. Synthetic power-law fallback when no copy exists.
"""

import os
import os.path as osp

import numpy as np

__all__ = ["load_real_structure", "real_structure_available"]

_SIZES = {"cora": 2708, "citeseer": 3327, "pubmed": 19717}

_SEARCH_PATHS = (
    os.environ.get("GGL_TPU_REFDATA", ""),
    osp.join(osp.dirname(__file__), "..", "..", "data", "citgnn"),
    "/root/reference/examples/citgnn/datasets",
)


def _find(name, perturbation):
    fname = f"{name}_add_{perturbation}.npz"
    for base in _SEARCH_PATHS:
        if base and osp.exists(osp.join(base, fname)):
            return osp.join(base, fname)
    return None


def real_structure_available(name="cora", perturbation="0.5"):
    return _find(name, perturbation) is not None


def load_real_structure(name="cora", perturbation="0.5", seed=0):
    """Return ``(edge_index (2, E) int64, num_nodes, is_real)``.

    ``is_real`` is False when no bundled copy was found and a synthetic
    power-law graph of the same node count stands in.
    """
    assert name in _SIZES, name
    path = _find(name, perturbation)
    if path is not None:
        with np.load(path, allow_pickle=True) as f:
            import scipy.sparse as sp
            adj = sp.csr_matrix(
                (f["data"], f["indices"], f["indptr"]),
                tuple(f["shape"])).tocoo()
        ei = np.stack([adj.row, adj.col]).astype(np.int64)
        return ei, int(adj.shape[0]), True
    # fallback: zipf-ish synthetic at the same scale
    n = _SIZES[name]
    e = 7 * n
    rng = np.random.default_rng(seed)
    dst = (n * (rng.random(e) ** 1.7)).astype(np.int64)
    src = rng.integers(0, n, e)
    return np.stack([src, dst]), n, False
