"""Native C++ sampling core vs numpy fallback (structural equivalence)."""

import numpy as np
import pytest

from gammagl_tpu import csrc
from gammagl_tpu.datasets import synthetic_community_graph
from gammagl_tpu.sampler import NeighborSampler
from gammagl_tpu.ops.sparse import ind2ptr_np

pytestmark = pytest.mark.skipif(not csrc.available(),
                                reason="native lib unavailable")


def test_ind2ptr_ptr2ind_roundtrip():
    ind = np.array([0, 0, 1, 3, 3, 3])
    ptr = csrc.ind2ptr_c(ind, 5)
    np.testing.assert_array_equal(ptr, [0, 2, 3, 3, 6, 6])
    np.testing.assert_array_equal(csrc.ptr2ind_c(ptr), ind)


def test_neighbor_sample_matches_numpy_structure():
    g = synthetic_community_graph(80, 2, 4, avg_degree=8, seed=0)
    ei = np.asarray(g.edge_index)
    s_ext = NeighborSampler(ei, g.num_nodes, [4, 3], seed=0, use_ext=True)
    s_np = NeighborSampler(ei, g.num_nodes, [4, 3], seed=0, use_ext=False)
    assert s_ext._ext is not None
    assert s_np._ext is None
    for sampler in (s_ext, s_np):
        out = sampler.sample_from_nodes([0, 5, 7])
        assert (out.node[:3] == [0, 5, 7]).all()
        # all edges valid and map to real global edges
        for r, c, e in zip(out.row, out.col, out.edge):
            assert ei[0, e] == out.node[r]
            assert ei[1, e] == out.node[c]
        # fanout bound per seed in hop 1
        assert out.num_sampled_edges[0] <= 3 * 4


def test_neighbor_sample_full_neighborhood_identical():
    g = synthetic_community_graph(40, 2, 4, seed=1)
    ei = np.asarray(g.edge_index)
    s_ext = NeighborSampler(ei, g.num_nodes, [-1], seed=0, use_ext=True)
    s_np = NeighborSampler(ei, g.num_nodes, [-1], seed=0, use_ext=False)
    a = s_ext.sample_from_nodes([3])
    b = s_np.sample_from_nodes([3])
    # full neighborhood is deterministic: identical output
    np.testing.assert_array_equal(np.sort(a.edge), np.sort(b.edge))
    np.testing.assert_array_equal(np.sort(a.node), np.sort(b.node))


def test_random_walk_c():
    ei = np.array([[0, 1, 2, 3], [1, 2, 3, 0]])
    order = np.argsort(ei[0])
    rowptr = ind2ptr_np(ei[0][order], 4)
    walks = csrc.random_walk_c(rowptr, ei[1][order], [0, 2], 4, 42)
    np.testing.assert_array_equal(walks[0], [0, 1, 2, 3, 0])
    np.testing.assert_array_equal(walks[1], [2, 3, 0, 1, 2])


def test_saint_subgraph_c():
    ei = np.array([[0, 1, 2, 3, 0], [1, 2, 3, 0, 2]])
    order = np.argsort(ei[0], kind="stable")
    rowptr = ind2ptr_np(ei[0][order], 4)
    col = ei[1][order]
    rows, cols, edges = csrc.saint_subgraph_c(rowptr, col, order,
                                              np.array([0, 1, 2]))
    # edges inside {0,1,2}: (0,1), (1,2), (0,2)
    assert len(rows) == 3
    pairs = set(zip(rows.tolist(), cols.tolist()))
    assert pairs == {(0, 1), (1, 2), (0, 2)}


def test_hetero_neighbor_sample_c_structure():
    from gammagl_tpu.data import HeteroGraph
    from gammagl_tpu.loader import HeteroNeighborSampler
    rng = np.random.default_rng(0)
    hg = HeteroGraph()
    hg["p"].x = rng.normal(size=(30, 4)).astype(np.float32)
    hg["a"].x = rng.normal(size=(20, 4)).astype(np.float32)
    hg[("a", "w", "p")].edge_index = np.stack(
        [rng.integers(0, 20, 60), rng.integers(0, 30, 60)])
    hg[("p", "c", "p")].edge_index = np.stack(
        [rng.integers(0, 30, 50), rng.integers(0, 30, 50)])
    s_ext = HeteroNeighborSampler(hg, [3, 2], seed=0, use_ext=True)
    s_np = HeteroNeighborSampler(hg, [3, 2], seed=0, use_ext=False)
    assert s_ext._ext is not None and s_np._ext is None
    for s in (s_ext, s_np):
        node_d, row_d, col_d, eid_d, bs = s.sample_from_nodes(
            {"p": np.arange(5)})
        assert bs["p"] == 5
        assert (node_d["p"][:5] == np.arange(5)).all()
        for et in row_d:
            ei = np.asarray(hg[et].edge_index)
            src_t, _, dst_t = et
            for r, c, e in zip(row_d[et], col_d[et], eid_d[et]):
                assert ei[0, e] == node_d[src_t][r]
                assert ei[1, e] == node_d[dst_t][c]


def test_duplicate_seeds_full_neighborhood_caps():
    """Duplicate seeds occupy duplicate node slots and hop-0 frontier
    entries; the auto caps must still hold (code-review regression:
    the tight hop-sum bounds originally assumed distinct seeds)."""
    rng = np.random.default_rng(0)
    n, e = 200, 2000
    col = rng.integers(0, n, e)
    row = rng.integers(0, n, e)
    order = np.argsort(col, kind="stable")
    colptr = ind2ptr_np(col[order], n)
    row_s = row[order]
    perm = order.astype(np.int64)
    seeds = np.array([3, 3, 3, 7, 7, 11], np.int64)  # heavy duplication
    for fanouts in ([-1], [-1, -1], [-1, 5], [4, -1]):
        nodes, rows, cols, edges, hn, he = csrc.neighbor_sample_c(
            colptr, row_s, perm, seeds,
            np.asarray(fanouts, np.int64), False, 7)
        assert (nodes[:len(seeds)] == seeds).all()
        assert len(rows) == len(cols) == len(edges)
