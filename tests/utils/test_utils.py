"""Utility behavior (reference: tests/utils/ -- coalesce, loop, softmax,
subgraph, ...)."""

import numpy as np
import jax.numpy as jnp

from gammagl_tpu.utils import (
    degree, add_self_loops, remove_self_loops, calc_gcn_norm, mask_to_index,
    index_to_mask, coalesce, sort_edge_index, to_undirected, is_undirected,
    subgraph, k_hop_subgraph, to_dense_adj, to_dense_batch,
    negative_sampling, homophily, get_laplacian, get_train_val_test_split)


def test_degree():
    idx = jnp.array([0, 1, 1, 3])
    np.testing.assert_allclose(np.asarray(degree(idx, 4)), [1, 2, 0, 1])


def test_self_loops():
    ei = np.array([[0, 1], [1, 2]])
    out, _ = add_self_loops(ei, num_nodes=3)
    assert out.shape == (2, 5)
    back, _ = remove_self_loops(out)
    np.testing.assert_array_equal(back, ei)


def test_calc_gcn_norm():
    ei = np.array([[0, 1, 0, 1, 2], [1, 0, 0, 1, 2]])  # incl self loops
    w = np.asarray(calc_gcn_norm(jnp.asarray(ei), 3))
    # node 2: only self loop, deg 1 -> weight 1
    np.testing.assert_allclose(w[-1], 1.0)
    assert (w > 0).all()


def test_mask_index_roundtrip():
    mask = np.array([True, False, True, False])
    idx = mask_to_index(mask)
    np.testing.assert_array_equal(idx, [0, 2])
    np.testing.assert_array_equal(np.asarray(index_to_mask(idx, 4)), mask)


def test_coalesce():
    ei = np.array([[1, 0, 1, 1], [0, 1, 0, 2]])
    w = np.array([1.0, 2.0, 3.0, 4.0])
    out, red = coalesce(ei, w, reduce="sum")
    assert out.shape[1] == 3
    # (1,0) appears twice with weights 1+3
    i = [tuple(c) for c in out.T.tolist()].index((1, 0))
    assert red[i] == 4.0


def test_sort_edge_index():
    ei = np.array([[2, 0, 1], [0, 1, 1]])
    out = sort_edge_index(ei)
    assert (np.diff(out[0] * 3 + out[1]) > 0).all()


def test_to_undirected():
    ei = np.array([[0, 1], [1, 2]])
    out = to_undirected(ei)
    assert is_undirected(out)
    assert out.shape[1] == 4


def test_subgraph():
    ei = np.array([[0, 1, 2, 3], [1, 2, 3, 0]])
    out, _, mask = subgraph([0, 1, 2], ei, relabel_nodes=True)
    assert mask.sum() == 2  # 0->1, 1->2
    assert out.max() <= 2


def test_k_hop_subgraph():
    # path graph 0-1-2-3 (directed toward higher)
    ei = np.array([[0, 1, 2], [1, 2, 3]])
    subset, out, mapping, emask = k_hop_subgraph([3], 2, ei,
                                                 relabel_nodes=True,
                                                 num_nodes=4)
    assert set(subset.tolist()) == {1, 2, 3}
    assert emask.sum() == 2


def test_to_dense_adj_batch():
    ei = np.array([[0, 1, 2], [1, 0, 2]])
    batch = np.array([0, 0, 1])
    adj = np.asarray(to_dense_adj(jnp.asarray(ei), jnp.asarray(batch)))
    assert adj.shape == (2, 2, 2)
    assert adj[0, 0, 1] == 1 and adj[1, 0, 0] == 1
    x = jnp.arange(6, dtype=jnp.float32).reshape(3, 2)
    dense, mask = to_dense_batch(x, jnp.asarray(batch))
    assert dense.shape == (2, 2, 2)
    assert bool(mask[1, 1]) is False


def test_negative_sampling():
    ei = np.array([[0, 1, 2], [1, 2, 0]])
    neg = negative_sampling(ei, num_nodes=10, num_neg_samples=5,
                            rng=np.random.default_rng(0))
    assert neg.shape == (2, 5)
    pos = set(zip(ei[0], ei[1]))
    for s, d in zip(neg[0], neg[1]):
        assert (s, d) not in pos and s != d


def test_homophily_and_laplacian():
    ei = np.array([[0, 1, 2], [1, 0, 0]])
    y = np.array([0, 0, 1])
    assert abs(homophily(ei, y) - 2 / 3) < 1e-6
    lei, lw = get_laplacian(jnp.asarray(ei), 3, normalization="sym")
    assert lei.shape[1] == 6


def test_split():
    tr, va, te = get_train_val_test_split(100, train_per_class=5,
                                          labels=np.arange(100) % 4)
    assert tr.sum() == 20
    assert not (tr & va).any() and not (tr & te).any()
