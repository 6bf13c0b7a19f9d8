import numpy as np


def test_balance_permutation_equalizes_edges():
    from gammagl_tpu.parallel import balance_permutation
    from gammagl_tpu.parallel.halo import build_halo_partition
    rng = np.random.default_rng(0)
    n, e, p = 1000, 20000, 4
    # power-law dst: natural block partition is heavily imbalanced
    dst = (n * (rng.random(e) ** 2.0)).astype(np.int64)
    src = rng.integers(0, n, e)
    ei = np.stack([src, dst])
    perm, inv = balance_permutation(ei, n, p)
    # perm/inv are inverse dense relabelings
    assert np.array_equal(np.sort(inv), np.arange(n))
    assert np.array_equal(inv[perm], np.arange(n))
    part_nat = build_halo_partition(ei, n, p, balance=False)
    part_bal = build_halo_partition(inv[ei], n, p, balance=False)
    assert part_bal.edge_index.shape[2] < 0.7 * part_nat.edge_index.shape[2]
    # aggregation result is the original up to the permutation
    x = rng.normal(size=(n, 3)).astype(np.float32)
    ref = np.zeros((n, 3), np.float32)
    np.add.at(ref, ei[1], x[ei[0]])
    ref2 = np.zeros((n, 3), np.float32)
    ei2 = inv[ei]
    xb = x[perm]
    np.add.at(ref2, ei2[1], xb[ei2[0]])
    np.testing.assert_allclose(ref2, ref[perm], rtol=1e-5)


def test_balance_permutation_tiny_graph_identity():
    from gammagl_tpu.parallel import balance_permutation
    ei = np.asarray([[0, 1], [1, 2]])
    perm, inv = balance_permutation(ei, 3, 8)
    assert np.array_equal(perm, np.arange(3))
