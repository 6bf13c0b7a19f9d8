

def test_sample_from_nodes_many_matches_shapes():
    import numpy as np
    from gammagl_tpu.sampler.neighbor_sampler import NeighborSampler
    rng = np.random.default_rng(0)
    n, e = 200, 1200
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    s = NeighborSampler(ei, n, [4, 2], seed=0)
    batches = [rng.integers(0, n, 16) for _ in range(6)]
    outs = s.sample_from_nodes_many(batches)
    assert len(outs) == 6
    for b, out in zip(batches, outs):
        assert out.batch_size == 16
        # seeds lead the node list
        np.testing.assert_array_equal(out.node[:16], b)
        assert out.row.shape == out.col.shape == out.edge.shape
        assert (out.row < len(out.node)).all()
        # edges reference original edge ids
        assert (out.edge < e).all()


def test_node_loader_presample_chunks():
    import numpy as np
    from gammagl_tpu.data.graph import Graph
    from gammagl_tpu.loader import NodeNeighborLoader
    rng = np.random.default_rng(1)
    g = Graph(num_nodes=100)
    g.edge_index = np.stack([rng.integers(0, 100, 600),
                             rng.integers(0, 100, 600)])
    g.x = rng.normal(size=(100, 4)).astype(np.float32)
    a = list(NodeNeighborLoader(g, [3, 2], batch_size=10, shuffle=False,
                                seed=0))
    b = list(NodeNeighborLoader(g, [3, 2], batch_size=10, shuffle=False,
                                seed=0, presample_chunks=4))
    assert len(a) == len(b) == 10
    for ga, gb in zip(a, b):
        assert ga.batch_size == gb.batch_size
        np.testing.assert_array_equal(ga.n_id[:10], gb.n_id[:10])
