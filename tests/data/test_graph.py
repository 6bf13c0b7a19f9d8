"""Graph / batching behavior (reference: tests/data/test_graph.py,
test_batch.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.data import Graph, BatchGraph, HeteroGraph, pad_graph


def _g(n=4, e=6, f=3, seed=0):
    rng = np.random.default_rng(seed)
    return Graph(
        x=rng.normal(size=(n, f)).astype(np.float32),
        edge_index=np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]),
        y=rng.integers(0, 2, n),
    )


def test_graph_basic():
    g = _g()
    assert g.num_nodes == 4
    assert g.num_edges == 6
    assert g.num_node_features == 3
    assert "x" in g
    g.foo = np.ones(4)
    assert "foo" in g.keys()


def test_graph_is_pytree():
    g = _g().tensor()
    leaves = jax.tree_util.tree_leaves(g)
    assert len(leaves) == 3  # x, edge_index, y
    g2 = jax.tree_util.tree_map(lambda a: a, g)
    assert isinstance(g2, Graph)
    np.testing.assert_array_equal(np.asarray(g2.x), np.asarray(g.x))

    @jax.jit
    def deg_sum(graph):
        return jnp.sum(graph.x)

    assert np.isfinite(float(deg_sum(g)))


def test_add_self_loop():
    g = _g()
    g2 = g.add_self_loop()
    assert g2.num_edges == g.num_edges + g.num_nodes
    tail = np.asarray(g2.edge_index)[:, -g.num_nodes:]
    np.testing.assert_array_equal(tail[0], tail[1])


def test_batch_roundtrip():
    gs = [_g(n, 2 * n, 3, seed=n) for n in (3, 5, 4)]
    batch = BatchGraph.from_data_list(gs)
    assert batch.num_nodes == 12
    assert batch.num_graphs == 3
    np.testing.assert_array_equal(np.asarray(batch.ptr), [0, 3, 8, 12])
    np.testing.assert_array_equal(
        np.asarray(batch.batch), [0] * 3 + [1] * 5 + [2] * 4)
    # edge offsets
    assert np.asarray(batch.edge_index)[:, 6:16].min() >= 3
    back = batch.to_data_list()
    for g, g2 in zip(gs, back):
        np.testing.assert_allclose(np.asarray(g.x), np.asarray(g2.x))
        np.testing.assert_array_equal(np.asarray(g.edge_index),
                                      np.asarray(g2.edge_index))


def test_pad_graph():
    g = _g(n=5, e=7)
    p = pad_graph(g, num_nodes=8, num_edges=16)
    assert p.x.shape[0] == 8
    assert p.edge_index.shape[1] == 16
    assert p.node_mask.sum() == 5
    assert p.edge_mask.sum() == 7
    # padded edges point at the OOB node id
    assert (np.asarray(p.edge_index)[:, 7:] == 8).all()


def test_hetero_graph():
    hg = HeteroGraph()
    hg["paper"].x = np.ones((4, 3), np.float32)
    hg["author"].x = np.ones((2, 5), np.float32)
    hg[("author", "writes", "paper")].edge_index = np.array(
        [[0, 1], [2, 3]])
    assert hg.node_types == ["paper", "author"]
    assert ("author", "writes", "paper") in hg.edge_types
    assert hg.num_nodes == 6
    assert hg.num_edges == 2
    homo = hg.to_homogeneous()
    assert homo.num_nodes == 6
    np.testing.assert_array_equal(np.asarray(homo.node_type),
                                  [0, 0, 0, 0, 1, 1])
    # x_dict accessor
    assert set(hg.x_dict.keys()) == {"paper", "author"}


def test_hetero_pytree():
    hg = HeteroGraph()
    hg["a"].x = jnp.ones((3, 2))
    hg[("a", "to", "a")].edge_index = jnp.zeros((2, 4), jnp.int32)
    out = jax.tree_util.tree_map(lambda v: v, hg)
    assert isinstance(out, HeteroGraph)
    assert out["a"].x.shape == (3, 2)


def test_to_heterogeneous():
    g = _g(n=6, e=10)
    node_type = np.array([0, 0, 0, 1, 1, 1])
    hg = g.to_heterogeneous(node_type=node_type,
                            node_type_names=["u", "v"])
    assert hg["u"].num_nodes == 3
