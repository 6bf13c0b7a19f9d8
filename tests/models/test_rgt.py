"""RGT: manifold geometry, structure loader, and end-to-end training step.

Mirrors the reference's implicit contract (gammagl/models/rgt.py,
gammagl/loader/rgt_loader.py): loader batches carry tree/cycle/sequence
structure graphs; the model returns the (E,H,S) triple plus quantized
outputs and a finite self-supervised loss that differentiates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gammagl_tpu.data.graph import Graph
from gammagl_tpu.loader.rgt_loader import (ExtractNodeLoader,
                                           build_structure_batch)
from gammagl_tpu.models.rgt import RGTModel, rgt_cl_loss
from gammagl_tpu.utils.manifold_math import EuclideanM, LorentzM, SphereM


def _random_graph(n=40, e=120, f=16, seed=0):
    rng = np.random.default_rng(seed)
    g = Graph(num_nodes=n)
    g.edge_index = rng.integers(0, n, (2, e))
    g.x = rng.normal(size=(n, f)).astype(np.float32)
    return g


def test_lorentz_constraints():
    L = LorentzM()
    v = jnp.concatenate([jnp.zeros((6, 1)),
                         jax.random.normal(jax.random.PRNGKey(0), (6, 7))],
                        -1)
    x = L.expmap0(v)
    np.testing.assert_allclose(L.inner(None, x, keepdim=True), -1.0,
                               atol=1e-4)
    np.testing.assert_allclose(L.logmap0(x), v, atol=1e-4)
    # tangent projection is Lorentz-orthogonal to the base point
    u = L.proju(x, jax.random.normal(jax.random.PRNGKey(1), (6, 8)))
    np.testing.assert_allclose(L.inner(x, x, u, keepdim=True), 0.0, atol=1e-3)


def test_sphere_constraints():
    S = SphereM()
    u = S.proju0(0.3 * jax.random.normal(jax.random.PRNGKey(2), (6, 8)))
    y = S.expmap0(u)
    np.testing.assert_allclose(jnp.linalg.norm(y, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(S.logmap0(y), u, atol=1e-5)
    # pairwise_dist against elementwise dist
    d = S.pairwise_dist(y, y)
    np.testing.assert_allclose(jnp.diagonal(d), 0.0, atol=2e-3)


def test_frechet_mean_segments():
    E = EuclideanM()
    x = jnp.array([[1.0, 0.0], [3.0, 0.0], [0.0, 2.0]])
    idx = jnp.array([0, 0, 1])
    out = E.frechet_mean(x, idx, 2)
    np.testing.assert_allclose(out, [[2.0, 0.0], [0.0, 2.0]], atol=1e-6)


def test_build_structure_batch_shapes_and_padding():
    g = _random_graph()
    tree, cycle, seq = build_structure_batch(
        np.asarray(g.edge_index), g.num_nodes, batch_size=4,
        max_tree_edges=8, max_cycle_edges=3, max_seq_edges=4)
    assert tree.shape == (2, 4 * 16)
    assert cycle.shape == (2, 4 * 6)
    assert seq.shape == (2, 4 * 8)
    pad_id = 4 * g.num_nodes
    for buf in (tree, cycle, seq):
        valid = buf[buf < pad_id]
        assert np.all(buf <= pad_id)
        # every valid edge stays inside its seed's node block
        src, dst = buf[0], buf[1]
        m = src < pad_id
        assert np.array_equal(src[m] // g.num_nodes, dst[m] // g.num_nodes)
        assert valid.size > 0


def test_extract_node_loader_batches():
    g = _random_graph()
    loader = ExtractNodeLoader(g, num_neighbors=[4, 2], batch_size=4,
                               shuffle=False, max_tree_edges=8, seed=0)
    batches = list(loader)
    assert len(batches) == 10
    b = batches[0]
    assert b.num_seeds == 4
    assert b.tree_edge_index.shape[0] == 2
    assert b.x.shape[0] == b.num_nodes  # padded features
    # static shapes across batches (jit compiles once)
    assert all(x.num_nodes == b.num_nodes for x in batches)
    assert all(x.tree_edge_index.shape == b.tree_edge_index.shape
               for x in batches)
    # cache replay
    again = list(loader)
    np.testing.assert_array_equal(again[0].tree_edge_index,
                                  b.tree_edge_index)


def test_rgt_forward_and_loss_step():
    g = _random_graph(n=30, e=80, f=12, seed=3)
    loader = ExtractNodeLoader(g, num_neighbors=[3, 2], batch_size=4,
                               shuffle=False, max_tree_edges=6, seed=0)
    batch = next(iter(loader))
    model = RGTModel(in_dim=12, hidden_dim=32, embed_dim=16, n_layers=2,
                     codebook_size=16, codebook_dim=8, codebook_heads=2)
    tokens = jnp.asarray(batch.x)
    ei = jnp.asarray(batch.edge_index)
    args = (tokens, ei, jnp.asarray(batch.tree_edge_index),
            jnp.asarray(batch.cycle_edge_index),
            jnp.asarray(batch.seq_edge_index), batch.num_seeds)
    params = model.init(jax.random.PRNGKey(0), *args,
                        method=RGTModel.train_loss)
    out = model.apply(params, *args)
    n = tokens.shape[0]
    assert out["x_E"].shape == (n, 16)
    assert out["q_H"].shape == (n, 16)
    assert np.isfinite(float(out["commit_loss"]))
    # hyperboloid constraint holds for the H stream
    L = LorentzM()
    np.testing.assert_allclose(
        L.inner(None, out["x_H"], keepdim=True), -1.0, atol=1e-3)

    def loss_fn(p):
        loss, _ = model.apply(p, *args, method=RGTModel.train_loss)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(l)) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_rgt_cl_loss_prefers_aligned_views():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 6))
    y = jax.random.normal(jax.random.PRNGKey(1), (8, 6))
    aligned = rgt_cl_loss(x, x)
    misaligned = rgt_cl_loss(x, y)
    assert float(aligned) < float(misaligned)
