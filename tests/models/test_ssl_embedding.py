"""SSL / embedding / autoencoder / Graphormer model tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from gammagl_tpu.datasets import synthetic_community_graph
from gammagl_tpu.models import (
    DGIModel, GraceModel, MVGRLModel, InfoGraph, GGDModel, GAEModel,
    VGAEModel, DeepWalk, Node2Vec, MetaPath2Vec, GraphormerModel,
    corrupt_features, drop_edge_and_feature, recon_loss,
    inner_product_decoder)
from gammagl_tpu.utils import (add_self_loops, negative_sampling,
                               shortest_path, degree)


def _graph(n=40):
    g = synthetic_community_graph(n, 2, 8, seed=0)
    ei, _ = add_self_loops(np.asarray(g.edge_index), num_nodes=n)
    return jnp.asarray(g.x), jnp.asarray(ei), g


def test_dgi_learns():
    x, ei, _ = _graph()
    model = DGIModel(hidden_dim=16)
    key = jax.random.PRNGKey(0)
    xc = corrupt_features(key, x)
    params = model.init(key, x, ei, xc)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, xc):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply(p, x, ei, xc))(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    l0 = None
    for i in range(20):
        xc = corrupt_features(jax.random.PRNGKey(i), x)
        params, opt_state, loss = step(params, opt_state, xc)
        l0 = float(loss) if l0 is None else l0
    assert float(loss) < l0
    emb = model.apply(params, x, ei)
    assert emb.shape == (40, 16)


def test_grace():
    x, ei, _ = _graph()
    model = GraceModel(hidden_dim=16, proj_dim=16, tau=0.5)
    k = jax.random.PRNGKey(0)
    x1, w1 = drop_edge_and_feature(k, x, ei, 0.2, 0.2)
    x2, w2 = drop_edge_and_feature(jax.random.PRNGKey(1), x, ei, 0.2, 0.2)
    params = model.init(k, x1, ei, w1, x2, ei, w2)
    loss = model.apply(params, x1, ei, w1, x2, ei, w2)
    assert np.isfinite(float(loss))
    z = model.apply(params, x, ei, None)
    assert z.shape == (40, 16)


def test_mvgrl_and_ggd():
    x, ei, _ = _graph()
    k = jax.random.PRNGKey(0)
    xc = corrupt_features(k, x)
    diff_w = jnp.ones(ei.shape[1]) / 4.0
    m = MVGRLModel(hidden_dim=16)
    params = m.init(k, x, ei, ei, diff_w, xc)
    assert np.isfinite(float(m.apply(params, x, ei, ei, diff_w, xc)))

    g = GGDModel(hidden_dim=16)
    params = g.init(k, x, ei, xc)
    assert np.isfinite(float(g.apply(params, x, ei, xc)))


def test_infograph():
    x, ei, _ = _graph(20)
    batch = jnp.asarray(np.repeat([0, 1], 10))
    m = InfoGraph(hidden_dim=8, num_layers=2)
    params = m.init(jax.random.PRNGKey(0), x, ei, batch, 2)
    loss, h_graph = m.apply(params, x, ei, batch, 2)
    assert np.isfinite(float(loss))
    assert h_graph.shape == (2, 16)


def test_gae_vgae_link_pred():
    x, ei, g = _graph()
    neg = jnp.asarray(negative_sampling(np.asarray(g.edge_index),
                                        num_nodes=40, num_neg_samples=50,
                                        rng=np.random.default_rng(0)))
    m = GAEModel(hidden_dim=16, latent_dim=8)
    params = m.init(jax.random.PRNGKey(0), x, ei)
    z = m.apply(params, x, ei)
    assert z.shape == (40, 8)
    loss = recon_loss(z, ei, neg)
    assert np.isfinite(float(loss))

    vm = VGAEModel(hidden_dim=16, latent_dim=8)
    params = vm.init(jax.random.PRNGKey(0), x, ei)
    mu, logstd, z = vm.apply(params, x, ei, rng=jax.random.PRNGKey(2))
    assert np.isfinite(float(VGAEModel.kl_loss(mu, logstd)))
    probs = inner_product_decoder(z, ei)
    assert ((probs >= 0) & (probs <= 1)).all()


def test_node2vec_deepwalk():
    _, _, g = _graph()
    ei = np.asarray(g.edge_index)
    model = Node2Vec(num_nodes=40, embedding_dim=8, walk_length=5,
                     context_size=3)
    loader = model.make_loader(ei, batch_size=16, seed=0)
    pos, neg = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(pos),
                        jnp.asarray(neg))
    loss = model.apply(params, jnp.asarray(pos), jnp.asarray(neg))
    assert np.isfinite(float(loss))
    emb = model.apply(params)
    assert emb.shape == (40, 8)
    assert isinstance(DeepWalk(num_nodes=40), Node2Vec)


def test_metapath2vec():
    ei_dict = {
        ("a", "ab", "b"): np.array([[0, 1, 2], [0, 1, 1]]),
        ("b", "ba", "a"): np.array([[0, 1, 1], [1, 2, 0]]),
    }
    model = MetaPath2Vec(num_nodes_dict={"a": 3, "b": 2},
                         metapath=(("a", "ab", "b"), ("b", "ba", "a")),
                         embedding_dim=8, walk_length=4, context_size=3)
    walks = model.sample_walks(ei_dict, [0, 1, 2],
                               rng=np.random.default_rng(0))
    assert walks.shape == (3, 5)
    assert walks.max() < 5  # global id space
    neg = np.random.default_rng(0).integers(0, 5, (3, 1, 5))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(walks),
                        jnp.asarray(neg))
    loss = model.apply(params, jnp.asarray(walks), jnp.asarray(neg))
    assert np.isfinite(float(loss))
    emb_a = model.apply(params, method=lambda m: m.embed("a"))
    assert emb_a.shape == (3, 8)


def test_graphormer():
    x, ei, g = _graph(16)
    ei_np = np.asarray(g.edge_index)
    dist = shortest_path(ei_np, 16, max_dist=5)
    ind = degree(jnp.asarray(ei_np[1]), 16).astype(jnp.int32)
    outd = degree(jnp.asarray(ei_np[0]), 16).astype(jnp.int32)
    m = GraphormerModel(hidden_dim=16, num_class=2, num_layers=2,
                        num_heads=2, dropout_rate=0.0)
    params = m.init(jax.random.PRNGKey(0), x, ind, outd, jnp.asarray(dist))
    out = m.apply(params, x, ind, outd, jnp.asarray(dist))
    assert out.shape == (2,)
    assert np.isfinite(np.asarray(out)).all()
