"""Wave-7 models: DHN, HEAT, CoED, NodeID VQ, GNRF, GRACE-POT/Spco."""

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.layers.conv import CoEDConv, DHNConv, HEATConv
from gammagl_tpu.models import (CoEDModel, DHNModel, GNRFModel,
                                GracePOTModel, GraceSpcoModel, HEATModel,
                                NodeIDModel, ResidualVectorQuant,
                                VectorQuantize, grace_pot_bounds,
                                odeint_rk4)


def _graph(n=10, e=40, seed=0):
    rng = np.random.default_rng(seed)
    ei = jnp.asarray(np.stack([rng.integers(0, n, e),
                               rng.integers(0, n, e)]))
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    return x, ei


def test_dhn_link_prediction():
    K, F, B = 3, 6, 4
    rng = np.random.default_rng(0)
    width = F + K * F + K * K * F
    n1 = jnp.asarray(rng.normal(size=(B, width)).astype(np.float32))
    n2 = jnp.asarray(rng.normal(size=(B, width)).astype(np.float32))
    m = DHNModel(num_fea=F, num_neighbor=K, hidden=16)
    p = m.init(jax.random.PRNGKey(0), n1, n2)
    out = m.apply(p, n1, n2)
    assert out.shape == (B, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_dhn_conv_shape():
    K, F, B = 2, 5, 3
    rng = np.random.default_rng(1)
    fea = jnp.asarray(rng.normal(
        size=(B, F + K * F + K * K * F)).astype(np.float32))
    conv = DHNConv(num_fea=F, num_neighbor=K, hidden=12)
    p = conv.init(jax.random.PRNGKey(0), fea)
    assert conv.apply(p, fea).shape == (B, 12)


def test_heat_conv_aggregates_over_outgoing_edges():
    x, ei = _graph()
    rng = np.random.default_rng(2)
    e = ei.shape[1]
    attr = jnp.asarray(rng.normal(size=(e, 5)).astype(np.float32))
    etype = jax.nn.one_hot(jnp.asarray(rng.integers(0, 4, e)), 4)
    conv = HEATConv(node_emb_size=8, edge_attr_emb_size=8,
                    edge_type_emb_size=8, out_channels=6, heads=2)
    p = conv.init(jax.random.PRNGKey(0), x, ei, attr, etype)
    out = conv.apply(p, x, ei, attr, etype)
    assert out.shape == (10, 12)
    out_mean = HEATConv(node_emb_size=8, edge_attr_emb_size=8,
                        edge_type_emb_size=8, out_channels=6, heads=2,
                        concat=False)
    p2 = out_mean.init(jax.random.PRNGKey(0), x, ei, attr, etype)
    assert out_mean.apply(p2, x, ei, attr, etype).shape == (10, 6)


def test_heat_model_trajectory_shape():
    rng = np.random.default_rng(3)
    n, e, hist = 7, 20, 5
    x = jnp.asarray(rng.normal(size=(n, hist, 4)).astype(np.float32))
    ei = jnp.asarray(np.stack([rng.integers(0, n, e),
                               rng.integers(0, n, e)]))
    attr = jnp.asarray(rng.normal(size=(e, 5)).astype(np.float32))
    etype = jax.nn.one_hot(jnp.asarray(rng.integers(0, 4, e)), 4)
    m = HEATModel(in_channels_node=16, out_channels=24, out_length=6,
                  node_emb_size=8, edge_attr_emb_size=8,
                  edge_type_emb_size=8, heads=2)
    p = m.init(jax.random.PRNGKey(0), x, ei, attr, etype)
    assert m.apply(p, x, ei, attr, etype).shape == (n, 12)


def test_coed_conv_directional():
    x, ei = _graph()
    conv = CoEDConv(out_channels=6, self_feature_transform=True)
    p = conv.init(jax.random.PRNGKey(0), x, ei)
    fwd, rev, self_b = conv.apply(p, x, ei)
    assert fwd.shape == rev.shape == self_b.shape == (10, 6)
    # a node with no in-edges gets zero forward aggregation
    src = np.array([0, 1]); dst = np.array([2, 2])
    ei2 = jnp.asarray(np.stack([src, dst]))
    x2 = jnp.asarray(np.random.default_rng(0).normal(
        size=(3, 8)).astype(np.float32))
    conv2 = CoEDConv(out_channels=4, self_feature_transform=False,
                     add_bias=False)
    p2 = conv2.init(jax.random.PRNGKey(0), x2, ei2)
    fwd2, rev2 = conv2.apply(p2, x2, ei2)
    np.testing.assert_allclose(np.asarray(fwd2[0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rev2[2]), 0.0, atol=1e-6)


def test_coed_model_trains():
    x, ei = _graph()
    m = CoEDModel(num_class=3, hidden_dim=8, alpha=0.3,
                  jumping_knowledge="cat")
    p = m.init(jax.random.PRNGKey(0), x, ei)
    logits = m.apply(p, x, ei)
    assert logits.shape == (10, 3)
    g = jax.grad(lambda p: (m.apply(p, x, ei) ** 2).sum())(p)
    norms = [float(jnp.abs(l).sum())
             for l in jax.tree_util.tree_leaves(g)]
    assert max(norms) > 0


def test_vector_quantize_ema_updates():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))
    vq = VectorQuantize(dim=8, codebook_size=4)
    variables = vq.init(jax.random.PRNGKey(0), x)
    (q, ind, loss), new_state = vq.apply(variables, x, True,
                                         mutable=["vq_stats"])
    assert q.shape == x.shape and ind.shape == (32,)
    assert float(loss) >= 0
    # EMA stats moved
    before = variables["vq_stats"]["cluster_size"]
    after = new_state["vq_stats"]["cluster_size"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # straight-through: gradient flows to the input
    def f(x):
        q, _, _ = vq.apply(variables, x, True, mutable=["vq_stats"])[0]
        return (q ** 2).sum()
    g = jax.grad(f)(x)
    assert float(jnp.abs(g).sum()) > 0


def test_residual_vq_reconstructs_better_with_depth():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(64, 6)).astype(np.float32))
    errs = []
    for layers in (1, 3):
        rvq = ResidualVectorQuant(dim=6, codebook_size=32,
                                  num_res_layers=layers)
        variables = rvq.init(jax.random.PRNGKey(0), x)
        out, inds, _ = rvq.apply(variables, x)
        assert len(inds) == layers
        errs.append(float(((out - x) ** 2).mean()))
    assert errs[1] <= errs[0] + 1e-6


def test_nodeid_model_outputs():
    x, ei = _graph(n=12, e=50)
    m = NodeIDModel(in_channels=8, hidden_channels=6, out_channels=3,
                    local_layers=2, heads=2, num_codes=8)
    variables = m.init(jax.random.PRNGKey(0), x, ei)
    logits, commit, ids, gnn_id = m.apply(variables, x, ei)
    assert logits.shape == (12, 3)
    assert ids.shape == (12, 2 * 3)  # layers x residual depth
    assert gnn_id.shape == (12, 6)
    assert float(commit) >= 0


def test_odeint_rk4_exponential():
    # dy/dt = -y  =>  y(1) = e^-1 y(0)
    y0 = jnp.ones((4,))
    y1 = odeint_rk4(lambda t, y: -y, y0, 0.0, 1.0, num_steps=16)
    np.testing.assert_allclose(np.asarray(y1), np.exp(-1.0), rtol=1e-5)


def test_gnrf_model_learns():
    x, ei = _graph()
    for edgenet in (True, False):
        m = GNRFModel(num_class=2, hidden=8, edgenet=edgenet, num_steps=4)
        p = m.init(jax.random.PRNGKey(0), x, ei)
        logits = m.apply(p, x, ei)
        assert logits.shape == (10, 2)
        g = jax.grad(lambda p: (m.apply(p, x, ei) ** 2).sum())(p)
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(g))


def test_gnrf_damping_unit_sphere():
    x, ei = _graph()
    m = GNRFModel(num_class=2, hidden=8, damping=True, num_steps=4)
    p = m.init(jax.random.PRNGKey(0), x, ei)
    assert np.isfinite(np.asarray(m.apply(p, x, ei))).all()


def test_grace_pot_loss_and_bounds():
    x, ei = _graph(n=8, e=24)
    A_upper, A_lower = grace_pot_bounds(np.asarray(ei), 8)
    assert A_upper.shape == (8, 8)
    assert (A_upper >= 0).all() and (A_lower >= 0).all()
    m = GracePOTModel(num_hidden=6, num_proj_hidden=8)
    p = m.init(jax.random.PRNGKey(0), x, ei, None, x, ei, None,
               method="loss")
    z = m.apply(p, x, ei)
    assert z.shape == (8, 6)
    loss = m.apply(p, x, ei, None, x, ei, None, method="loss")
    assert np.isfinite(float(loss))
    # POT score on the full node set with dense bound matrices
    A_add = jnp.asarray((A_upper + A_lower) / 2)
    A_sub = jnp.asarray((A_upper - A_lower) / 2)
    XW = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, 6)).astype(np.float32))
    HW = jnp.asarray(np.random.default_rng(1).normal(
        size=(8, 6)).astype(np.float32))
    score = GracePOTModel.pot_score(z, A_add, A_sub, XW, HW)
    assert score.shape == (8,)
    pot = GracePOTModel.pot_loss(score)
    assert np.isfinite(float(pot)) and float(pot) > 0


def test_grace_spco_weighted_views():
    x, ei = _graph()
    w1 = jnp.ones(ei.shape[1])
    w2 = jnp.asarray(np.random.default_rng(0).uniform(
        size=ei.shape[1]).astype(np.float32))
    m = GraceSpcoModel(num_hidden=6, num_proj_hidden=8)
    p = m.init(jax.random.PRNGKey(0), x, ei, w1, x, ei, w2)
    z = m.apply(p, x, ei, w1)
    assert z.shape == (10, 6)
    loss = m.apply(p, x, ei, w1, x, ei, w2)
    assert np.isfinite(float(loss))
