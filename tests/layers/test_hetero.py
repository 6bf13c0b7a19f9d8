"""Heterogeneous convs and models on a tiny typed graph."""

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.layers.conv import (RGCNConv, HeteroConv, HANConv, HGTConv,
                                     SimpleHGNConv, GCNConv, SAGEConv)
from gammagl_tpu.models import (RGCNModel, HANModel, HGTModel,
                                SimpleHGNModel)


def _typed_graph():
    # 2 node types: paper(4), author(3); 2 edge types
    x_dict = {
        "paper": jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3)),
        "author": jnp.asarray(np.ones((3, 5), np.float32)),
    }
    ei_dict = {
        ("author", "writes", "paper"): jnp.asarray(
            np.array([[0, 1, 2, 0], [0, 1, 2, 3]])),
        ("paper", "cites", "paper"): jnp.asarray(
            np.array([[0, 1, 2], [1, 2, 3]])),
    }
    metadata = (["paper", "author"], list(ei_dict.keys()))
    return x_dict, ei_dict, metadata


def test_rgcn_conv():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 4)),
                    jnp.float32)
    ei = jnp.asarray(np.array([[0, 1, 2, 3], [1, 2, 3, 4]]))
    et = jnp.asarray(np.array([0, 1, 0, 1]))
    for kwargs in ({}, {"num_bases": 2}, {"num_blocks": 2}):
        conv = RGCNConv(in_channels=4, out_channels=6, num_relations=2,
                        **kwargs)
        params = conv.init(jax.random.PRNGKey(0), x, ei, et)
        out = conv.apply(params, x, ei, et)
        assert out.shape == (5, 6)
        assert np.isfinite(np.asarray(out)).all()


def test_rgcn_relation_separation():
    """Edges of relation 0 must only use weight[0]."""
    x = jnp.eye(3)
    ei = jnp.asarray(np.array([[0, 1], [2, 2]]))
    et = jnp.asarray(np.array([0, 1]))
    conv = RGCNConv(in_channels=3, out_channels=2, num_relations=2,
                    root_weight=False, add_bias=False)
    params = conv.init(jax.random.PRNGKey(0), x, ei, et)
    w = np.asarray(params["params"]["weight"])  # (2, 3, 2)
    out = np.asarray(conv.apply(params, x, ei, et))
    expect2 = w[0][0] + w[1][1]  # x0 under rel0 + x1 under rel1
    np.testing.assert_allclose(out[2], expect2, rtol=1e-5)


def test_hetero_conv_wrapper():
    x_dict, ei_dict, metadata = _typed_graph()
    conv = HeteroConv(convs={
        ("author", "writes", "paper"): SAGEConv(out_channels=8),
        ("paper", "cites", "paper"): GCNConv(out_channels=8),
    })
    params = conv.init(jax.random.PRNGKey(0), x_dict, ei_dict)
    out = conv.apply(params, x_dict, ei_dict)
    assert set(out.keys()) == {"paper"}
    assert out["paper"].shape == (4, 8)


def test_han_conv():
    x_dict, ei_dict, metadata = _typed_graph()
    conv = HANConv(out_channels=4, metadata=metadata, heads=2)
    params = conv.init(jax.random.PRNGKey(0), x_dict, ei_dict)
    out = conv.apply(params, x_dict, ei_dict)
    assert out["paper"].shape == (4, 8)  # heads * out


def test_hgt_conv():
    x_dict, ei_dict, metadata = _typed_graph()
    conv = HGTConv(out_channels=8, metadata=metadata, heads=2)
    params = conv.init(jax.random.PRNGKey(0), x_dict, ei_dict)
    out = conv.apply(params, x_dict, ei_dict)
    assert out["paper"].shape == (4, 8)
    assert np.isfinite(np.asarray(out["paper"])).all()


def test_simplehgn_conv():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(6, 4)),
                    jnp.float32)
    ei = jnp.asarray(np.array([[0, 1, 2, 3], [1, 2, 3, 0]]))
    et = jnp.asarray(np.array([0, 1, 0, 1]))
    conv = SimpleHGNConv(out_channels=5, num_etypes=2, heads=2)
    params = conv.init(jax.random.PRNGKey(0), x, ei, et)
    out, alpha = conv.apply(params, x, ei, et)
    assert out.shape == (6, 10)
    assert alpha.shape == (4, 2)


def test_hetero_models_learn():
    import optax
    x_dict, ei_dict, metadata = _typed_graph()
    y = jnp.asarray(np.array([0, 1, 0, 1]))

    for model in [
        HANModel(metadata=metadata, hidden_channels=4, num_class=2,
                 target_ntype="paper", heads=2, drop_rate=0.0),
        HGTModel(metadata=metadata, hidden_channels=8, num_class=2,
                 target_ntype="paper", heads=2),
    ]:
        params = model.init(jax.random.PRNGKey(0), x_dict, ei_dict)
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                logits = model.apply(p, x_dict, ei_dict)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        l0 = None
        for _ in range(15):
            params, opt_state, loss = step(params, opt_state)
            l0 = float(loss) if l0 is None else l0
        assert float(loss) < l0


def test_rgcn_simplehgn_models():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(6, 4)),
                    jnp.float32)
    ei = jnp.asarray(np.array([[0, 1, 2, 3], [1, 2, 3, 0]]))
    et = jnp.asarray(np.array([0, 1, 0, 1]))
    m = RGCNModel(in_channels=4, hidden_channels=8, num_class=3,
                  num_relations=2, num_bases=2)
    params = m.init(jax.random.PRNGKey(0), x, ei, et)
    assert m.apply(params, x, ei, et).shape == (6, 3)

    m2 = SimpleHGNModel(num_etypes=2, hidden_channels=4, num_class=3,
                        heads=2, drop_rate=0.0)
    params = m2.init(jax.random.PRNGKey(0), x, ei, et)
    assert m2.apply(params, x, ei, et).shape == (6, 3)


def test_hgt_conv_plan_dict_matches_coo():
    """Fused per-relation flash path == decomposed XLA path (dropout off)."""
    from gammagl_tpu.data import HeteroGraph

    x_dict, ei_dict, metadata = _typed_graph()
    g = HeteroGraph()
    for nt, x in x_dict.items():
        g[nt].x = x
    for et, ei in ei_dict.items():
        g[et].edge_index = ei
    plans = g.csr_plans(R=8, ET=8)
    assert set(plans) == set(ei_dict)

    conv = HGTConv(out_channels=8, metadata=metadata, heads=2,
                   dropout_rate=0.0)
    params = conv.init(jax.random.PRNGKey(0), x_dict, ei_dict)
    ref = conv.apply(params, x_dict, ei_dict)
    out = conv.apply(params, x_dict, ei_dict, plan_dict=plans)
    assert set(out) == set(ref)
    for nt in ref:
        np.testing.assert_allclose(np.asarray(out[nt]),
                                   np.asarray(ref[nt]),
                                   rtol=1e-4, atol=1e-5)


def test_han_conv_plan_dict_matches_coo():
    from gammagl_tpu.data import HeteroGraph

    x_dict, ei_dict, metadata = _typed_graph()
    # HAN runs GAT per metapath on the SOURCE features; restrict to the
    # same-type metapath (paper cites paper) like real metapath usage
    ei_dict = {("paper", "cites", "paper"): ei_dict[("paper", "cites",
                                                     "paper")]}
    metadata = (["paper"], list(ei_dict.keys()))
    x_dict = {"paper": x_dict["paper"]}
    g = HeteroGraph()
    g["paper"].x = x_dict["paper"]
    for et, ei in ei_dict.items():
        g[et].edge_index = ei
    plans = g.csr_plans(R=8, ET=8)

    conv = HANConv(out_channels=8, metadata=metadata, heads=2,
                   dropout_rate=0.0)
    params = conv.init(jax.random.PRNGKey(0), x_dict, ei_dict)
    ref = conv.apply(params, x_dict, ei_dict)
    out = conv.apply(params, x_dict, ei_dict, plan_dict=plans)
    for nt in ref:
        np.testing.assert_allclose(np.asarray(out[nt]),
                                   np.asarray(ref[nt]),
                                   rtol=1e-4, atol=1e-5)


def test_hgt_conv_plan_dropout_trains():
    from gammagl_tpu.data import HeteroGraph

    x_dict, ei_dict, metadata = _typed_graph()
    g = HeteroGraph()
    for nt, x in x_dict.items():
        g[nt].x = x
    for et, ei in ei_dict.items():
        g[et].edge_index = ei
    plans = g.csr_plans(R=8, ET=8)
    conv = HGTConv(out_channels=8, metadata=metadata, heads=2,
                   dropout_rate=0.5)
    params = conv.init(jax.random.PRNGKey(0), x_dict, ei_dict)

    def loss(p):
        out = conv.apply(p, x_dict, ei_dict, train=True, plan_dict=plans,
                         rngs={"dropout": jax.random.PRNGKey(1)})
        return sum((v ** 2).sum() for v in out.values())

    grads = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_rgcn_conv_plan_matches_coo():
    from gammagl_tpu.ops.pallas import build_csr_plan

    rng = np.random.default_rng(43)
    n, e, R = 18, 70, 3
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    et = jnp.asarray(rng.integers(0, R, e))
    ei = jnp.asarray(np.stack([src, dst]))
    x = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    plan = build_csr_plan(src, dst, n, R=8, ET=16)

    for kwargs in ({}, {"num_bases": 2}):
        conv = RGCNConv(in_channels=5, out_channels=6, num_relations=R,
                        **kwargs)
        params = conv.init(jax.random.PRNGKey(0), x, ei, et)
        ref = conv.apply(params, x, ei, et)
        out = conv.apply(params, x, ei, et, plan=plan)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

        # gradients must also agree (kernel segment reduce VJP)
        g1 = jax.grad(lambda p: (conv.apply(p, x, ei, et,
                                            plan=plan) ** 2).sum())(params)
        g2 = jax.grad(lambda p: (conv.apply(p, x, ei,
                                            et) ** 2).sum())(params)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4)


def test_simplehgn_conv_plan_matches_coo():
    from gammagl_tpu.ops.pallas import build_csr_plan

    rng = np.random.default_rng(47)
    n, e, T = 16, 60, 4
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    et = jnp.asarray(rng.integers(0, T, e))
    ei = jnp.asarray(np.stack([src, dst]))
    x = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    plan = build_csr_plan(src, dst, n, R=8, ET=16)

    conv = SimpleHGNConv(out_channels=6, num_etypes=T, heads=2,
                         dropout_rate=0.0)
    params = conv.init(jax.random.PRNGKey(0), x, ei, et)
    ref, alpha_ref = conv.apply(params, x, ei, et)
    out, alpha = conv.apply(params, x, ei, et, plan=plan)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # plan-order alpha at valid lanes == COO alpha permuted by plan.perm
    perm_ok = plan.perm[plan.valid]
    np.testing.assert_allclose(np.asarray(alpha)[plan.valid],
                               np.asarray(alpha_ref)[perm_ok],
                               rtol=1e-4, atol=1e-5)

    # two-layer stacking (alpha_prev round trip in plan order)
    from gammagl_tpu.models import SimpleHGNModel
    m = SimpleHGNModel(num_etypes=T, hidden_channels=6, num_class=3,
                       heads=2, drop_rate=0.0)
    mp = m.init(jax.random.PRNGKey(0), x, ei, et)
    r1 = m.apply(mp, x, ei, et)
    r2 = m.apply(mp, x, ei, et, plan=plan)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1),
                               rtol=1e-4, atol=1e-5)
