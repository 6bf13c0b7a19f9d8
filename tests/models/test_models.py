"""Model-level smoke + learning tests on a synthetic 2-community graph."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from gammagl_tpu.models import (
    GCNModel, GATModel, GATV2Model, GraphSAGEModel, SGCModel, APPNPModel,
    GCNIIModel, JKNet, MLP, ChebNetModel, MixHopModel, GPRGNNModel,
    FAGCNModel, GINModel)
from gammagl_tpu.utils import add_self_loops


def _community_graph(seed=0, n=60, f=8, c=2):
    rng = np.random.default_rng(seed)
    y = (np.arange(n) >= n // 2).astype(np.int32)
    edges = []
    for _ in range(n * 6):
        a = rng.integers(0, n)
        same = rng.random() < 0.9
        b = rng.integers(0, n // 2) + (n // 2) * (y[a] if same else 1 - y[a])
        edges.append((a, b))
        edges.append((b, a))
    ei = np.array(edges).T
    ei, _ = add_self_loops(ei, num_nodes=n)
    x = rng.normal(size=(n, f)).astype(np.float32) + y[:, None] * 0.3
    return jnp.asarray(x), jnp.asarray(ei), jnp.asarray(y)


MODELS = [
    GCNModel(hidden_dim=16, num_class=2),
    GATModel(hidden_dim=8, num_class=2, heads=2, drop_rate=0.0),
    GATV2Model(hidden_dim=8, num_class=2, heads=2, drop_rate=0.0),
    GraphSAGEModel(hidden_dim=16, num_class=2),
    SGCModel(num_class=2),
    APPNPModel(hidden_dim=16, num_class=2, itera_k=4),
    JKNet(hidden_dim=16, num_class=2, num_layers=3),
    ChebNetModel(hidden_dim=16, num_class=2, K=2),
    MixHopModel(hidden_dim=12, num_class=2),
    GPRGNNModel(hidden_dim=16, num_class=2, K=4),
    FAGCNModel(hidden_dim=16, num_class=2),
    GCNIIModel(hidden_dim=16, num_class=2, num_layers=4),
]


@pytest.mark.parametrize("model", MODELS,
                         ids=[type(m).__name__ for m in MODELS])
def test_model_forward_and_learn(model):
    x, ei, y = _community_graph()
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, x, ei)
    out = model.apply(params, x, ei)
    assert out.shape == (x.shape[0], 2)
    assert np.isfinite(np.asarray(out)).all()

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, x, ei, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(1)})
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    l0 = None
    for i in range(30):
        params, opt_state, loss = step(params, opt_state)
        if l0 is None:
            l0 = float(loss)
    assert float(loss) < l0, f"loss did not decrease: {l0} -> {float(loss)}"


def test_mlp():
    x = jnp.ones((5, 8))
    model = MLP(hidden_dim=(16,), num_class=3)
    params = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(params, x).shape == (5, 3)


def test_gin_graph_classification():
    x, ei, y = _community_graph(n=20)
    batch = jnp.asarray(np.repeat([0, 1], 10))
    model = GINModel(hidden_dim=16, num_class=2, num_layers=2, drop_rate=0.0)
    params = model.init(jax.random.PRNGKey(0), x, ei, batch, 2)
    out = model.apply(params, x, ei, batch, 2)
    assert out.shape == (2, 2)


def test_gcn_bf16_compute_dtype():
    """dtype=bf16 keeps params f32, runs features bf16, stays close to
    the f32 forward and still trains."""
    x, ei, y = _community_graph()
    m32 = GCNModel(hidden_dim=16, num_class=2, drop_rate=0.0)
    mbf = GCNModel(hidden_dim=16, num_class=2, drop_rate=0.0,
                   dtype=jnp.bfloat16)
    params = m32.init(jax.random.PRNGKey(0), x, ei)
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32  # params stay f32 in both

    out32 = m32.apply(params, x, ei)
    outbf = mbf.apply(params, x.astype(jnp.bfloat16), ei)
    # (the final f32 bias add promotes logits back to f32 — desirable)
    np.testing.assert_allclose(np.asarray(outbf, np.float32),
                               np.asarray(out32), rtol=0.1, atol=0.15)

    opt = optax.adam(1e-2)
    st = opt.init(params)

    @jax.jit
    def step(params, st):
        def loss_fn(p):
            logits = mbf.apply(p, x.astype(jnp.bfloat16), ei)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, st = opt.update(grads, st)
        return optax.apply_updates(params, up), st, loss

    l0 = None
    for _ in range(25):
        params, st, loss = step(params, st)
        if l0 is None:
            l0 = float(loss)
    assert float(loss) < l0
