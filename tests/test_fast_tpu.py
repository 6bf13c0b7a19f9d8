"""Fast gate tier (`python -m pytest -m fast tests/ --tpu`): a minimal
end-to-end drill that finishes in under a minute on the real chip
(2 jit compiles). The full suite stays on the 8-device CPU mesh
(tests/conftest.py); this subset is what the driver can run against TPU
hardware every round.

Covers the load-bearing path: XLA SpMM vs Pallas CSR-plan SpMM agreement
(fwd + grad) and one GCN train step that reduces the loss.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.fast


def _graph(n=256, e=2048, f=32, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    return src, dst, w, x


def test_spmm_paths_agree():
    from gammagl_tpu.ops import spmm
    from gammagl_tpu.ops.pallas import build_csr_plan, spmm_csr

    n, f = 256, 32
    src, dst, w, x = _graph(n=n, f=f)
    ei = jnp.asarray(np.stack([src, dst]).astype(np.int32))
    wj, xj = jnp.asarray(w), jnp.asarray(x)
    plan = build_csr_plan(src, dst, n)

    def loss_xla(x):
        return (spmm(ei, wj, x, num_nodes=n) ** 2).sum()

    def loss_plan(x):
        return (spmm_csr(x, wj, plan) ** 2).sum()

    v1, g1 = jax.jit(jax.value_and_grad(loss_xla))(xj)
    v2, g2 = jax.jit(jax.value_and_grad(loss_plan))(xj)
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-3, atol=2e-3)


def test_gcn_step_learns():
    import optax
    from gammagl_tpu.models import GCNModel
    from gammagl_tpu.train import TrainState, semi_supervised_loss

    rng = np.random.default_rng(0)
    n, f, c = 200, 16, 3
    y = rng.integers(0, c, n)
    x = rng.normal(size=(n, f)).astype(np.float32)
    x[np.arange(n), y] += 2.0
    same = (rng.integers(0, n, 800) // c) * c + y[rng.integers(0, n, 800)]
    ei = np.stack([same % n, rng.integers(0, n, 800)])
    xj, eij = jnp.asarray(x), jnp.asarray(ei)
    yj = jnp.asarray(y)
    mask = jnp.asarray(np.ones(n, bool))

    model = GCNModel(hidden_dim=8, num_class=c, drop_rate=0.0)
    params = model.init(jax.random.PRNGKey(0), xj, eij)
    state = TrainState.create(params=params, tx=optax.adam(0.05))

    @jax.jit
    def steps(state, x, ei, y, mask):
        def body(state, _):
            loss, grads = jax.value_and_grad(
                lambda p: semi_supervised_loss(model.apply(p, x, ei), y,
                                               mask))(state.params)
            return state.apply_gradients(grads), loss
        return jax.lax.scan(body, state, None, length=40)

    state, losses = steps(state, xj, eij, yj, mask)
    losses = np.asarray(losses)
    assert losses[-1] < losses[0] * 0.8, losses
