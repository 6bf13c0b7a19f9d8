"""Verify recipe: 2-community SBM GCN through the public API, both paths."""
import numpy as np
import jax, jax.numpy as jnp
import optax

from gammagl_tpu.data import Graph
from gammagl_tpu.layers.conv import GCNConv
from gammagl_tpu.models import GCNModel
from gammagl_tpu.utils import calc_gcn_norm, add_self_loops

rng = np.random.default_rng(0)
n_per, n = 100, 200
# 2-community SBM
blocks = []
for a in range(2):
    for b in range(2):
        p = 0.10 if a == b else 0.01
        mask = rng.random((n_per, n_per)) < p
        r, c = np.nonzero(mask)
        blocks.append(np.stack([r + a * n_per, c + b * n_per]))
ei = np.concatenate(blocks, axis=1).astype(np.int32)
ei, _ = add_self_loops(jnp.asarray(ei), num_nodes=n)
x = rng.normal(size=(n, 16)).astype(np.float32)
y = np.repeat(np.arange(2), n_per).astype(np.int32)
train_mask = rng.random(n) < 0.3
test_mask = ~train_mask

g = Graph(x=jnp.asarray(x), edge_index=ei, num_nodes=n)
plan = g.csr_plan()

model = GCNModel(hidden_dim=16, num_class=2)


def train(plan_arg):
    params = model.init(jax.random.PRNGKey(0), g.x, g.edge_index)
    opt = optax.adam(1e-2)
    st = opt.init(params)
    tm = jnp.asarray(train_mask)

    @jax.jit
    def step(params, st):
        def loss_fn(p):
            logits = model.apply(p, g.x, g.edge_index, plan=plan_arg)
            ls = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.asarray(y))
            return jnp.where(tm, ls, 0).sum() / tm.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, st = opt.update(grads, st)
        return optax.apply_updates(params, up), st, loss

    first = None
    for i in range(60):
        params, st, loss = step(params, st)
        if first is None:
            first = float(loss)
    logits = model.apply(params, g.x, g.edge_index, plan=plan_arg)
    pred = np.asarray(jnp.argmax(logits, -1))
    acc = float((pred[test_mask] == y[test_mask]).mean())
    return first, float(loss), acc


for name, pa in (("xla", None), ("pallas", plan)):
    f, l, acc = train(pa)
    print(f"{name}: loss {f:.4f} -> {l:.4f}, test acc {acc:.4f}")
    assert l < f and acc > 0.9, f"{name} FAILED"

# probe: isolated rows must be exactly zero through the plan path
from gammagl_tpu.ops.pallas import build_csr_plan, spmm_csr
src = np.array([0, 1, 2]); dst = np.array([1, 2, 0])
p2 = build_csr_plan(src, dst, 10)
out = spmm_csr(jnp.asarray(rng.normal(size=(10, 8)), jnp.float32),
               jnp.ones(3, jnp.float32), p2)
assert np.all(np.asarray(out)[3:] == 0.0), "isolated rows nonzero"
print("isolated-row probe OK")
print("VERIFY SURFACE OK")
