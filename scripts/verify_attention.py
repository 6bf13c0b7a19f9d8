"""TPU drill: GAT (fused dropout) + HGT (plan_dict) training on hardware."""
import numpy as np
import jax, jax.numpy as jnp
import optax

from gammagl_tpu.data import Graph, HeteroGraph
from gammagl_tpu.models import GATModel, HGTModel

rng = np.random.default_rng(0)
n_per, n = 100, 200
blocks = []
for a in range(2):
    for b in range(2):
        p = 0.10 if a == b else 0.01
        mask = rng.random((n_per, n_per)) < p
        r, c = np.nonzero(mask)
        blocks.append(np.stack([r + a * n_per, c + b * n_per]))
ei = np.concatenate(blocks, axis=1).astype(np.int32)
x = rng.normal(size=(n, 16)).astype(np.float32)
y = np.repeat(np.arange(2), n_per).astype(np.int32)
train_mask = rng.random(n) < 0.3

# the Graph stays NUMPY on host: csr_plan is host-side work, and
# fetching a lazily-placed device array back through the axon tunnel is
# minutes-slow (round-2 finding; csr_plan warns on device arrays now)
g = Graph(x=x, edge_index=ei, num_nodes=n)
plan = g.csr_plan(R=64, ET=64)

model = GATModel(hidden_dim=8, num_class=2, heads=4, drop_rate=0.4)
params = model.init({"params": jax.random.PRNGKey(0)}, g.x, g.edge_index)
opt = optax.adam(5e-3)
st = opt.init(params)
# closure constants MUST stay numpy: jit lowering embeds captured
# device arrays as MLIR constants by FETCHING them back through the
# tunnel (42s-to-minutes per compile; PERF_NOTES.md trap)
tm = train_mask

@jax.jit
def step(params, st, key):
    def loss_fn(p):
        logits = model.apply(p, g.x, g.edge_index, train=True, plan=plan,
                             rngs={"dropout": key})
        ls = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.asarray(y))
        return jnp.where(tm, ls, 0).sum() / tm.sum()
    loss, grads = jax.value_and_grad(loss_fn)(params)
    up, st = opt.update(grads, st)
    return optax.apply_updates(params, up), st, loss

key = jax.random.PRNGKey(1)
first = None
for i in range(60):
    key, k = jax.random.split(key)
    params, st, loss = step(params, st, k)
    if first is None:
        first = float(loss)
logits = model.apply(params, g.x, g.edge_index, plan=plan)
pred = np.asarray(jnp.argmax(logits, -1))
acc = float((pred[~train_mask] == y[~train_mask]).mean())
print(f"GAT fused-dropout: loss {first:.4f} -> {float(loss):.4f}, acc {acc:.4f}")
assert float(loss) < first and acc > 0.85

# --- HGT on a typed 2-community graph
hx = {"paper": x,
      "author": rng.normal(size=(80, 12)).astype(np.float32)}
writes = np.stack([rng.integers(0, 80, 400),
                   rng.integers(0, n, 400)]).astype(np.int32)
ei_dict = {("paper", "cites", "paper"): ei,
           ("author", "writes", "paper"): writes}
meta = (["paper", "author"], list(ei_dict.keys()))
# plan building is host-side: feed the NUMPY edges (see csr_plan note)
hg = HeteroGraph()
hg["paper"].x = x
hg["author"].x = np.zeros((80, 12), np.float32)
hg[("paper", "cites", "paper")].edge_index = ei
hg[("author", "writes", "paper")].edge_index = writes
plans = hg.csr_plans(R=64, ET=64)

hmodel = HGTModel(metadata=meta, hidden_channels=16, num_class=2,
                  target_ntype="paper", heads=4)
hparams = hmodel.init({"params": jax.random.PRNGKey(0)}, hx, ei_dict)
hopt = optax.adam(5e-3)
hst = hopt.init(hparams)

@jax.jit
def hstep(params, st, key):
    def loss_fn(p):
        logits = hmodel.apply(p, hx, ei_dict, train=True, plan_dict=plans,
                              rngs={"dropout": key})
        ls = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.asarray(y))
        return jnp.where(tm, ls, 0).sum() / tm.sum()
    loss, grads = jax.value_and_grad(loss_fn)(params)
    up, st = hopt.update(grads, st)
    return optax.apply_updates(params, up), st, loss

hfirst = None
for i in range(60):
    key, k = jax.random.split(key)
    hparams, hst, hloss = hstep(hparams, hst, k)
    if hfirst is None:
        hfirst = float(hloss)
logits = hmodel.apply(hparams, hx, ei_dict, plan_dict=plans)
logits_ref = hmodel.apply(hparams, hx, ei_dict)  # decomposed XLA path
err = float(jnp.abs(logits - logits_ref).max())
print(f"HGT plan_dict: loss {hfirst:.4f} -> {float(hloss):.4f}, "
      f"plan-vs-xla max err {err:.2e}")
assert float(hloss) < hfirst and err < 1e-2

# --- HGT PACKED path (round 5): bf16, D=64 -> the fused packed kernel
# (hgt_flash_packed) engages; must match the decomposed XLA path on
# hardware within bf16 tolerance, and its gradients must train.
from gammagl_tpu.layers.conv import HGTConv
import flax.linen as _nn


class _PackedHGT(_nn.Module):
    @_nn.compact
    def __call__(self, x_dict, ei_dict, train=False, plan_dict=None):
        h = {nt: _nn.Dense(256, name=f"proj__{nt}")(x)
             for nt, x in x_dict.items()}
        out = HGTConv(out_channels=256, metadata=meta, heads=4,
                      dropout_rate=0.0, dtype=jnp.bfloat16,
                      name="conv")(h, ei_dict, train=train,
                                   plan_dict=plan_dict)
        h = {**h, **out}
        return _nn.Dense(2, name="head")(h["paper"].astype(jnp.float32))


hmodel_p = _PackedHGT()
hp = hmodel_p.init({"params": jax.random.PRNGKey(1)}, hx, ei_dict)
opt_p = optax.adam(5e-3)
st_p = opt_p.init(hp)

@jax.jit
def pstep(params, st):
    def loss_fn(p):
        logits = hmodel_p.apply(p, hx, ei_dict, train=True,
                                plan_dict=plans)
        ls = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), jnp.asarray(y))
        return jnp.where(tm, ls, 0).sum() / tm.sum()
    loss, grads = jax.value_and_grad(loss_fn)(params)
    up, st = opt_p.update(grads, st)
    return optax.apply_updates(params, up), st, loss

# packed vs decomposed parity at INIT (training to convergence
# saturates the logits and amplifies benign bf16 attention deltas
# through the trained weights)
lg_p = hmodel_p.apply(hp, hx, ei_dict, plan_dict=plans)
lg_r = hmodel_p.apply(hp, hx, ei_dict)
perr = float(jnp.abs(lg_p.astype(jnp.float32)
                     - lg_r.astype(jnp.float32)).max())
pfirst = None
for i in range(60):
    hp, st_p, ploss = pstep(hp, st_p)
    if pfirst is None:
        pfirst = float(ploss)
print(f"HGT PACKED bf16: loss {pfirst:.4f} -> {float(ploss):.4f}, "
      f"packed-vs-xla max err (init) {perr:.2e}")
assert float(ploss) < pfirst and perr < 5e-2
print("ATTENTION DRILL OK")
