"""RGCN on a typed graph (hetero_rgcn) trainer.

Reference flow: examples/hetero_rgcn/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/hetero_rgcn/hetero_rgcn_trainer.py
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from examples.common import (base_parser, device_graph, linear_probe,
                             load_node_dataset, synthetic_hetero)
from gammagl_tpu.train import TrainState, accuracy, semi_supervised_loss
from gammagl_tpu.models import RGCNModel


def typed_graph(args):
    """Homogeneous view of the synthetic typed graph with edge types."""
    hg, target = synthetic_hetero()
    eis, etypes = [], []
    offs = {"movie": 0, "director": hg["movie"].x.shape[0]}
    for t, (st, rel, dt) in enumerate(hg.edge_index_dict.keys()):
        ei = np.asarray(hg.edge_index_dict[(st, rel, dt)])
        eis.append(np.stack([ei[0] + offs[st], ei[1] + offs[dt]]))
        etypes.append(np.full(ei.shape[1], t))
    x = np.concatenate([np.asarray(hg["movie"].x),
                        np.asarray(hg["director"].x)])
    ei = np.concatenate(eis, axis=1)
    et = np.concatenate(etypes)
    y = np.asarray(hg["movie"].y)
    n_m = y.shape[0]
    return (jnp.asarray(x), jnp.asarray(ei), jnp.asarray(et),
            jnp.asarray(y), n_m, len(eis),
            jnp.asarray(np.asarray(hg["movie"].train_mask)),
            jnp.asarray(np.asarray(hg["movie"].test_mask)))


def main_ep(args, data):
    """Expert-parallel RGCN: each device along the 'ep' mesh axis owns a
    subset of relation weight matrices; forward pays one psum per layer
    and each expert's weight GRADIENT stays on its owner
    (gammagl_tpu/parallel/strategies.py make_relation_expert_spmm —
    gradient parity in tests/parallel/test_strategies.py and the
    sp/ep/pp tiers of dryrun_multichip)."""
    from jax.sharding import Mesh
    from gammagl_tpu.parallel import (make_relation_expert_spmm,
                                      shard_expert_weights)
    x, ei, et, y, n_m, n_rel, train_mask, test_mask = data
    num_classes = int(np.asarray(y).max()) + 1
    n, f = x.shape
    ndev = max(1, min(args.ep, len(jax.devices())))
    mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("ep",))
    run = make_relation_expert_spmm(mesh, n)

    rng = np.random.default_rng(args.seed)
    w1 = shard_expert_weights(mesh, jnp.asarray(
        rng.normal(size=(n_rel, f, args.hidden_dim)).astype(np.float32)
        * (1.0 / np.sqrt(f))))
    w2 = shard_expert_weights(mesh, jnp.asarray(
        rng.normal(size=(n_rel, args.hidden_dim, num_classes))
        .astype(np.float32) * (1.0 / np.sqrt(args.hidden_dim))))
    params = {"w1": w1, "w2": w2}
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def forward(p, x, ei, et):
        h = jax.nn.relu(run(ei, et, x, p["w1"]))
        return run(ei, et, h, p["w2"])[:n_m]

    @jax.jit
    def step(params, opt_state, x, ei, et, y, train_mask):
        def loss_fn(p):
            return semi_supervised_loss(forward(p, x, ei, et), y,
                                        train_mask)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(args.n_epoch):
        params, opt_state, loss = step(params, opt_state, x, ei, et, y,
                                       train_mask)
        if epoch % 10 == 0:
            acc = accuracy(forward(params, x, ei, et), y, test_mask)
            print(f"[ep={ndev}] epoch {epoch:3d} loss {float(loss):.4f} "
                  f"test {float(acc):.4f}")
    acc = float(accuracy(forward(params, x, ei, et), y, test_mask))
    print(f"[ep={ndev}] final test acc {acc:.4f}")
    return acc


def main(args):
    data = typed_graph(args)
    if getattr(args, "ep", 0):
        return main_ep(args, data)
    x, ei, et, y, n_m, n_rel, train_mask, test_mask = data
    num_classes = int(np.asarray(y).max()) + 1
    model = RGCNModel(in_channels=x.shape[1], hidden_channels=args.hidden_dim, num_class=num_classes, num_relations=n_rel, num_bases=2)
    key = jax.random.PRNGKey(args.seed)
    params = model.init({"params": key, "dropout": key}, x, ei, et)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    # device data threaded as jit args (never close over device arrays)
    @jax.jit
    def step(state, rng, x, ei, et, y, train_mask):
        def loss_fn(p):
            logits = model.apply(p, x, ei, et,
                                 rngs={"dropout": rng})[:n_m]
            return semi_supervised_loss(logits, y, train_mask)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    @jax.jit
    def infer(state, x, ei, et):
        return model.apply(state.params, x, ei, et)[:n_m]

    rng = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(args.n_epoch):
        rng, k = jax.random.split(rng)
        state, loss = step(state, k, x, ei, et, y, train_mask)
        if epoch % 10 == 0:
            acc = accuracy(infer(state, x, ei, et), y, test_mask)
            print(f"epoch {epoch:3d} loss {float(loss):.4f} "
                  f"test {float(acc):.4f}")
    acc = float(accuracy(infer(state, x, ei, et), y, test_mask))
    print(f"final test acc {acc:.4f}")
    return acc


if __name__ == "__main__":
    p = base_parser(hidden_dim=16, n_epoch=50, lr=0.005)
    p.add_argument("--ep", type=int, default=0,
                   help="train the expert-parallel tier over this many "
                        "mesh devices (0 = the dense RGCN path)")
    main(p.parse_args())
