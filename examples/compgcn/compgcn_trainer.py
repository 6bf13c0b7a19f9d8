"""CompGCN (composition-based relational GCN) trainer.

Reference flow: examples/compgcn/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/compgcn/compgcn_trainer.py
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
from gammagl_tpu.models import CompGCNModel


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


def main(args):
    x, ei, et, y, n_m, n_rel, train_mask, test_mask = typed_graph(args)
    num_classes = int(np.asarray(y).max()) + 1
    model = CompGCNModel(num_relations=n_rel, hidden_dim=args.hidden_dim, num_class=num_classes)
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
    main(base_parser(hidden_dim=16, n_epoch=50, lr=0.005).parse_args())
