"""InfoGraph (graph-level mutual information SSL) trainer.

Reference flow: examples/infograph/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/infograph/infograph_trainer.py
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from examples.common import (base_parser, device_graph, linear_probe,
                             load_node_dataset)
from gammagl_tpu.train import TrainState
from gammagl_tpu.models import InfoGraph


def main(args):
    # batched synthetic graphs: two communities per graph-class
    rng = np.random.default_rng(args.seed)
    graphs, ys = [], []
    for i in range(32):
        n = 12
        label = i % 2
        p = 0.5 if label else 0.15
        a = rng.random((n, n)) < p
        ei = np.stack(np.nonzero(a))
        graphs.append((rng.normal(size=(n, 8)).astype(np.float32), ei))
        ys.append(label)
    # disjoint batch
    xs, eis, batch = [], [], []
    off = 0
    for i, (x, ei) in enumerate(graphs):
        xs.append(x); eis.append(ei + off)
        batch.extend([i] * x.shape[0]); off += x.shape[0]
    x = jnp.asarray(np.concatenate(xs))
    ei = jnp.asarray(np.concatenate(eis, axis=1))
    batch = jnp.asarray(np.asarray(batch))
    num_graphs = len(graphs)

    model = InfoGraph(hidden_dim=args.hidden_dim, num_layers=2)
    params = model.init(jax.random.PRNGKey(args.seed), x, ei, batch,
                        num_graphs)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    # device data threaded as jit args (never close over device arrays)
    @jax.jit
    def step(state, x, ei, batch):
        def loss_fn(p):
            loss, _ = model.apply(p, x, ei, batch, num_graphs)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    for epoch in range(args.n_epoch):
        state, loss = step(state, x, ei, batch)
        if epoch % 10 == 0:
            print(f"pretrain {epoch:4d} loss {float(loss):.4f}")
    _, h_graph = jax.jit(model.apply, static_argnums=4)(
        state.params, x, ei, batch, num_graphs)
    print("graph embeddings:", np.asarray(h_graph).shape)

    # graph-classification probe on the frozen embeddings (the
    # reference readme's protocol: SVM on InfoGraph embeddings — here a
    # logistic probe, same frozen-representation idea)
    from examples.common import linear_probe
    y = np.asarray(ys)
    half = num_graphs // 2
    train_mask = np.zeros(num_graphs, bool)
    train_mask[:half] = True
    d = {"y": jnp.asarray(y), "train_mask": jnp.asarray(train_mask),
         "test_mask": jnp.asarray(~train_mask)}
    acc = linear_probe(h_graph, d, int(y.max()) + 1)
    print(f"probe test acc {acc:.4f}")
    return acc


if __name__ == "__main__":
    main(base_parser(hidden_dim=32, n_epoch=30, lr=0.001).parse_args())
