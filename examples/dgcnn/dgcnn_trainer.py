"""DGCNN (sort-pooling graph classification) trainer.

Reference flow: examples/dgcnn/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/dgcnn/dgcnn_trainer.py
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
from gammagl_tpu.models import DGCNNModel


def graph_batch(args, seed=0):
    """Disjoint batch of synthetic two-class graphs (dense vs sparse)."""
    rng = np.random.default_rng(seed)
    xs, eis, batch, ys = [], [], [], []
    off = 0
    for i in range(args.num_graphs):
        n = 12
        label = i % 2
        p = 0.5 if label else 0.15
        a = rng.random((n, n)) < p
        ei = np.stack(np.nonzero(a))
        xs.append(rng.normal(size=(n, 8)).astype(np.float32))
        eis.append(ei + off)
        batch.extend([i] * n)
        ys.append(label)
        off += n
    return (jnp.asarray(np.concatenate(xs)),
            jnp.asarray(np.concatenate(eis, axis=1)),
            jnp.asarray(np.asarray(batch)),
            jnp.asarray(np.asarray(ys)), args.num_graphs)


def main(args):
    x, ei, batch, y, ng = graph_batch(args)
    model = DGCNNModel(hidden_dim=args.hidden_dim, num_class=2, k=6)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, x, ei, batch, ng)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    def step(state):
        def loss_fn(p):
            logits = model.apply(p, x, ei, batch, ng)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    for epoch in range(args.n_epoch):
        state, loss = step(state)
        if epoch % 10 == 0:
            logits = model.apply(state.params, x, ei, batch, ng)
            acc = float((jnp.argmax(logits, 1) == y).mean())
            print(f"epoch {epoch:3d} loss {float(loss):.4f} acc {acc:.4f}")
    logits = model.apply(state.params, x, ei, batch, ng)
    acc = float((jnp.argmax(logits, 1) == y).mean())
    print(f"final train acc {acc:.4f}")
    return acc


if __name__ == "__main__":
    main(base_parser(hidden_dim=16, n_epoch=50, lr=0.005, num_graphs=32).parse_args())
