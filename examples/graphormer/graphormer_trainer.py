"""Graphormer (dense attention + structural encodings) trainer.

Reference flow: examples/graphormer/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/graphormer/graphormer_trainer.py
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
from gammagl_tpu.models import GraphormerModel
from gammagl_tpu.utils import shortest_path


def main(args):
    # graph-level classification (the reference's Graphormer targets
    # molecule property prediction): synthetic dense/sparse graph set
    rng = np.random.default_rng(args.seed)
    graphs = []
    for i in range(args.num_graphs):
        n = 16
        label = i % 2
        p = 0.5 if label else 0.15
        a = rng.random((n, n)) < p
        ei = np.stack(np.nonzero(a))
        x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
        dist = jnp.asarray(shortest_path(ei, n, max_dist=5))
        ind = jnp.asarray(np.bincount(ei[1], minlength=n).astype(np.int32))
        outd = jnp.asarray(np.bincount(ei[0], minlength=n).astype(np.int32))
        graphs.append((x, ind, outd, dist, label))

    model = GraphormerModel(hidden_dim=args.hidden_dim, num_class=2,
                            num_layers=2, num_heads=2, dropout_rate=0.0)
    key = jax.random.PRNGKey(args.seed)
    g0 = graphs[0]
    params = model.init(key, g0[0], g0[1], g0[2], g0[3])
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    @jax.jit
    def step(state, x, ind, outd, dist, y):
        def loss_fn(p):
            logits = model.apply(p, x, ind, outd, dist)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits[None], y[None]).mean()
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    @jax.jit
    def infer(state, x, ind, outd, dist):
        return model.apply(state.params, x, ind, outd, dist)

    for epoch in range(args.n_epoch):
        total = 0.0
        for x, ind, outd, dist, label in graphs:
            state, loss = step(state, x, ind, outd, dist,
                               jnp.asarray(label))
            total += float(loss)
        correct = sum(
            int(jnp.argmax(infer(state, x, ind, outd, dist))) == label
            for x, ind, outd, dist, label in graphs)
        print(f"epoch {epoch:3d} loss {total / len(graphs):.4f} "
              f"acc {correct / len(graphs):.4f}")
    return state


if __name__ == "__main__":
    main(base_parser(hidden_dim=32, n_epoch=5, lr=0.001,
                     num_graphs=16).parse_args())
