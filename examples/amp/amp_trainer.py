"""AMP (adaptive message passing with learned depth) trainer.

Reference flow: examples/amp/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/amp/amp_trainer.py
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
from gammagl_tpu.models import AMPModel


def main(args):
    g, num_classes = load_node_dataset(args.dataset, args.dataset_path)
    d = device_graph(g)
    x, ei = d["x"], d["edge_index"]
    model = AMPModel(num_class=num_classes, hidden_dim=args.hidden_dim,
                     max_steps=4)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, x, ei)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    # device data threaded as jit args (never close over device arrays)
    @jax.jit
    def step(state, x, ei, y, train_mask):
        def loss_fn(p):
            logits, depth = model.apply(p, x, ei)
            return semi_supervised_loss(logits, y, train_mask)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    @jax.jit
    def infer(state, x, ei):
        return model.apply(state.params, x, ei)

    for epoch in range(args.n_epoch):
        state, loss = step(state, x, ei, d["y"], d["train_mask"])
        if epoch % 10 == 0:
            logits, depth = infer(state, x, ei)
            acc = accuracy(logits, d["y"], d["test_mask"])
            print(f"epoch {epoch:3d} loss {float(loss):.4f} "
                  f"test {float(acc):.4f} depth {float(depth):.2f}")
    logits, depth = infer(state, x, ei)
    acc = float(accuracy(logits, d["y"], d["test_mask"]))
    print(f"final test acc {acc:.4f} (mean depth {float(depth):.2f})")
    return acc


if __name__ == "__main__":
    main(base_parser(hidden_dim=16, n_epoch=40, lr=0.005).parse_args())
