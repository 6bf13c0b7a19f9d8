"""DR-GST (distribution-recovered self-training) trainer.

Reference flow: examples/drgst/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/drgst/drgst_trainer.py
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
from gammagl_tpu.models import GCNModel


def main(args):
    # self-training with confidence-thresholded pseudo-labels
    # (reference examples/drgst/)
    g, num_classes = load_node_dataset(args.dataset, args.dataset_path)
    d = device_graph(g)
    x, ei = d["x"], d["edge_index"]
    model = GCNModel(hidden_dim=args.hidden_dim, num_class=num_classes,
                     drop_rate=0.0)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, x, ei)

    # device data threaded as jit args (no device-array closures); step
    # defined once OUTSIDE the stage loop so stages reuse one executable
    @jax.jit
    def step(state, x, ei, ym, tm):
        loss, grads = jax.value_and_grad(
            lambda p: semi_supervised_loss(model.apply(p, x, ei),
                                           ym, tm))(state.params)
        return state.apply_gradients(grads), loss

    @jax.jit
    def infer(params, x, ei):
        return model.apply(params, x, ei)

    train_mask = np.asarray(d["train_mask"]).copy()
    y = np.asarray(d["y"]).copy()
    for stage in range(args.stages):
        state = TrainState.create(params=params, tx=optax.adam(args.lr))
        ym, tm = jnp.asarray(y), jnp.asarray(train_mask)

        for _ in range(args.n_epoch):
            state, loss = step(state, x, ei, ym, tm)
        params = state.params
        probs = jax.nn.softmax(infer(params, x, ei))
        conf = np.asarray(probs.max(axis=1))
        pred = np.asarray(probs.argmax(axis=1))
        new = (conf > args.threshold) & ~train_mask
        y[new] = pred[new]
        train_mask = train_mask | new
        acc = float(accuracy(infer(params, x, ei), d["y"],
                             d["test_mask"]))
        print(f"stage {stage}: +{int(new.sum())} pseudo-labels, "
              f"test acc {acc:.4f}")
    return acc


if __name__ == "__main__":
    main(base_parser(hidden_dim=16, n_epoch=30, lr=0.01, stages=3, threshold=0.9).parse_args())
