"""CoGSL (compromised graph structure learning) trainer.

Reference flow: examples/cogsl/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/cogsl/cogsl_trainer.py
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
from gammagl_tpu.models import CoGSLModel


def main(args):
    g, num_classes = load_node_dataset(args.dataset, args.dataset_path)
    d = device_graph(g)
    x, ei = d["x"], d["edge_index"]
    # second view: 2-hop metapath-like edges (subsampled)
    rng = np.random.default_rng(args.seed)
    idx = rng.integers(0, ei.shape[1], min(4000, ei.shape[1]))
    e2 = jnp.asarray(np.asarray(ei)[:, idx][::-1].copy())
    model = CoGSLModel(num_class=num_classes, hidden_dim=args.hidden_dim)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, x, ei, e2)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    # device data threaded as jit args (never close over device arrays)
    @jax.jit
    def step(state, x, ei, e2, y, train_mask):
        def loss_fn(p):
            (l1, l2, lf), mi = model.apply(p, x, ei, e2)
            return (semi_supervised_loss(lf, y, train_mask)
                    + 0.5 * semi_supervised_loss(l1, y, train_mask)
                    + 0.5 * semi_supervised_loss(l2, y, train_mask)
                    - 0.1 * mi)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    @jax.jit
    def infer(state, x, ei, e2):
        return model.apply(state.params, x, ei, e2)

    for epoch in range(args.n_epoch):
        state, loss = step(state, x, ei, e2, d["y"], d["train_mask"])
        if epoch % 10 == 0:
            (l1, l2, lf), _ = infer(state, x, ei, e2)
            acc = accuracy(lf, d["y"], d["test_mask"])
            print(f"epoch {epoch:3d} loss {float(loss):.4f} "
                  f"test {float(acc):.4f}")
    (l1, l2, lf), _ = infer(state, x, ei, e2)
    acc = float(accuracy(lf, d["y"], d["test_mask"]))
    print(f"final test acc {acc:.4f}")
    return acc


if __name__ == "__main__":
    main(base_parser(hidden_dim=16, n_epoch=40, lr=0.005).parse_args())
