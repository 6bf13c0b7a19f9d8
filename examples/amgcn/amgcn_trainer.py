"""AM-GCN / SFGCN (structure + feature graph attention mix) trainer.

Reference flow: examples/amgcn/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/amgcn/amgcn_trainer.py
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
from gammagl_tpu.models import SFGCNModel


def main(args):
    g, num_classes = load_node_dataset(args.dataset, args.dataset_path)
    d = device_graph(g)
    x, ei = d["x"], d["edge_index"]
    # feature graph: kNN over features (reference amgcn builds a feature
    # adjacency)
    xf = np.asarray(x)
    sim = xf @ xf.T
    k = 5
    nn_idx = np.argsort(-sim, axis=1)[:, 1:k + 1]
    src = np.repeat(np.arange(xf.shape[0]), k)
    fei = jnp.asarray(np.stack([src, nn_idx.reshape(-1)]))
    model = SFGCNModel(num_class=num_classes, hidden_dim=args.hidden_dim)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, x, ei, fei)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    # device data threaded as jit args (never close over device arrays)
    @jax.jit
    def step(state, x, ei, fei, y, train_mask):
        def loss_fn(p):
            logits, consistency = model.apply(p, x, ei, fei)
            return (semi_supervised_loss(logits, y, train_mask)
                    + 0.01 * consistency)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    @jax.jit
    def infer(state, x, ei, fei):
        return model.apply(state.params, x, ei, fei)

    for epoch in range(args.n_epoch):
        state, loss = step(state, x, ei, fei, d["y"], d["train_mask"])
        if epoch % 10 == 0:
            logits, _ = infer(state, x, ei, fei)
            acc = accuracy(logits, d["y"], d["test_mask"])
            print(f"epoch {epoch:3d} loss {float(loss):.4f} "
                  f"test {float(acc):.4f}")
    logits, _ = infer(state, x, ei, fei)
    acc = float(accuracy(logits, d["y"], d["test_mask"]))
    print(f"final test acc {acc:.4f}")
    return acc


if __name__ == "__main__":
    main(base_parser(hidden_dim=16, n_epoch=40, lr=0.005).parse_args())
