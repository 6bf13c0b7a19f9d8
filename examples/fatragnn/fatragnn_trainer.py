"""FatraGNN (fairness under distribution shift) trainer.

Reference flow: examples/fatragnn/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/fatragnn/fatragnn_trainer.py
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
from gammagl_tpu.models import FatraGNNModel, modify_structure


def main(args):
    # synthetic fairness graph: label y, sensitive attribute correlated
    rng = np.random.default_rng(args.seed)
    n, f = 300, 16
    y = rng.integers(0, 2, n)
    sens = np.where(rng.random(n) < 0.7, y, 1 - y)
    x = rng.normal(size=(n, f)).astype(np.float32)
    x[:, 0] += y * 1.5
    x[:, 1] += sens * 1.0
    src = rng.integers(0, n, 8 * n)
    same = rng.random(8 * n) < 0.8
    dst = np.where(same, (src + rng.integers(1, 10, 8 * n) * 2) % n,
                   rng.integers(0, n, 8 * n))
    ei = np.stack([src, dst])
    train_mask = rng.random(n) < 0.5

    xj, eij = jnp.asarray(x), jnp.asarray(ei)
    yj = jnp.asarray(y.astype(np.float32))
    tm = jnp.asarray(train_mask)

    model = FatraGNNModel(num_features=f, hidden=args.hidden_dim)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, xj, eij, method=FatraGNNModel.init_all)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    # adversarially edited graph (drop cross-sens edges)
    ei2 = jnp.asarray(modify_structure(ei, ei, sens, drop=0.6))

    # device data threaded as jit args (never close over device arrays)
    @jax.jit
    def step(state, xj, eij, ei2, yj, tm):
        def loss_fn(p):
            logits = model.apply(p, xj, eij, 0)[:, 0]
            ce = jnp.where(tm, optax.sigmoid_binary_cross_entropy(
                logits, yj), 0).sum() / tm.sum()
            out = model.apply(p, xj, eij, 5, edge_index2=ei2)
            align = ((out["h1"] - out["h2"]) ** 2).sum(1).mean()
            return ce + 0.5 * align
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    for epoch in range(args.n_epoch):
        state, loss = step(state, xj, eij, ei2, yj, tm)
        if epoch % 10 == 0:
            print(f"epoch {epoch:3d} loss {float(loss):.4f}")
    pred = np.asarray(model.apply(state.params, xj, eij, 0)[:, 0] > 0)
    test = ~train_mask
    acc = (pred[test] == y[test].astype(bool)).mean()
    # statistical parity gap
    sp = abs(pred[test & (sens == 0)].mean()
             - pred[test & (sens == 1)].mean())
    print(f"test acc {acc:.4f}, parity gap {sp:.4f}")
    return acc


if __name__ == "__main__":
    main(base_parser(hidden_dim=16, n_epoch=40, lr=0.005).parse_args())
