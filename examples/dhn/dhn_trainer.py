"""DHN distance-encoded link prediction trainer.

Reference flow: examples/dhn/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/dhn/dhn_trainer.py
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from examples.common import base_parser, load_node_dataset
from gammagl_tpu.train import TrainState
from gammagl_tpu.models import DHNModel


def main(args):
    # synthetic heterogeneous neighborhood blocks (reference examples/dhn:
    # each endpoint is encoded as [self | 1-hop | 2-hop] distance-encoded
    # features)
    K, F, B = 4, 8, 64
    width = F + K * F + K * K * F
    rng = np.random.default_rng(args.seed)
    model = DHNModel(num_fea=F, num_neighbor=K, hidden=args.hidden_dim)

    def batch():
        n1 = rng.normal(size=(B, width)).astype(np.float32)
        n2 = rng.normal(size=(B, width)).astype(np.float32)
        # positive pairs share a planted direction
        y = rng.integers(0, 2, B).astype(np.float32)
        sig = rng.normal(size=(width,)).astype(np.float32)
        n2 += y[:, None] * sig * 0.8
        return jnp.asarray(n1), jnp.asarray(n2), jnp.asarray(y)

    n1, n2, y = batch()
    params = model.init(jax.random.PRNGKey(args.seed), n1, n2)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    @jax.jit
    def step(state, n1, n2, y):
        def loss_fn(p):
            logits = model.apply(p, n1, n2)[:, 0]
            return optax.sigmoid_binary_cross_entropy(logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    for epoch in range(args.n_epoch):
        n1, n2, y = batch()
        state, loss = step(state, n1, n2, y)
        if epoch % 5 == 0:
            acc = float(((model.apply(state.params, n1, n2)[:, 0] > 0)
                         == (y > 0.5)).mean())
            print(f"epoch {epoch:3d} loss {float(loss):.4f} acc {acc:.4f}")

    # held-out AUC (reference readme metric: link AUC on acm)
    from examples.common import binary_auc
    scores, ys = [], []
    for _ in range(8):
        n1, n2, y = batch()
        scores.append(np.asarray(model.apply(state.params, n1, n2))[:, 0])
        ys.append(np.asarray(y))
    auc = binary_auc(np.concatenate(scores), np.concatenate(ys))
    print(f"held-out AUC {auc:.4f}")
    return auc


if __name__ == "__main__":
    main(base_parser(hidden_dim=32, n_epoch=30, lr=0.005).parse_args())
