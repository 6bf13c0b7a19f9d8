"""Specformer (spectral transformer filters) trainer.

Reference flow: examples/specformer/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/specformer/specformer_trainer.py
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
from gammagl_tpu.models import SpecformerModel, laplacian_eigh


def main(args):
    g, num_classes = load_node_dataset(args.dataset, args.dataset_path)
    d = device_graph(g)
    x = d["x"]
    lam, u = laplacian_eigh(np.asarray(d["edge_index"]), g.num_nodes)
    lam, u = jnp.asarray(lam), jnp.asarray(u)
    from gammagl_tpu.train import semi_supervised_loss, accuracy
    model = SpecformerModel(num_class=num_classes,
                            hidden_dim=args.hidden_dim, num_filters=2,
                            drop_rate=args.drop_rate)
    key = jax.random.PRNGKey(args.seed)
    params = model.init({"params": key, "dropout": key}, x, lam, u)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    # device data threaded as jit args (never close over device arrays)
    @jax.jit
    def step(state, rng, x, lam, u, y, train_mask):
        def loss_fn(p):
            logits = model.apply(p, x, lam, u, train=True,
                                 rngs={"dropout": rng})
            return semi_supervised_loss(logits, y, train_mask)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    @jax.jit
    def infer(state, x, lam, u):
        return model.apply(state.params, x, lam, u)

    rng = jax.random.PRNGKey(args.seed + 1)
    best = 0.0
    for epoch in range(args.n_epoch):
        rng, k = jax.random.split(rng)
        state, loss = step(state, k, x, lam, u, d["y"], d["train_mask"])
        acc = float(accuracy(infer(state, x, lam, u),
                             d["y"], d["test_mask"]))
        best = max(best, acc)
        if epoch % 20 == 0:
            print(f"epoch {epoch:4d} loss {float(loss):.4f} test {acc:.4f}")
    print(f"best test acc {best:.4f}")
    return best


if __name__ == "__main__":
    main(base_parser(hidden_dim=32, n_epoch=100, lr=0.01, drop_rate=0.2).parse_args())
