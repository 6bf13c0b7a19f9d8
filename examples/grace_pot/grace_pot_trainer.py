"""GRACE-POT (provable robustness via CROWN bounds) trainer.

Reference flow: examples/grace_pot/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/grace_pot/grace_pot_trainer.py
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
from gammagl_tpu.models import GracePOTModel, drop_edge_and_feature


def main(args):
    g, num_classes = load_node_dataset(args.dataset, args.dataset_path)
    d = device_graph(g)
    x, ei = d["x"], d["edge_index"]
    model = GracePOTModel(num_hidden=args.hidden_dim,
                          num_proj_hidden=args.hidden_dim)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, x, ei, None, x, ei, None, method="loss")
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    # device data threaded as jit args (never close over device arrays)
    @jax.jit
    def step(state, rng, x, ei):
        k1, k2 = jax.random.split(rng)
        x1, w1 = drop_edge_and_feature(k1, x, ei, 0.2, 0.2)
        x2, w2 = drop_edge_and_feature(k2, x, ei, 0.3, 0.3)
        loss, grads = jax.value_and_grad(
            lambda p: model.apply(p, x1, ei, w1, x2, ei, w2,
                                  method="loss"))(state.params)
        return state.apply_gradients(grads), loss

    rng = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(args.n_epoch):
        rng, k = jax.random.split(rng)
        state, loss = step(state, k, x, ei)
        if epoch % 20 == 0:
            print(f"pretrain {epoch:4d} loss {float(loss):.4f}")
    emb = jax.jit(model.apply)(state.params, x, ei)
    acc = linear_probe(emb, d, num_classes)
    print(f"probe test acc {acc:.4f}")
    return acc


if __name__ == "__main__":
    main(base_parser(hidden_dim=64, n_epoch=50, lr=0.001).parse_args())
