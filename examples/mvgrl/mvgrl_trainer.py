"""MVGRL (adjacency vs diffusion view contrast) trainer.

Reference flow: examples/mvgrl/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/mvgrl/mvgrl_trainer.py
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
from gammagl_tpu.models import MVGRLModel, corrupt_features
from gammagl_tpu.utils import calc_gcn_norm


def main(args):
    g, num_classes = load_node_dataset(args.dataset, args.dataset_path)
    d = device_graph(g)
    x, ei = d["x"], d["edge_index"]
    # diffusion view: degree-normalized weights stand in for PPR (the
    # reference precomputes dense PPR; we use the sparse 1-hop kernel)
    diff_w = jnp.asarray(calc_gcn_norm(ei, g.num_nodes))
    model = MVGRLModel(hidden_dim=args.hidden_dim)
    key = jax.random.PRNGKey(args.seed)
    xc = corrupt_features(key, x)
    params = model.init(key, x, ei, ei, diff_w, xc)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    # device data threaded as jit args; corruption inside the jit region
    @jax.jit
    def step(state, rng, x, ei, diff_w):
        xc = corrupt_features(rng, x)
        loss, grads = jax.value_and_grad(
            lambda p: model.apply(p, x, ei, ei, diff_w, xc))(state.params)
        return state.apply_gradients(grads), loss

    rng = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(args.n_epoch):
        rng, k = jax.random.split(rng)
        state, loss = step(state, k, x, ei, diff_w)
        if epoch % 20 == 0:
            print(f"pretrain {epoch:4d} loss {float(loss):.4f}")
    emb = jax.jit(model.apply)(state.params, x, ei, ei, diff_w)
    acc = linear_probe(emb, d, num_classes)
    print(f"probe test acc {acc:.4f}")
    return acc


if __name__ == "__main__":
    main(base_parser(hidden_dim=128, n_epoch=50, lr=0.001).parse_args())
