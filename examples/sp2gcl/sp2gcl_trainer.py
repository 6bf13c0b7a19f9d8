"""Sp2GCL (spectral-spatial contrastive) trainer.

Reference flow: examples/sp2gcl/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/sp2gcl/sp2gcl_trainer.py
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
from gammagl_tpu.models import Sp2GCLModel, laplacian_eigh


def main(args):
    g, num_classes = load_node_dataset(args.dataset, args.dataset_path)
    d = device_graph(g)
    x, ei = d["x"], d["edge_index"]
    lam, u = laplacian_eigh(np.asarray(ei), g.num_nodes)
    u = jnp.asarray(u[:, :args.spe_dim])
    model = Sp2GCLModel(hidden_dim=args.hidden_dim)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, x, ei, u)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    # device data threaded as jit args (never close over device arrays)
    @jax.jit
    def step(state, x, ei, u):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply(p, x, ei, u))(state.params)
        return state.apply_gradients(grads), loss

    for epoch in range(args.n_epoch):
        state, loss = step(state, x, ei, u)
        if epoch % 20 == 0:
            print(f"pretrain {epoch:4d} loss {float(loss):.4f}")
    emb = jax.jit(model.apply, static_argnames=("method",))(
        state.params, x, ei, u, method="embed") \
        if hasattr(Sp2GCLModel, "embed") else x
    acc = linear_probe(jnp.asarray(emb), d, num_classes)
    print(f"probe test acc {acc:.4f}")
    return acc


if __name__ == "__main__":
    main(base_parser(hidden_dim=64, n_epoch=30, lr=0.001, spe_dim=16).parse_args())
