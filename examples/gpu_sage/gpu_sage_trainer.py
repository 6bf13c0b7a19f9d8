"""Accelerator-fed GraphSAGE (reference examples/gpu_sage + gglspeedup):
host C++ sampling, HBM feature cache for hot nodes, double-buffered
device prefetch.

Usage: python examples/gpu_sage/gpu_sage_trainer.py
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from examples.common import base_parser, load_node_dataset
from gammagl_tpu.loader import DeviceFeatureCache, NodeNeighborLoader
from gammagl_tpu.loader.prefetch import PrefetchLoader
from gammagl_tpu.models import GraphSAGEModel
from gammagl_tpu.train import TrainState
from gammagl_tpu.utils import degree


def main(args):
    g, num_classes = load_node_dataset(args.dataset, args.dataset_path)
    deg = np.asarray(degree(jnp.asarray(np.asarray(g.edge_index)[1]),
                            g.num_nodes))
    cache = DeviceFeatureCache(np.asarray(g.x), budget_rows=g.num_nodes // 2,
                               score=deg)
    loader = NodeNeighborLoader(g, num_neighbors=[8, 4],
                                batch_size=args.batch_size, shuffle=True,
                                seed=args.seed)
    model = GraphSAGEModel(hidden_dim=args.hidden_dim,
                           num_class=num_classes, drop_rate=0.0)
    params, state, step = None, None, None
    for epoch in range(args.n_epoch):
        for sub in PrefetchLoader(loader, size=2):
            x = cache[np.asarray(sub.n_id)]     # HBM-cached gather
            ei = jnp.asarray(np.asarray(sub.edge_index))
            y = jnp.asarray(np.asarray(sub.y))
            if params is None:
                params = model.init(jax.random.PRNGKey(args.seed), x, ei)
                state = TrainState.create(params=params,
                                          tx=optax.adam(args.lr))

                def step(state, x, ei, y):
                    def loss_fn(p):
                        logits = model.apply(p, x, ei)
                        return optax.softmax_cross_entropy_with_integer_labels(
                            logits, y).mean()
                    loss, grads = jax.value_and_grad(loss_fn)(state.params)
                    return state.apply_gradients(grads), loss

            state, loss = step(state, x, ei, y)
        print(f"epoch {epoch:3d} loss {float(loss):.4f} "
              f"cache hit-rate {cache.hit_rate:.2%}")
    return state


if __name__ == "__main__":
    parser = base_parser(hidden_dim=32, n_epoch=2, lr=0.003)
    parser.add_argument("--batch_size", type=int, default=64)
    main(parser.parse_args())
