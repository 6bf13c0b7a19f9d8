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
    from gammagl_tpu.data.padding import size_bucket

    def pad_batch(sub):
        """Bucket-pad so jit compiles once per bucket; padded edges
        point at the last pad row (no-ops for real rows), padded rows
        are masked out of the loss."""
        n, e = sub.num_nodes, sub.edge_index.shape[1]
        # n+1: the pad row receiving phantom edges must never be a
        # real node (size_bucket(n) == n would alias the last real row)
        n_pad, e_pad = int(size_bucket(n + 1)), int(size_bucket(e))
        n_id = np.full(n_pad, np.asarray(sub.n_id)[-1], np.int64)
        n_id[:n] = np.asarray(sub.n_id)
        ei = np.full((2, e_pad), n_pad - 1, np.int64)
        ei[:, :e] = np.asarray(sub.edge_index)
        y = np.zeros(n_pad, np.int32)
        y[:n] = np.asarray(sub.y)
        mask = (np.arange(n_pad) < n).astype(np.float32)
        return n_id, jnp.asarray(ei), jnp.asarray(y), jnp.asarray(mask)

    @jax.jit
    def step(state, x, ei, y, mask):
        def loss_fn(p):
            logits = model.apply(p, x, ei)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (ls * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    state = None
    for epoch in range(args.n_epoch):
        for sub in PrefetchLoader(loader, size=2):
            n_id, ei, y, mask = pad_batch(sub)
            x = cache[n_id]                     # HBM-cached gather
            if state is None:
                params = model.init(jax.random.PRNGKey(args.seed), x, ei)
                state = TrainState.create(params=params,
                                          tx=optax.adam(args.lr))
            state, loss = step(state, x, ei, y, mask)
        print(f"epoch {epoch:3d} loss {float(loss):.4f} "
              f"cache hit-rate {cache.hit_rate:.2%}")
    return state


if __name__ == "__main__":
    parser = base_parser(hidden_dim=32, n_epoch=2, lr=0.003)
    parser.add_argument("--batch_size", type=int, default=64)
    main(parser.parse_args())
