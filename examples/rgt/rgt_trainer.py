"""RGT self-supervised trainer with structure extraction.

Reference flow: examples/rgt/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/rgt/rgt_trainer.py
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
from gammagl_tpu.models import RGTModel
from gammagl_tpu.loader import ExtractNodeLoader


def main(args):
    from gammagl_tpu.data.graph import Graph
    g, _ = load_node_dataset(args.dataset, args.dataset_path)
    loader = ExtractNodeLoader(g, num_neighbors=[4, 2],
                               batch_size=args.batch_size, shuffle=False,
                               max_tree_edges=8, seed=args.seed)
    model = RGTModel(in_dim=g.x.shape[1], hidden_dim=args.hidden_dim,
                     embed_dim=32, n_layers=2, codebook_size=64,
                     codebook_dim=16, codebook_heads=4)
    batch = next(iter(loader))
    bargs = (jnp.asarray(batch.x), jnp.asarray(batch.edge_index),
             jnp.asarray(batch.tree_edge_index),
             jnp.asarray(batch.cycle_edge_index),
             jnp.asarray(batch.seq_edge_index), batch.num_seeds)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, *bargs, method=RGTModel.train_loss)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    @jax.jit
    def step(state, tokens, ei, tree, cycle, seq):
        def loss_fn(p):
            loss, _ = model.apply(p, tokens, ei, tree, cycle, seq,
                                  batch.num_seeds,
                                  method=RGTModel.train_loss)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    for epoch in range(args.n_epoch):
        total, nb = 0.0, 0
        for b in loader:
            state, loss = step(state, jnp.asarray(b.x),
                               jnp.asarray(b.edge_index),
                               jnp.asarray(b.tree_edge_index),
                               jnp.asarray(b.cycle_edge_index),
                               jnp.asarray(b.seq_edge_index))
            total += float(loss); nb += 1
        print(f"epoch {epoch:3d} loss {total / nb:.4f}")
    return state


if __name__ == "__main__":
    main(base_parser(hidden_dim=64, n_epoch=2, lr=0.001, batch_size=4).parse_args())
