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

    # node-classification probe on the fused multi-manifold embeddings
    # of the seed nodes (reference readme metric: accuracy on
    # cora/citeseer)
    from examples.common import linear_probe
    import itertools
    embs, ids = [], []
    # cap the embedding pass: enough seed coverage for the probe without
    # paying a full-epoch recompile sweep on CPU smoke runs
    for b in itertools.islice(iter(loader), 40):
        _, fused = model.apply(state.params, jnp.asarray(b.x),
                               jnp.asarray(b.edge_index),
                               jnp.asarray(b.tree_edge_index),
                               jnp.asarray(b.cycle_edge_index),
                               jnp.asarray(b.seq_edge_index),
                               b.num_seeds,
                               method=RGTModel.train_loss)
        embs.append(np.asarray(fused)[:b.num_seeds])
        ids.append(np.asarray(b.n_id)[:b.num_seeds])
    emb = np.zeros((g.num_nodes, embs[0].shape[1]), np.float32)
    emb[np.concatenate(ids)] = np.concatenate(embs)
    y = np.asarray(g.y)
    d = {"y": jnp.asarray(y),
         "train_mask": jnp.asarray(np.asarray(g.train_mask).reshape(
             g.num_nodes, -1)[:, 0]),
         "test_mask": jnp.asarray(np.asarray(g.test_mask))}
    acc = linear_probe(jnp.asarray(emb), d, int(y.max()) + 1)
    print(f"probe test acc {acc:.4f}")
    return acc


if __name__ == "__main__":
    main(base_parser(hidden_dim=64, n_epoch=2, lr=0.001, batch_size=4).parse_args())
