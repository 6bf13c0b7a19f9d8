"""Minibatch GraphSAGE with neighbor sampling (reference:
examples/graphsage/reddit_sage_trainer.py flow: NeighborSampler -> gather
features -> bipartite SAGE blocks -> train step).

Runs on Reddit when available, else a synthetic graph. Host sampling uses
the native C++ core; batches are prefetched onto the device.
"""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from common import base_parser
from gammagl_tpu.loader import NeighborSamplerLoader
from gammagl_tpu.models import GraphSAGESampleModel
from gammagl_tpu.train import TrainState, accuracy


def load(args):
    try:
        from gammagl_tpu.datasets import Reddit
        ds = Reddit(root=args.dataset_path)
        g = ds[0]
        return g, int(np.asarray(g.y).max()) + 1
    except Exception as e:
        print(f"[warn] reddit unavailable ({e}); synthetic graph")
        from gammagl_tpu.datasets import synthetic_community_graph
        g = synthetic_community_graph(5000, 16, 64, avg_degree=12, seed=0)
        return g, 16


def main(args):
    graph, num_classes = load(args)
    x_all = np.asarray(graph.x)
    y_all = np.asarray(graph.y)
    train_idx = np.nonzero(np.asarray(graph.train_mask))[0]
    loader = NeighborSamplerLoader(
        np.asarray(graph.edge_index), node_idx=train_idx,
        sample_lists=[args.fanout1, args.fanout2],
        batch_size=args.batch_size, num_nodes=graph.num_nodes,
        shuffle=True, seed=args.seed)

    model = GraphSAGESampleModel(hidden_dim=args.hidden_dim,
                                 num_class=num_classes, num_layers=2,
                                 drop_rate=args.drop_rate)
    bs, n_id, adjs = loader.sample(train_idx[:args.batch_size])
    feats = jnp.asarray(x_all[n_id])
    model_adjs = [(jnp.asarray(a.edge_index), a.size[1]) for a in adjs]
    key = jax.random.PRNGKey(args.seed)
    params = model.init({"params": key, "dropout": key}, feats, model_adjs)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    def train_step(state, feats, model_adjs, y, rng):
        # adjs have data-dependent shapes; jit would recompile per batch --
        # for production use padded budgets (sample_neighbors_padded)
        def loss_fn(p):
            logits = model.apply(p, feats, model_adjs, train=True,
                                 rngs={"dropout": rng})
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean(), logits
        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss, logits

    rng = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(args.n_epoch):
        t0 = time.time()
        tot_loss = tot_correct = tot = 0
        for bs, n_id, adjs in loader:
            feats = jnp.asarray(x_all[n_id])
            model_adjs = [(jnp.asarray(a.edge_index), a.size[1])
                          for a in adjs]
            y = jnp.asarray(y_all[n_id[:bs]])
            rng, step_rng = jax.random.split(rng)
            state, loss, logits = train_step(state, feats, model_adjs, y,
                                             step_rng)
            tot_loss += float(loss) * bs
            tot_correct += float((jnp.argmax(logits, -1) == y).sum())
            tot += bs
        print(f"epoch {epoch} loss {tot_loss / tot:.4f} "
              f"train acc {tot_correct / tot:.4f} "
              f"({time.time() - t0:.1f}s)")


if __name__ == "__main__":
    parser = base_parser(hidden_dim=64, n_epoch=3, lr=0.003)
    parser.add_argument("--batch_size", type=int, default=512)
    parser.add_argument("--fanout1", type=int, default=25)
    parser.add_argument("--fanout2", type=int, default=10)
    main(parser.parse_args())
