"""GCN full-batch trainer -- the reference's flagship example, TPU-native.

Reference flow: examples/gcn/gcn_trainer.py:52-141 (Planetoid -> add self
loops -> GCN -> Adam semi-supervised CE -> best-val checkpoint). Here the
whole train step is one jit region; with no dataset on disk it falls back to
a synthetic SBM graph so the script always runs.

Usage:
  python examples/gcn/gcn_trainer.py --dataset cora --lr 0.01 --n_epoch 200
"""

import argparse
import os.path as osp
import sys
import time

# allow running from a source checkout without installation
sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from gammagl_tpu.models import GCNModel
from gammagl_tpu.utils import add_self_loops, mask_to_index
from gammagl_tpu.train import (TrainState, semi_supervised_loss, accuracy,
                               save_checkpoint, load_checkpoint)


def load_dataset(args):
    if args.dataset in ("cora", "citeseer", "pubmed"):
        try:
            from gammagl_tpu.datasets import Planetoid
            ds = Planetoid(root=args.dataset_path, name=args.dataset)
            return ds[0], ds.num_classes
        except Exception as e:  # no network: fall back to synthetic
            print(f"[warn] {args.dataset} unavailable ({e}); "
                  "using synthetic SBM graph")
    from gammagl_tpu.datasets import synthetic_community_graph
    g = synthetic_community_graph(1000, 7, 128, avg_degree=8, seed=0)
    return g, 7


def main(args):
    graph, num_classes = load_dataset(args)
    ei, _ = add_self_loops(np.asarray(graph.edge_index),
                           num_nodes=graph.num_nodes)
    x = jnp.asarray(graph.x)
    y = jnp.asarray(np.asarray(graph.y))
    ei = jnp.asarray(ei)
    train_mask = jnp.asarray(np.asarray(graph.train_mask).reshape(-1))
    val_mask = jnp.asarray(np.asarray(graph.val_mask).reshape(-1))
    test_mask = jnp.asarray(np.asarray(graph.test_mask).reshape(-1))

    model = GCNModel(hidden_dim=args.hidden_dim, num_class=num_classes,
                     drop_rate=args.drop_rate)
    key = jax.random.PRNGKey(args.seed)
    params = model.init({"params": key, "dropout": key}, x, ei)
    tx = optax.chain(
        optax.add_decayed_weights(args.l2_coef),
        optax.adam(args.lr),
    )
    state = TrainState.create(params=params, tx=tx)

    @jax.jit
    def train_step(state, rng):
        def loss_fn(p):
            logits = model.apply(p, x, ei, train=True,
                                 rngs={"dropout": rng})
            return semi_supervised_loss(logits, y, train_mask)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    @jax.jit
    def evaluate(state):
        logits = model.apply(state.params, x, ei)
        return (accuracy(logits, y, val_mask),
                accuracy(logits, y, test_mask))

    best_val, best_test = 0.0, 0.0
    rng = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    for epoch in range(args.n_epoch):
        rng, step_rng = jax.random.split(rng)
        state, loss = train_step(state, step_rng)
        val_acc, test_acc = evaluate(state)
        if val_acc > best_val:
            best_val, best_test = float(val_acc), float(test_acc)
            save_checkpoint(args.best_model_path, state)
        if epoch % 10 == 0 or epoch == args.n_epoch - 1:
            print(f"epoch {epoch:4d} loss {float(loss):.4f} "
                  f"val {float(val_acc):.4f} test {float(test_acc):.4f}")
    dt = time.time() - t0
    print(f"done in {dt:.1f}s ({args.n_epoch / dt:.1f} epochs/s)")
    print(f"best val {best_val:.4f} -> test {best_test:.4f}")
    return best_test


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="cora")
    parser.add_argument("--dataset_path", type=str, default="data")
    parser.add_argument("--lr", type=float, default=0.01)
    parser.add_argument("--n_epoch", type=int, default=200)
    parser.add_argument("--hidden_dim", type=int, default=16)
    parser.add_argument("--drop_rate", type=float, default=0.5)
    parser.add_argument("--l2_coef", type=float, default=5e-4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--best_model_path", type=str,
                        default="/tmp/gcn_best.msgpack")
    main(parser.parse_args())
