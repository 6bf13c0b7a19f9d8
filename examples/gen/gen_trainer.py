"""GEN (graph structure estimation via EM) trainer.

Reference flow: examples/gen/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/gen/gen_trainer.py
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from examples.common import (base_parser, device_graph, linear_probe,
                             load_node_dataset, synthetic_hetero)
from gammagl_tpu.train import TrainState, accuracy, semi_supervised_loss
from gammagl_tpu.models import GCNModel, GEstimationN


def main(args):
    g, num_classes = load_node_dataset(args.dataset, args.dataset_path)
    d = device_graph(g)
    x, ei = d["x"], d["edge_index"]
    n = g.num_nodes
    model = GCNModel(hidden_dim=args.hidden_dim, num_class=num_classes,
                     drop_rate=0.0)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, x, ei)
    train_idx = np.nonzero(np.asarray(d["train_mask"]))[0]
    estimator = GEstimationN(n, num_classes, np.asarray(ei),
                             np.asarray(d["y"]), train_idx)

    # device data threaded as jit args, defined once outside the EM loop
    # (cur_ei changes size per iteration -> one recompile per new shape)
    @jax.jit
    def step(state, x, cur_ei, y, train_mask):
        loss, grads = jax.value_and_grad(
            lambda p: semi_supervised_loss(
                model.apply(p, x, cur_ei), y, train_mask))(state.params)
        return state.apply_gradients(grads), loss

    @jax.jit
    def infer(params, x, cur_ei):
        return model.apply(params, x, cur_ei)

    cur_ei = ei
    best = 0.0
    for it in range(args.iters):
        state = TrainState.create(params=params, tx=optax.adam(args.lr))

        for _ in range(args.n_epoch):
            state, loss = step(state, x, cur_ei, d["y"], d["train_mask"])
        params = state.params
        logits = infer(params, x, cur_ei)
        acc = float(accuracy(logits, d["y"], d["test_mask"]))
        best = max(best, acc)
        print(f"iter {it}: test acc {acc:.4f}")

        # EM re-estimation: observations = current graph + kNN graph
        pred = np.asarray(jnp.argmax(logits, 1))
        estimator.reset_obs()
        adj = np.zeros((n, n), np.int64)
        adj[np.asarray(cur_ei)[0], np.asarray(cur_ei)[1]] = 1
        estimator.update_obs(adj)
        xf = np.asarray(x)
        sim = xf @ xf.T
        nn_idx = np.argsort(-sim, axis=1)[:, 1:6]
        knn = np.zeros((n, n), np.int64)
        knn[np.repeat(np.arange(n), 5), nn_idx.reshape(-1)] = 1
        estimator.update_obs(knn)
        _, _, _, Q, iters = estimator.em(pred, seed=args.seed)
        new = np.stack(np.nonzero(Q > args.q_threshold))
        if new.shape[1] > 0:
            cur_ei = jnp.asarray(new)
        print(f"  EM {iters} iters, {new.shape[1]} edges")
    print(f"best test acc {best:.4f}")
    return best


if __name__ == "__main__":
    main(base_parser(hidden_dim=16, n_epoch=30, lr=0.01, iters=2, q_threshold=0.9).parse_args())
