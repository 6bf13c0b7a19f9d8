"""NodeID (vector-quantized structural node identifiers) trainer.

Reference flow: examples/nodeid/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/nodeid/nodeid_trainer.py
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
from gammagl_tpu.models import NodeIDModel


def main(args):
    g, num_classes = load_node_dataset(args.dataset, args.dataset_path)
    d = device_graph(g)
    x, ei = d["x"], d["edge_index"]
    model = NodeIDModel(in_channels=x.shape[1],
                        hidden_channels=args.hidden_dim,
                        out_channels=num_classes,
                        num_codes=32)
    key = jax.random.PRNGKey(args.seed)
    variables = model.init(key, x, ei)
    params, vq_stats = variables["params"], variables["vq_stats"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    # device data threaded as jit args (never close over device arrays)
    @jax.jit
    def step(params, vq_stats, opt_state, x, ei, y, train_mask):
        def loss_fn(p):
            (logits, commit, ids, gnn_id), new_stats = model.apply(
                {"params": p, "vq_stats": vq_stats}, x, ei, train=True,
                mutable=["vq_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            loss = semi_supervised_loss(logits, y, train_mask)
            return loss + 0.25 * commit, new_stats
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return (optax.apply_updates(params, updates),
                new_stats["vq_stats"], opt_state, loss)

    @jax.jit
    def infer(params, vq_stats, x, ei):
        return model.apply({"params": params, "vq_stats": vq_stats}, x, ei)

    for epoch in range(args.n_epoch):
        params, vq_stats, opt_state, loss = step(
            params, vq_stats, opt_state, x, ei, d["y"], d["train_mask"])
        if epoch % 10 == 0:
            logits, commit, ids, gnn_id = infer(params, vq_stats, x, ei)
            acc = accuracy(logits, d["y"], d["test_mask"])
            print(f"epoch {epoch:3d} loss {float(loss):.4f} "
                  f"test {float(acc):.4f}")
    logits, commit, ids, gnn_id = infer(params, vq_stats, x, ei)
    acc = float(accuracy(logits, d["y"], d["test_mask"]))
    print(f"final test acc {acc:.4f}")
    return acc


if __name__ == "__main__":
    main(base_parser(hidden_dim=16, n_epoch=40, lr=0.005).parse_args())
