"""GAT trainer (reference: examples/gat/gat_trainer.py).

Target (reference examples/gat/readme.md): Cora 82.4, Citeseer 70.9,
Pubmed 78.5 (torch backend numbers).
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from common import base_parser, device_graph, load_node_dataset
from gammagl_tpu.models import GATModel
from gammagl_tpu.train import (TrainState, accuracy, semi_supervised_loss)


def main(args):
    graph, num_classes = load_node_dataset(args.dataset, args.dataset_path)
    d = device_graph(graph)
    model = GATModel(hidden_dim=args.hidden_dim, num_class=num_classes,
                     heads=args.heads, drop_rate=args.drop_rate)
    key = jax.random.PRNGKey(args.seed)
    params = model.init({"params": key, "dropout": key}, d["x"],
                        d["edge_index"])
    tx = optax.chain(optax.add_decayed_weights(args.l2_coef),
                     optax.adam(args.lr))
    state = TrainState.create(params=params, tx=tx)

    @jax.jit
    def train_step(state, rng):
        def loss_fn(p):
            logits = model.apply(p, d["x"], d["edge_index"], train=True,
                                 rngs={"dropout": rng})
            return semi_supervised_loss(logits, d["y"], d["train_mask"])
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    @jax.jit
    def evaluate(state):
        logits = model.apply(state.params, d["x"], d["edge_index"])
        return (accuracy(logits, d["y"], d["val_mask"]),
                accuracy(logits, d["y"], d["test_mask"]))

    best_val, best_test = 0.0, 0.0
    rng = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(args.n_epoch):
        rng, step_rng = jax.random.split(rng)
        state, loss = train_step(state, step_rng)
        val_acc, test_acc = evaluate(state)
        if val_acc > best_val:
            best_val, best_test = float(val_acc), float(test_acc)
        if epoch % 20 == 0:
            print(f"epoch {epoch:4d} loss {float(loss):.4f} "
                  f"val {float(val_acc):.4f}")
    print(f"best val {best_val:.4f} -> test {best_test:.4f}")
    return best_test


if __name__ == "__main__":
    parser = base_parser(hidden_dim=8, drop_rate=0.6)
    parser.add_argument("--heads", type=int, default=8)
    main(parser.parse_args())
