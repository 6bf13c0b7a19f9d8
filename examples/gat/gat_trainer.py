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

from common import (base_parser, device_graph, load_node_dataset,
                    run_epoch_loop)
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

    # graph dict threaded as a jit ARGUMENT (never close over device
    # arrays); epochs run in chunked lax.scan via run_epoch_loop.
    def train_step(state, rng, d):
        def loss_fn(p):
            logits = model.apply(p, d["x"], d["edge_index"], train=True,
                                 rngs={"dropout": rng})
            return semi_supervised_loss(logits, d["y"], d["train_mask"])
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    def evaluate(state, d):
        logits = model.apply(state.params, d["x"], d["edge_index"])
        return (accuracy(logits, d["y"], d["val_mask"]),
                accuracy(logits, d["y"], d["test_mask"]))

    rng = jax.random.PRNGKey(args.seed + 1)
    _, _, best_test = run_epoch_loop(state, rng, d, train_step, evaluate,
                                     args.n_epoch)
    return best_test


if __name__ == "__main__":
    parser = base_parser(hidden_dim=8, drop_rate=0.6)
    parser.add_argument("--heads", type=int, default=8)
    main(parser.parse_args())
