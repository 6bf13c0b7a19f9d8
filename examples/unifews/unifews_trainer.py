"""UniFews (unified entry-wise sparsification) trainer.

Reference flow: examples/unifews/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/unifews/unifews_trainer.py
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
from gammagl_tpu.models import GCNUniFews
from gammagl_tpu.utils import UniFewsLogger, Stopwatch, prune_params, sparsity


def main(args):
    g, num_classes = load_node_dataset(args.dataset, args.dataset_path)
    d = device_graph(g)
    x, ei = d["x"], d["edge_index"]
    model = GCNUniFews(num_class=num_classes, hidden_dim=args.hidden_dim,
                       edge_thr=args.edge_thr)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, x, ei)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))
    logger = UniFewsLogger(args.dataset, "gcn_unifews",
                           dir_base="/tmp/unifews_log")

    # device data threaded as jit args (never close over device arrays)
    @jax.jit
    def step(state, x, ei, y, train_mask):
        loss, grads = jax.value_and_grad(
            lambda p: semi_supervised_loss(model.apply(p, x, ei),
                                           y, train_mask))(state.params)
        return state.apply_gradients(grads), loss

    sw = Stopwatch(); sw.start()
    for epoch in range(args.n_epoch):
        state, loss = step(state, x, ei, d["y"], d["train_mask"])
    t_train = sw.pause()
    # weight pruning pass (reference UniFews prunes weights entry-wise)
    pruned, masks = prune_params(state.params, args.weight_thr)
    acc = float(accuracy(jax.jit(model.apply)(pruned, x, ei), d["y"],
                         d["test_mask"]))
    sp = sparsity(masks)
    hs, cs = logger.str_csv(args.dataset, "gcn_unifews", args.seed,
                            args.edge_thr, args.weight_thr, acc,
                            args.n_epoch, args.n_epoch, t_train, 0.0,
                            0.0, 0.0, 1.0, sp)
    logger.print_header(hs, cs)
    print(f"test acc {acc:.4f} (weight sparsity {sp:.2%})")
    return acc


if __name__ == "__main__":
    main(base_parser(hidden_dim=16, n_epoch=40, lr=0.01, edge_thr=0.05, weight_thr=0.01).parse_args())
