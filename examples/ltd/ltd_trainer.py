"""LTD (learning-to-distill temperature per node) trainer.

Reference flow: examples/ltd/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/ltd/ltd_trainer.py
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
from gammagl_tpu.models import GCNModel, GLNNStudent


def main(args):
    # LTD = GLNN with a learnable per-node distillation temperature
    # (reference examples/ltd/): reuse the GLNN pipeline with tempered
    # teacher logits.
    g, num_classes = load_node_dataset(args.dataset, args.dataset_path)
    d = device_graph(g)
    x, ei = d["x"], d["edge_index"]
    teacher = GCNModel(hidden_dim=args.hidden_dim, num_class=num_classes,
                       drop_rate=0.0)
    key = jax.random.PRNGKey(args.seed)
    tparams = teacher.init(key, x, ei)
    tstate = TrainState.create(params=tparams, tx=optax.adam(args.lr))

    # device data threaded as jit args (never close over device arrays)
    @jax.jit
    def t_step(state, x, ei, y, train_mask):
        loss, grads = jax.value_and_grad(
            lambda p: semi_supervised_loss(teacher.apply(p, x, ei),
                                           y, train_mask))(state.params)
        return state.apply_gradients(grads), loss

    for _ in range(args.n_epoch):
        tstate, _ = t_step(tstate, x, ei, d["y"], d["train_mask"])
    t_logits = jax.jit(teacher.apply)(tstate.params, x, ei)

    student = GLNNStudent(hidden_dim=args.hidden_dim,
                          num_class=num_classes, drop_rate=0.0)
    sparams = {"student": student.init(key, x),
               "log_temp": jnp.zeros((x.shape[0], 1))}
    tx = optax.adam(args.lr)
    opt_state = tx.init(sparams)

    @jax.jit
    def s_step(params, opt_state, x, t_logits, y, train_mask):
        def loss_fn(ps):
            temp = jnp.exp(ps["log_temp"])
            soft = jax.nn.softmax(t_logits / temp)
            logits = student.apply(ps["student"], x)
            kd = optax.softmax_cross_entropy(logits / temp, soft).mean()
            ce = semi_supervised_loss(logits, y, train_mask)
            return 0.5 * ce + 0.5 * kd
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(args.n_epoch * 2):
        sparams, opt_state, loss = s_step(sparams, opt_state, x, t_logits,
                                          d["y"], d["train_mask"])
    acc = float(accuracy(jax.jit(student.apply)(sparams["student"], x),
                         d["y"], d["test_mask"]))
    print(f"LTD student acc {acc:.4f}")
    return acc


if __name__ == "__main__":
    main(base_parser(hidden_dim=16, n_epoch=40, lr=0.005).parse_args())
