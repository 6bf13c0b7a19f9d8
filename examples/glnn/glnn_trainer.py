"""GLNN (GNN-to-MLP distillation) trainer.

Reference flow: examples/glnn/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/glnn/glnn_trainer.py
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
from gammagl_tpu.models import GCNModel, GLNNStudent, distill_loss


def main(args):
    g, num_classes = load_node_dataset(args.dataset, args.dataset_path)
    d = device_graph(g)
    x, ei = d["x"], d["edge_index"]
    # 1) teacher GNN
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
    t_acc = float(accuracy(t_logits, d["y"], d["test_mask"]))

    # 2) distill into a structure-free MLP student
    student = GLNNStudent(hidden_dim=args.hidden_dim,
                          num_class=num_classes, drop_rate=0.0)
    sparams = student.init(key, x)
    sstate = TrainState.create(params=sparams, tx=optax.adam(args.lr))

    @jax.jit
    def s_step(state, x, t_logits, y, train_mask):
        def loss_fn(p):
            return distill_loss(student.apply(p, x), t_logits, y,
                                train_mask, lam=0.5)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    for epoch in range(args.n_epoch * 2):
        sstate, loss = s_step(sstate, x, t_logits, d["y"],
                              d["train_mask"])
    s_acc = float(accuracy(jax.jit(student.apply)(sstate.params, x),
                           d["y"], d["test_mask"]))
    print(f"teacher acc {t_acc:.4f} -> student (no graph!) acc {s_acc:.4f}")
    return s_acc


if __name__ == "__main__":
    main(base_parser(hidden_dim=16, n_epoch=40, lr=0.005).parse_args())
