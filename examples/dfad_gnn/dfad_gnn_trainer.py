"""DFAD-GNN (data-free adversarial distillation) trainer.

Reference flow: examples/dfad_gnn/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/dfad_gnn/dfad_gnn_trainer.py
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
from gammagl_tpu.models import (GCNModel, GLNNStudent, GraphEditer,
                                dfad_generator_loss, dfad_student_loss)


def main(args):
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

    # data-free: a generator perturbs features; student matches teacher on
    # generated data, generator maximizes disagreement (reference dfad_gnn)
    student = GLNNStudent(hidden_dim=args.hidden_dim,
                          num_class=num_classes, drop_rate=0.0)
    sparams = student.init(key, x)
    gen = GraphEditer(num_features=x.shape[1])
    gparams = gen.init(key, x)
    s_tx, g_tx = optax.adam(args.lr), optax.adam(args.lr)
    s_opt, g_opt = s_tx.init(sparams), g_tx.init(gparams)

    @jax.jit
    def s_step(sparams, gparams, tparams, s_opt, x, ei):
        xg = gen.apply(gparams, x)
        tg = jax.lax.stop_gradient(teacher.apply(tparams, xg, ei))
        loss, grads = jax.value_and_grad(
            lambda p: dfad_student_loss(student.apply(p, xg), tg))(sparams)
        updates, s_opt = s_tx.update(grads, s_opt)
        return optax.apply_updates(sparams, updates), s_opt, loss

    @jax.jit
    def g_step(sparams, gparams, tparams, g_opt, x, ei):
        def loss_fn(gp):
            xg = gen.apply(gp, x)
            tg = teacher.apply(tparams, xg, ei)
            return dfad_generator_loss(student.apply(sparams, xg), tg)
        loss, grads = jax.value_and_grad(loss_fn)(gparams)
        updates, g_opt = g_tx.update(grads, g_opt)
        return optax.apply_updates(gparams, updates), g_opt, loss

    for epoch in range(args.n_epoch):
        sparams, s_opt, s_loss = s_step(sparams, gparams, tstate.params,
                                        s_opt, x, ei)
        gparams, g_opt, g_loss = g_step(sparams, gparams, tstate.params,
                                        g_opt, x, ei)
        if epoch % 10 == 0:
            print(f"epoch {epoch:3d} student {float(s_loss):.4f} "
                  f"generator {float(g_loss):.4f}")
    acc = float(accuracy(student.apply(sparams, x), d["y"],
                         d["test_mask"]))
    print(f"data-free student acc {acc:.4f}")
    return acc


if __name__ == "__main__":
    main(base_parser(hidden_dim=16, n_epoch=40, lr=0.005).parse_args())
