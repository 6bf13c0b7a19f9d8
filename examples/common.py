"""Shared example-trainer utilities: dataset loading with synthetic
fallback, argparse defaults, train loop helpers."""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def load_node_dataset(name, path="data"):
    """Planetoid-style node-classification graph; synthetic SBM fallback
    when downloads are unavailable."""
    if name in ("cora", "citeseer", "pubmed"):
        try:
            from gammagl_tpu.datasets import Planetoid
            ds = Planetoid(root=path, name=name)
            return ds[0], ds.num_classes
        except Exception as e:
            print(f"[warn] {name} unavailable ({e}); using synthetic graph")
    from gammagl_tpu.datasets import synthetic_community_graph
    g = synthetic_community_graph(1000, 7, 128, avg_degree=8, seed=0)
    return g, 7


def base_parser(**overrides):
    parser = argparse.ArgumentParser()
    defaults = {
        "dataset": "cora", "dataset_path": "data", "lr": 0.01,
        "n_epoch": 200, "hidden_dim": 16, "drop_rate": 0.5,
        "l2_coef": 5e-4, "seed": 0,
    }
    defaults.update(overrides)
    for k, v in defaults.items():
        parser.add_argument(f"--{k}", type=type(v), default=v)
    return parser


def device_graph(g):
    """Move the standard fields to device with self-loops added."""
    from gammagl_tpu.utils import add_self_loops
    ei, _ = add_self_loops(np.asarray(g.edge_index), num_nodes=g.num_nodes)
    return {
        "x": jnp.asarray(g.x),
        "edge_index": jnp.asarray(ei),
        "y": jnp.asarray(np.asarray(g.y)),
        "train_mask": jnp.asarray(np.asarray(g.train_mask).reshape(
            np.asarray(g.train_mask).shape[0], -1)[:, 0]),
        "val_mask": jnp.asarray(np.asarray(g.val_mask).reshape(
            np.asarray(g.val_mask).shape[0], -1)[:, 0]),
        "test_mask": jnp.asarray(np.asarray(g.test_mask)),
    }


def run_simple_node_trainer(model, args, forward_kwargs=None,
                            loss_extra=None):
    """Standard semi-supervised node-classification loop shared by the
    simple full-batch trainers (reference examples/<model>/*_trainer.py all
    follow this flow: dataset -> model -> Adam CE -> best-val test acc)."""
    import optax
    from gammagl_tpu.train import (TrainState, semi_supervised_loss,
                                   accuracy)

    g, num_classes = load_node_dataset(args.dataset, args.dataset_path)
    d = device_graph(g)
    x, ei, y = d["x"], d["edge_index"], d["y"]
    fkw = forward_kwargs or {}

    key = jax.random.PRNGKey(args.seed)
    params = model.init({"params": key, "dropout": key}, x, ei, **fkw)
    tx = optax.chain(optax.add_decayed_weights(args.l2_coef),
                     optax.adam(args.lr))
    state = TrainState.create(params=params, tx=tx)

    @jax.jit
    def train_step(state, rng):
        def loss_fn(p):
            logits = model.apply(p, x, ei, train=True,
                                 rngs={"dropout": rng}, **fkw)
            loss = semi_supervised_loss(logits, y, d["train_mask"])
            if loss_extra is not None:
                loss = loss + loss_extra(p)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    @jax.jit
    def evaluate(state):
        logits = model.apply(state.params, x, ei, **fkw)
        return (accuracy(logits, y, d["val_mask"]),
                accuracy(logits, y, d["test_mask"]))

    best_val, best_test = 0.0, 0.0
    rng = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(args.n_epoch):
        rng, sk = jax.random.split(rng)
        state, loss = train_step(state, sk)
        val_acc, test_acc = evaluate(state)
        if float(val_acc) > best_val:
            best_val, best_test = float(val_acc), float(test_acc)
        if epoch % 20 == 0 or epoch == args.n_epoch - 1:
            print(f"epoch {epoch:4d} loss {float(loss):.4f} "
                  f"val {float(val_acc):.4f} test {float(test_acc):.4f}")
    print(f"best val {best_val:.4f} -> test {best_test:.4f}")
    return best_test
