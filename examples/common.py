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
