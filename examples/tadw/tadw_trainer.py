"""TADW trainer: text-associated DeepWalk via alternating least squares.

Reference flow: examples/tadw/tadw_trainer.py (adjacency + text features ->
low-rank factorization -> probe).

Usage: python examples/tadw/tadw_trainer.py --dataset cora
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import numpy as np
import jax.numpy as jnp

from examples.common import base_parser, device_graph, linear_probe, \
    load_node_dataset
from gammagl_tpu.models import tadw


def main(args):
    g, num_classes = load_node_dataset(args.dataset, args.dataset_path)
    d = device_graph(g)
    n = g.num_nodes
    adj = np.zeros((n, n), np.float32)
    ei = np.asarray(g.edge_index)
    adj[ei[0], ei[1]] = 1.0
    text = np.asarray(g.x, np.float32)
    # SVD-reduce text features like the reference (200 dims)
    if text.shape[1] > 200:
        u, s, _ = np.linalg.svd(text, full_matrices=False)
        text = u[:, :200] * s[:200]
    emb = tadw(adj, text, dim=args.hidden_dim, iters=args.n_epoch)
    acc = linear_probe(jnp.asarray(emb), d, num_classes)
    print(f"probe test acc {acc:.4f}")
    return acc


if __name__ == "__main__":
    main(base_parser(hidden_dim=80, n_epoch=20).parse_args())
