"""SEAL (subgraph link prediction with DRNL labels) trainer.

Reference flow: examples/seal/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/seal/seal_trainer.py
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
from gammagl_tpu.models import SEALModel, drnl_node_labeling


def main(args):
    g, _ = load_node_dataset(args.dataset, args.dataset_path)
    ei = np.asarray(g.edge_index)
    n = g.num_nodes
    rng = np.random.default_rng(args.seed)

    def subgraph_batch(batch_size):
        """Enclosing 1-hop subgraphs around pos/neg links, DRNL-labeled,
        disjoint-batched (reference examples/seal/)."""
        xs, eis, batch, ys = [], [], [], []
        off = 0
        adj = [set() for _ in range(n)]
        for s, d in ei.T:
            adj[s].add(int(d)); adj[d].add(int(s))
        for i in range(batch_size):
            if i % 2 == 0:
                e = ei[:, rng.integers(0, ei.shape[1])]
            else:
                e = rng.integers(0, n, 2)
            u, v = int(e[0]), int(e[1])
            nodes = sorted({u, v} | set(list(adj[u])[:8])
                           | set(list(adj[v])[:8]))
            local = {m: j for j, m in enumerate(nodes)}
            sub = [(local[a], local[b]) for a in nodes
                   for b in adj[a] if b in local]
            sub_ei = (np.asarray(sub).T if sub
                      else np.zeros((2, 0), np.int64))
            labels = drnl_node_labeling(sub_ei, len(nodes),
                                        local[u], local[v])
            xs.append(labels)
            eis.append(sub_ei + off)
            batch.extend([i] * len(nodes))
            ys.append(1 - i % 2)
            off += len(nodes)
        # pad to STATIC shapes so every batch reuses one jit compile
        # (variable subgraph sizes would otherwise recompile per batch):
        # padded nodes are isolated self-loops assigned to segment id
        # `batch_size`, which jax segment ops drop as out-of-range
        node_cap, edge_cap = batch_size * 24, batch_size * 160
        labels_cat = np.concatenate(xs)[:node_cap]
        ei_cat = np.concatenate(eis, axis=1)
        ei_cat = ei_cat[:, (ei_cat < node_cap).all(0)][:, :edge_cap]
        batch_cat = np.asarray(batch)[:node_cap]
        pad_n = node_cap - len(labels_cat)
        pad_e = edge_cap - ei_cat.shape[1]
        labels_cat = np.concatenate(
            [labels_cat, np.zeros(pad_n, labels_cat.dtype)])
        batch_cat = np.concatenate(
            [batch_cat, np.full(pad_n, batch_size, batch_cat.dtype)])
        ei_cat = np.concatenate(
            [ei_cat, np.full((2, pad_e), node_cap - 1, ei_cat.dtype)],
            axis=1)
        return (jnp.asarray(labels_cat), jnp.asarray(ei_cat),
                jnp.asarray(batch_cat),
                jnp.asarray(np.asarray(ys)), batch_size)

    labels, sei, batch, y, ng = subgraph_batch(args.batch_size)
    model = SEALModel(hidden_dim=args.hidden_dim, k=6)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, labels, sei, None, batch, ng)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    def step(state, labels, sei, batch, y, ng):
        def loss_fn(p):
            logits = model.apply(p, labels, sei, None, batch, ng)
            return optax.sigmoid_binary_cross_entropy(
                logits[:, 0], y.astype(jnp.float32)).mean()
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    for epoch in range(args.n_epoch):
        labels, sei, batch, y, ng = subgraph_batch(args.batch_size)
        state, loss = step(state, labels, sei, batch, y, ng)
        print(f"epoch {epoch:3d} loss {float(loss):.4f}")

    # link-prediction AUC on held-out batches (the reference's readme
    # metric, examples/seal/readme.md)
    from examples.common import binary_auc
    scores, ys = [], []
    for _ in range(8):
        labels, sei, batch, y, ng = subgraph_batch(args.batch_size)
        logits = model.apply(state.params, labels, sei, None, batch, ng)
        scores.append(np.asarray(logits)[:, 0])
        ys.append(np.asarray(y))
    auc = binary_auc(np.concatenate(scores), np.concatenate(ys))
    print(f"link-pred AUC {auc:.4f}")
    return auc


if __name__ == "__main__":
    main(base_parser(hidden_dim=16, n_epoch=5, lr=0.005, batch_size=16).parse_args())
