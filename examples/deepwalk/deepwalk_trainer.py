"""DeepWalk trainer: uniform random-walk skip-gram embeddings + probe.

Reference flow: examples/deepwalk/deepwalk_trainer.py (walks -> skip-gram
negative sampling -> logistic probe).

Usage: python examples/deepwalk/deepwalk_trainer.py --dataset cora
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from examples.common import (base_parser, device_graph, linear_probe,
                             load_node_dataset)
from gammagl_tpu.models import DeepWalk
from gammagl_tpu.train import TrainState


def main(args, model_cls=DeepWalk, **model_kw):
    g, num_classes = load_node_dataset(args.dataset, args.dataset_path)
    d = device_graph(g)
    ei = np.asarray(g.edge_index)
    model = model_cls(num_nodes=g.num_nodes, embedding_dim=args.hidden_dim,
                      walk_length=10, **model_kw)
    loader = model.make_loader(ei, batch_size=args.batch_size, seed=args.seed)
    pos, neg = next(iter(loader))
    params = model.init(jax.random.PRNGKey(args.seed), jnp.asarray(pos),
                        jnp.asarray(neg))
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    @jax.jit
    def step(state, pos, neg):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply(p, pos, neg))(state.params)
        return state.apply_gradients(grads), loss

    for epoch in range(args.n_epoch):
        for pos, neg in loader:
            state, loss = step(state, jnp.asarray(pos), jnp.asarray(neg))
        print(f"epoch {epoch:3d} loss {float(loss):.4f}")

    emb = model.apply(state.params)
    acc = linear_probe(jnp.asarray(emb), d, num_classes)
    print(f"probe test acc {acc:.4f}")
    return acc


if __name__ == "__main__":
    parser = base_parser(hidden_dim=128, n_epoch=5, lr=0.01)
    parser.add_argument("--batch_size", type=int, default=256)
    main(parser.parse_args())
