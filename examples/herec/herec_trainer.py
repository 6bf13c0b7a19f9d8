"""HERec trainer: metapath-constrained walks -> skip-gram -> fusion.

Reference flow: examples/herec/herec_trainer.py (movielens HIN).
Synthetic typed graph fallback.

Usage: python examples/herec/herec_trainer.py
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from examples.common import base_parser, synthetic_hetero
from gammagl_tpu.models import Node2Vec, herec
from gammagl_tpu.train import TrainState


def _metapath_embedding(ei, n, args):
    model = Node2Vec(num_nodes=n, embedding_dim=args.hidden_dim,
                     walk_length=5)
    loader = model.make_loader(ei, batch_size=128, seed=args.seed)
    pos, neg = next(iter(loader))
    params = model.init(jax.random.PRNGKey(args.seed), jnp.asarray(pos),
                        jnp.asarray(neg))
    state = TrainState.create(params=params, tx=optax.adam(0.01))

    @jax.jit
    def step(state, pos, neg):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply(p, pos, neg))(state.params)
        return state.apply_gradients(grads), loss

    for _ in range(args.n_epoch):
        for pos, neg in loader:
            state, _ = step(state, jnp.asarray(pos), jnp.asarray(neg))
    return np.asarray(model.apply(state.params))


def main(args):
    from examples.common import linear_probe
    hg, target = synthetic_hetero()
    n = hg["movie"].x.shape[0]
    # one embedding per metapath graph, fused HERec-style
    embs = [_metapath_embedding(
        np.asarray(hg[("movie", "mdm", "movie")].edge_index), n, args)]
    fused = herec(embs)
    print("HERec fused embeddings:", fused.shape)

    # node-classification probe on the fused embeddings (the reference's
    # readme metric: micro-F1 on AMiner/IMDB/DBLP labels)
    y = np.asarray(hg["movie"].y)
    d = {"y": jnp.asarray(y),
         "train_mask": jnp.asarray(np.asarray(hg["movie"].train_mask)),
         "test_mask": jnp.asarray(np.asarray(hg["movie"].test_mask))}
    acc = linear_probe(jnp.asarray(fused), d, int(y.max()) + 1)
    print(f"probe test acc {acc:.4f}")
    return acc


if __name__ == "__main__":
    main(base_parser(hidden_dim=64, n_epoch=3).parse_args())
