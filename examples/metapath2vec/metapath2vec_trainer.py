"""MetaPath2Vec trainer: typed walks over a metapath + skip-gram.

Reference flow: examples/metapath2vec/metapath2vec_trainer.py (AMiner).
Synthetic typed graph fallback.

Usage: python examples/metapath2vec/metapath2vec_trainer.py
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from examples.common import base_parser, synthetic_hetero
from gammagl_tpu.models import MetaPath2Vec
from gammagl_tpu.train import TrainState


def main(args):
    hg, target = synthetic_hetero()
    ei_dict = {k: np.asarray(v) for k, v in hg.edge_index_dict.items()}
    n_dict = {"movie": hg["movie"].x.shape[0],
              "director": hg["director"].x.shape[0]}
    metapath = (("movie", "by", "director"),
                ("director", "directs", "movie"))
    model = MetaPath2Vec(num_nodes_dict=n_dict, metapath=metapath,
                         embedding_dim=args.hidden_dim, walk_length=4)
    rng = np.random.default_rng(args.seed)
    total = sum(n_dict.values())

    params = None
    state = None
    step = None
    for epoch in range(args.n_epoch):
        starts = rng.integers(0, n_dict["movie"], 128)
        walks = model.sample_walks(ei_dict, starts, rng=rng)
        neg = rng.integers(0, total, (walks.shape[0], 1, walks.shape[1]))
        walks, neg = jnp.asarray(walks), jnp.asarray(neg)
        if params is None:
            params = model.init(jax.random.PRNGKey(args.seed), walks, neg)
            state = TrainState.create(params=params,
                                      tx=optax.adam(args.lr))

            @jax.jit
            def step(state, walks, neg):
                loss, grads = jax.value_and_grad(
                    lambda p: model.apply(p, walks, neg))(state.params)
                return state.apply_gradients(grads), loss

        state, loss = step(state, walks, neg)
        print(f"epoch {epoch:3d} loss {float(loss):.4f}")
    emb = model.apply(state.params)
    print("embeddings:", np.asarray(emb).shape)

    # node-classification probe on movie embeddings (reference readme
    # metric: micro-F1 on AMiner/IMDB/DBLP)
    from examples.common import linear_probe
    y = np.asarray(hg["movie"].y)
    d = {"y": jnp.asarray(y),
         "train_mask": jnp.asarray(np.asarray(hg["movie"].train_mask)),
         "test_mask": jnp.asarray(np.asarray(hg["movie"].test_mask))}
    lo = model.offsets["movie"]
    movie_emb = jnp.asarray(np.asarray(emb)[lo:lo + n_dict["movie"]])
    acc = linear_probe(movie_emb, d, int(y.max()) + 1)
    print(f"probe test acc {acc:.4f}")
    return acc


if __name__ == "__main__":
    main(base_parser(hidden_dim=64, n_epoch=5, lr=0.01).parse_args())
