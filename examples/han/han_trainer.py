"""HAN trainer on a typed graph (reference: examples/han/han_trainer.py on
IMDB). Falls back to a synthetic typed graph offline."""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from common import base_parser
from gammagl_tpu.models import HANModel
from gammagl_tpu.train import TrainState, accuracy, semi_supervised_loss


def load(args):
    try:
        from gammagl_tpu.datasets import IMDB
        hg = (IMDB(root=args.dataset_path))[0]
        target = "movie"
        return hg, target
    except Exception as e:
        print(f"[warn] IMDB unavailable ({e}); synthetic typed graph")
        from gammagl_tpu.data import HeteroGraph
        rng = np.random.default_rng(0)
        n_m, n_d, c = 200, 60, 3
        hg = HeteroGraph()
        y = rng.integers(0, c, n_m)
        x = rng.normal(size=(n_m, 32)).astype(np.float32)
        x[np.arange(n_m), y] += 2.0  # learnable signal
        hg["movie"].x = x
        hg["movie"].y = y
        hg["director"].x = rng.normal(size=(n_d, 32)).astype(np.float32)
        # movies of the same class share directors
        d_of = rng.integers(0, n_d // c, n_m) + (n_d // c) * y
        hg[("director", "directs", "movie")].edge_index = np.stack(
            [d_of, np.arange(n_m)])
        hg[("movie", "by", "director")].edge_index = np.stack(
            [np.arange(n_m), d_of])
        # metapath movie-director-movie
        mdm = []
        for d in range(n_d):
            ms = np.nonzero(d_of == d)[0]
            for a in ms:
                for b in ms:
                    mdm.append((a, b))
        hg[("movie", "mdm", "movie")].edge_index = np.asarray(mdm).T
        mask = np.zeros(n_m, bool)
        mask[rng.permutation(n_m)[:n_m // 2]] = True
        hg["movie"].train_mask = mask
        hg["movie"].test_mask = ~mask
        return hg, "movie"


def main(args):
    hg, target = load(args)
    hg = hg.tensor()
    x_dict = hg.x_dict
    ei_dict = hg.edge_index_dict
    y = jnp.asarray(np.asarray(hg[target].y))
    num_classes = int(np.asarray(y).max()) + 1
    train_mask = jnp.asarray(np.asarray(hg[target].train_mask))
    test_mask = jnp.asarray(np.asarray(hg[target].test_mask))

    model = HANModel(metadata=hg.metadata(),
                     hidden_channels=args.hidden_dim,
                     num_class=num_classes, target_ntype=target,
                     heads=args.heads, drop_rate=args.drop_rate)
    key = jax.random.PRNGKey(args.seed)
    params = model.init({"params": key, "dropout": key}, x_dict, ei_dict)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    # device data threaded as jit args (never close over device arrays)
    @jax.jit
    def step(state, rng, x_dict, ei_dict, y, train_mask):
        def loss_fn(p):
            logits = model.apply(p, x_dict, ei_dict, train=True,
                                 rngs={"dropout": rng})
            return semi_supervised_loss(logits, y, train_mask), logits
        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss, logits

    @jax.jit
    def infer(state, x_dict, ei_dict):
        return model.apply(state.params, x_dict, ei_dict)

    rng = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(args.n_epoch):
        rng, k = jax.random.split(rng)
        state, loss, logits = step(state, k, x_dict, ei_dict, y,
                                   train_mask)
        if epoch % 10 == 0:
            acc = accuracy(infer(state, x_dict, ei_dict), y, test_mask)
            print(f"epoch {epoch:3d} loss {float(loss):.4f} "
                  f"test {float(acc):.4f}")
    acc = accuracy(infer(state, x_dict, ei_dict), y, test_mask)
    print(f"final test acc {float(acc):.4f}")
    return float(acc)


if __name__ == "__main__":
    parser = base_parser(hidden_dim=16, n_epoch=50, lr=0.005,
                         drop_rate=0.4)
    parser.add_argument("--heads", type=int, default=4)
    main(parser.parse_args())
