"""HeCo (network-schema vs metapath co-contrast) trainer.

Reference flow: examples/heco/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/heco/heco_trainer.py
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
from gammagl_tpu.models import HeCoModel


def main(args):
    hg, target = synthetic_hetero()
    hgt = hg.tensor()
    x_dict = {"movie": hgt["movie"].x, "director": hgt["director"].x}
    ei_dict = {("director", "directs", "movie"):
               hgt[("director", "directs", "movie")].edge_index}
    metadata = (["movie", "director"],
                [("director", "directs", "movie")])
    mp_edges = [hgt[("movie", "mdm", "movie")].edge_index]
    n_m = x_dict["movie"].shape[0]
    # positives: same-class pairs via the metapath graph
    mdm = np.asarray(hg[("movie", "mdm", "movie")].edge_index)
    pos = np.eye(n_m, dtype=bool)
    pos[mdm[0], mdm[1]] = True
    pos = jnp.asarray(pos)

    model = HeCoModel(metadata=metadata, target_ntype="movie",
                      hidden_dim=args.hidden_dim, feat_drop=0.0)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, x_dict, ei_dict, mp_edges, pos)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    # device data threaded as jit args (never close over device arrays)
    @jax.jit
    def step(state, x_dict, ei_dict, mp_edges, pos):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply(p, x_dict, ei_dict, mp_edges, pos))(
            state.params)
        return state.apply_gradients(grads), loss

    for epoch in range(args.n_epoch):
        state, loss = step(state, x_dict, ei_dict, mp_edges, pos)
        if epoch % 10 == 0:
            print(f"pretrain {epoch:3d} loss {float(loss):.4f}")
    emb = jax.jit(model.apply)(state.params, x_dict, ei_dict, mp_edges)
    d = {"y": jnp.asarray(np.asarray(hg["movie"].y)),
         "train_mask": jnp.asarray(np.asarray(hg["movie"].train_mask)),
         "test_mask": jnp.asarray(np.asarray(hg["movie"].test_mask))}
    acc = linear_probe(emb, d, int(np.asarray(d["y"]).max()) + 1)
    print(f"probe test acc {acc:.4f}")
    return acc


if __name__ == "__main__":
    main(base_parser(hidden_dim=64, n_epoch=30, lr=0.005).parse_args())
