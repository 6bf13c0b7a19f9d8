"""RGCN entity-classification trainer (reference: examples/rgcn flow on
Entities KGs). Falls back to a synthetic typed graph offline."""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from common import base_parser
from gammagl_tpu.models import RGCNModel
from gammagl_tpu.train import TrainState, accuracy, semi_supervised_loss


def load(args):
    try:
        from gammagl_tpu.datasets import Entities
        ds = Entities(root=args.dataset_path, name=args.dataset)
        g = ds[0]
        return g, int(g.num_relations)
    except Exception as e:
        print(f"[warn] entities unavailable ({e}); synthetic KG")
        rng = np.random.default_rng(0)
        n, e, r, c = 500, 4000, 8, 4
        from gammagl_tpu.data import Graph
        # learnable structure: relation type correlates with the class of
        # the destination node
        y = rng.integers(0, c, n)
        et = rng.integers(0, r, e)
        dst_class = et % c
        cand = [np.nonzero(y == k)[0] for k in range(c)]
        dst = np.array([rng.choice(cand[k]) for k in dst_class])
        g = Graph(edge_index=np.stack([rng.integers(0, n, e), dst]),
                  num_nodes=n)
        g.edge_type = et
        g.y = y
        mask = np.zeros(n, bool)
        mask[rng.permutation(n)[:n // 2]] = True
        g.train_mask, g.test_mask = mask, ~mask
        return g, r


def main(args):
    g, num_rel = load(args)
    n = g.num_nodes
    num_classes = int(np.asarray(g.y).max()) + 1
    # featureless entities: one-hot via embedding = identity features
    x = jnp.eye(n, args.feat_dim, dtype=jnp.float32)
    ei = jnp.asarray(np.asarray(g.edge_index))
    et = jnp.asarray(np.asarray(g.edge_type))
    y = jnp.asarray(np.asarray(g.y))
    train_mask = jnp.asarray(np.asarray(g.train_mask))
    test_mask = jnp.asarray(np.asarray(g.test_mask))

    model = RGCNModel(in_channels=args.feat_dim,
                      hidden_channels=args.hidden_dim,
                      num_class=num_classes, num_relations=num_rel,
                      num_bases=args.num_bases)
    params = model.init(jax.random.PRNGKey(args.seed), x, ei, et)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    # device data threaded as jit args (never close over device arrays)
    @jax.jit
    def step(state, x, ei, et, y, train_mask):
        def loss_fn(p):
            logits = model.apply(p, x, ei, et)
            return semi_supervised_loss(logits, y, train_mask), logits
        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss, logits

    for epoch in range(args.n_epoch):
        state, loss, logits = step(state, x, ei, et, y, train_mask)
        if epoch % 10 == 0:
            acc = accuracy(logits, y, test_mask)
            print(f"epoch {epoch:3d} loss {float(loss):.4f} "
                  f"test {float(acc):.4f}")
    acc = accuracy(jax.jit(model.apply)(state.params, x, ei, et), y,
                   test_mask)
    print(f"final test acc {float(acc):.4f}")
    return float(acc)


if __name__ == "__main__":
    parser = base_parser(dataset="aifb", n_epoch=50, lr=0.01,
                         hidden_dim=16)
    parser.add_argument("--num_bases", type=int, default=4)
    parser.add_argument("--feat_dim", type=int, default=64)
    main(parser.parse_args())
