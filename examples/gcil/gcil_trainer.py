"""GCIL (graph contrastive invariant learning) trainer: two-view
contrastive pretraining + linear probe.

Reference flow: examples/gcil/gcil_trainer.py (two augmented views ->
VICReg-style invariance/decorrelation loss -> frozen-embedding logistic
probe). The reference ships REAL Planetoid adjacency perturbations in
examples/gcil/dataset/<name>/0.01_1_{1..9}.npz (cora: 13,264 nnz = the
clean cora+self-loop edge set, 1% perturbed) — with --real_structure
(default) the two contrastive views are two of these real perturbed
graphs each epoch, exactly the paper's spectral-perturbation
augmentation, with feature dropout on structure-derived features
(no Planetoid feature/label files exist offline, so probe accuracies are
not comparable to the readme table; structure is genuine).

Falls back to random edge/feature dropping on the synthetic SBM graph.

Usage: python examples/gcil/gcil_trainer.py --dataset cora
"""

import glob
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from examples.common import (base_parser, linear_probe, load_sparse_npz,
                             run_two_view_ssl, structure_node_data)
from gammagl_tpu.models import GCILModel, drop_edge_and_feature
from gammagl_tpu.train import TrainState

REF_GCIL = "/root/reference/examples/gcil/dataset"


def _real_views(name):
    files = sorted(glob.glob(osp.join(REF_GCIL, name, "0.01_1_*.npz")))
    views = []
    n = None
    for f in files:
        ei, fn = load_sparse_npz(f)
        if ei.shape[1] == 0:  # 0.01_1_0.npz is an empty residue file
            continue
        assert n is None or n == fn
        n = fn
        views.append(ei)
    return (views, n) if len(views) >= 2 else (None, None)


def _main_real(args, views, n):
    x, y, train_mask, val_mask, test_mask = structure_node_data(
        views[0], n, seed=args.seed)
    df1 = getattr(args, "drop_feature_rate_1", 0.2)
    df2 = getattr(args, "drop_feature_rate_2", 0.2)
    model = GCILModel(hidden_dim=args.hidden_dim)

    x = jnp.asarray(x)
    eis = [jnp.asarray(v) for v in views]
    key = jax.random.PRNGKey(args.seed)
    w1 = jnp.ones(eis[0].shape[1], jnp.float32)
    params = model.init(key, x, eis[0], w1, x, eis[1 % len(eis)], w1)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    @jax.jit
    def step(state, rng, x, ei_a, ei_b):
        ka, kb = jax.random.split(rng)
        xa = x * (jax.random.uniform(ka, (1, x.shape[1])) > df1)
        xb = x * (jax.random.uniform(kb, (1, x.shape[1])) > df2)
        wa = jnp.ones(ei_a.shape[1], jnp.float32)
        wb = jnp.ones(ei_b.shape[1], jnp.float32)
        loss, grads = jax.value_and_grad(
            lambda p: model.apply(p, xa, ei_a, wa, xb, ei_b, wb))(
                state.params)
        return state.apply_gradients(grads), loss

    rng = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(args.n_epoch):
        rng, k = jax.random.split(rng)
        a = epoch % len(eis)
        b = (epoch + 1) % len(eis)
        state, loss = step(state, k, x, eis[a], eis[b])
        if epoch % 20 == 0 or epoch == args.n_epoch - 1:
            print(f"pretrain {epoch:4d} loss {float(loss):.4f}")

    emb = model.apply(state.params, x, eis[0], None)
    d = {"y": jnp.asarray(y), "train_mask": jnp.asarray(train_mask),
         "test_mask": jnp.asarray(test_mask)}
    acc = linear_probe(emb, d, int(y.max()) + 1)
    print(f"probe test acc {acc:.4f} (real structure, "
          f"{len(eis)} perturbation views)")
    return acc


def main(args):
    if getattr(args, "real_structure", 1):
        views, n = _real_views(args.dataset)
        if views is not None:
            return _main_real(args, views, n)
    model = GCILModel(hidden_dim=args.hidden_dim)
    return run_two_view_ssl(model, args,
                            drop_rates=(0.2, 0.2, 0.2, 0.2),
                            embed_fn=lambda m, p, x, ei: m.apply(p, x, ei, None))


if __name__ == "__main__":
    parser = base_parser(hidden_dim=128, n_epoch=100, lr=0.0005)
    parser.add_argument('--drop_edge_rate_1', type=float, default=0.2)
    parser.add_argument('--drop_feature_rate_1', type=float, default=0.2)
    parser.add_argument('--drop_edge_rate_2', type=float, default=0.2)
    parser.add_argument('--drop_feature_rate_2', type=float, default=0.2)
    parser.add_argument('--real_structure', type=int, default=1)
    main(parser.parse_args())
