"""GraphGAN trainer: generator/discriminator embedding game.

Reference flow: examples/graphgan/graphgan_trainer.py.

Usage: python examples/graphgan/graphgan_trainer.py --dataset cora
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from examples.common import base_parser, load_node_dataset
from gammagl_tpu.models import GraphGAN


def main(args):
    g, _ = load_node_dataset(args.dataset, args.dataset_path)
    ei = np.asarray(g.edge_index)
    model = GraphGAN(num_nodes=g.num_nodes, embedding_dim=args.hidden_dim)
    rng = np.random.default_rng(args.seed)
    def batch():
        pos = ei[:, rng.integers(0, ei.shape[1], 256)]
        fake = rng.integers(0, g.num_nodes, 256)
        u = jnp.asarray(np.concatenate([pos[0], pos[0]]))
        v = jnp.asarray(np.concatenate([pos[1], fake]))
        lab = jnp.asarray(np.concatenate([np.ones(256), np.zeros(256)]))
        return u, v, lab

    u, v, lab = batch()
    params = model.init(jax.random.PRNGKey(args.seed), u, v, lab)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def d_step(params, opt_state, u, v, lab):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply(p, u, v, lab))(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def g_step(params, opt_state, u, v):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply(p, u, v))(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(args.n_epoch):
        u, v, lab = batch()
        params, opt_state, d_loss = d_step(params, opt_state, u, v, lab)
        params, opt_state, g_loss = g_step(params, opt_state, u[:256],
                                           v[256:])
        print(f"epoch {epoch:3d} D {float(d_loss):.4f} "
              f"G {float(g_loss):.4f}")

    # link-prediction AUC of the discriminator embeddings on held-out
    # pos/fake pairs (reference readme metric on arXiv-GrQc)
    from examples.common import binary_auc
    scores, ys = [], []
    for _ in range(8):
        u, v, lab = batch()
        s = model.apply(params, u, v, method=GraphGAN.dis_score)
        scores.append(np.asarray(s))
        ys.append(np.asarray(lab))
    auc = binary_auc(np.concatenate(scores), np.concatenate(ys))
    print(f"link-pred AUC {auc:.4f}")
    return auc


if __name__ == "__main__":
    main(base_parser(hidden_dim=64, n_epoch=5, lr=0.001).parse_args())
