"""VGAE link-prediction trainer (reference: examples/vgae flow):
RandomLinkSplit -> VGAE -> recon + KL -> AUC on held-out edges.
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from common import base_parser, load_node_dataset
from gammagl_tpu.models import VGAEModel, inner_product_decoder, recon_loss
from gammagl_tpu.transforms import RandomLinkSplit
from gammagl_tpu.train import TrainState
from gammagl_tpu.utils import negative_sampling


def auc_score(pos_scores, neg_scores):
    scores = np.concatenate([pos_scores, neg_scores])
    labels = np.concatenate([np.ones(len(pos_scores)),
                             np.zeros(len(neg_scores))])
    order = np.argsort(scores)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    n_pos, n_neg = len(pos_scores), len(neg_scores)
    return (ranks[labels == 1].sum() - n_pos * (n_pos + 1) / 2) / (
        n_pos * n_neg)


def main(args):
    graph, _ = load_node_dataset(args.dataset, args.dataset_path)
    train_g, val_g, test_g = RandomLinkSplit(
        num_val=0.05, num_test=0.1, is_undirected=False, seed=args.seed)(
        graph.numpy())
    x = jnp.asarray(graph.x)
    ei = jnp.asarray(train_g.edge_index)
    n = graph.num_nodes

    model = VGAEModel(hidden_dim=args.hidden_dim, latent_dim=16)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, x, ei)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    rng = jax.random.PRNGKey(args.seed + 1)
    neg_np = negative_sampling(np.asarray(train_g.edge_index),
                               num_nodes=n,
                               num_neg_samples=ei.shape[1],
                               rng=np.random.default_rng(args.seed))
    neg = jnp.asarray(neg_np)

    # device data threaded as jit args (never close over device arrays)
    @jax.jit
    def step(state, rng, x, ei, neg):
        def loss_fn(p):
            mu, logstd, z = model.apply(p, x, ei, rng=rng)
            return (recon_loss(z, ei, neg)
                    + (1.0 / n) * VGAEModel.kl_loss(mu, logstd))
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    for epoch in range(args.n_epoch):
        rng, k = jax.random.split(rng)
        state, loss = step(state, k, x, ei, neg)
        if epoch % 20 == 0:
            print(f"epoch {epoch:4d} loss {float(loss):.4f}")

    mu, logstd, _ = jax.jit(model.apply)(state.params, x, ei)
    test_pos = np.asarray(test_g.edge_label_index)[
        :, np.asarray(test_g.edge_label) == 1]
    test_neg = np.asarray(test_g.edge_label_index)[
        :, np.asarray(test_g.edge_label) == 0]
    pos_s = np.asarray(inner_product_decoder(mu, jnp.asarray(test_pos)))
    neg_s = np.asarray(inner_product_decoder(mu, jnp.asarray(test_neg)))
    auc = auc_score(pos_s, neg_s)
    print(f"test AUC {auc:.4f}")
    return auc


if __name__ == "__main__":
    main(base_parser(hidden_dim=32, n_epoch=200, lr=0.01).parse_args())
