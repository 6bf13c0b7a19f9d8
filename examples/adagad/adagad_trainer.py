"""AdaGAD (denoising-masked anomaly detection) trainer.

Reference flow: examples/adagad/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/adagad/adagad_trainer.py
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
from gammagl_tpu.models import AdaGADModel
from gammagl_tpu.utils import negative_sampling


def main(args):
    g, _ = load_node_dataset(args.dataset, args.dataset_path)
    d = device_graph(g)
    x, ei = d["x"], d["edge_index"]

    # inject contextual + structural anomalies (the reference's
    # inj_cora/inj_amazon protocol: ADDataset ships graphs with injected
    # outliers; offline we inject them ourselves so the readme's AUC
    # metric is computable): 5% of nodes get far-off features, and
    # random cliques are added among half of them
    rng_np = np.random.default_rng(args.seed + 7)
    n = g.num_nodes
    n_anom = max(8, n // 20)
    anom = rng_np.choice(n, n_anom, replace=False)
    is_anom = np.zeros(n, bool)
    is_anom[anom] = True
    x_np = np.array(x)  # writable copy (np.asarray of a jax array is RO)
    x_np[anom[:n_anom // 2]] += rng_np.normal(
        scale=3.0 * x_np.std() + 1e-6, size=(n_anom // 2, x_np.shape[1])
    ).astype(x_np.dtype)
    clique = anom[n_anom // 2:]
    extra = np.stack([np.repeat(clique, 4),
                      rng_np.choice(clique, 4 * len(clique))])
    x = jnp.asarray(x_np)
    ei = jnp.asarray(np.concatenate([np.asarray(ei), extra], axis=1))
    neg = negative_sampling(np.asarray(ei), num_nodes=g.num_nodes,
                            num_neg_samples=ei.shape[1] // 2,
                            rng=np.random.default_rng(args.seed))
    neg = jnp.asarray(neg)
    model = AdaGADModel(hidden_dim=args.hidden_dim, latent_dim=8)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, x, ei, neg)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    # device data threaded as jit args (never close over device arrays)
    @jax.jit
    def step(state, x, ei, neg):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply(p, x, ei, neg))(state.params)
        return state.apply_gradients(grads), loss

    for epoch in range(args.n_epoch):
        state, loss = step(state, x, ei, neg)
        if epoch % 10 == 0:
            print(f"epoch {epoch:3d} recon loss {float(loss):.4f}")
    scores = model.apply(state.params, x, ei)
    # anomaly-detection AUC against the injected outliers (the
    # reference readme's metric on inj_cora/inj_amazon/reddit)
    from examples.common import binary_auc
    auc = binary_auc(np.asarray(scores), is_anom)
    print(f"anomaly AUC {auc:.4f}")
    return auc


if __name__ == "__main__":
    main(base_parser(hidden_dim=32, n_epoch=30, lr=0.005).parse_args())
