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
    print("anomaly scores:", np.asarray(scores)[:5], "...")
    return scores


if __name__ == "__main__":
    main(base_parser(hidden_dim=32, n_epoch=30, lr=0.005).parse_args())
