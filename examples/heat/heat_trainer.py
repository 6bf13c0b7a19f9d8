"""HEAT trajectory prediction trainer.

Reference flow: examples/heat/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/heat/heat_trainer.py
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from examples.common import base_parser, load_node_dataset
from gammagl_tpu.train import TrainState
from gammagl_tpu.models import HEATModel


def main(args):
    # synthetic vehicle trajectories: nodes = agents, edges = proximity;
    # target = future offsets extrapolating the history direction
    rng = np.random.default_rng(args.seed)
    n, e, hist, fut = 16, 48, 5, 6
    model = HEATModel(in_channels_node=16, out_channels=32,
                      out_length=fut, node_emb_size=16,
                      edge_attr_emb_size=16, edge_type_emb_size=16,
                      heads=2)

    def batch(seed):
        r = np.random.default_rng(seed)
        vel = r.normal(size=(n, 1, 2))
        t = np.arange(hist).reshape(1, hist, 1)
        x = (vel * t + 0.05 * r.normal(size=(n, hist, 2)))
        xf = np.concatenate([x, np.broadcast_to(vel, (n, hist, 2))], -1)
        ei = np.stack([r.integers(0, n, e), r.integers(0, n, e)])
        attr = r.normal(size=(e, 5)).astype(np.float32)
        etype = np.eye(4, dtype=np.float32)[r.integers(0, 4, e)]
        tfut = hist + np.arange(fut).reshape(1, fut, 1)
        yfut = (vel * tfut).reshape(n, fut * 2)
        return (jnp.asarray(xf, jnp.float32), jnp.asarray(ei),
                jnp.asarray(attr), jnp.asarray(etype),
                jnp.asarray(yfut, jnp.float32))

    x, ei, attr, etype, y = batch(0)
    params = model.init(jax.random.PRNGKey(args.seed), x, ei, attr, etype)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    @jax.jit
    def step(state, x, ei, attr, etype, y):
        def loss_fn(p):
            pred = model.apply(p, x, ei, attr, etype)
            return ((pred - y) ** 2).mean()
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    for epoch in range(args.n_epoch):
        x, ei, attr, etype, y = batch(epoch)
        state, loss = step(state, x, ei, attr, etype, y)
        if epoch % 5 == 0:
            print(f"epoch {epoch:3d} RMSE "
                  f"{float(jnp.sqrt(loss)):.4f}")
    return state


if __name__ == "__main__":
    main(base_parser(n_epoch=30, lr=0.005).parse_args())
