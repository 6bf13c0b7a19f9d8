"""DeFoG discrete flow matching trainer.

Reference flow: examples/defog/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/defog/defog_trainer.py
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
from gammagl_tpu.models import DeFoGModel, flow_interpolate, euler_sample_step


def main(args):
    # synthetic one-hot graphs (4 node classes, 3 edge classes)
    rng = np.random.default_rng(args.seed)
    n = 8
    dims = dict(n_layers=2,
                input_dims={"X": 4, "E": 3, "y": 1 + 64},
                hidden_mlp_dims={"X": 16, "E": 8, "y": 16},
                hidden_dims={"dx": 16, "de": 8, "dy": 16, "n_head": 2},
                output_dims={"X": 4, "E": 3, "y": 1})
    model = DeFoGModel(**dims)

    def sample_graph(k):
        X = jax.nn.one_hot(jnp.asarray(rng.integers(0, 4, n)), 4)
        e = rng.integers(0, 3, (n, n))
        e = np.triu(e) + np.triu(e, 1).T
        E = jax.nn.one_hot(jnp.asarray(e), 3)
        return X, E

    X, E = sample_graph(0)
    y = jnp.zeros(1)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, X, E, y, jnp.asarray(0.5))
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    @jax.jit
    def step(state, X1, E1, y, rng, t):
        Xt, Et = flow_interpolate(rng, X1, E1, t)
        def loss_fn(p):
            pX, pE, _ = model.apply(p, Xt, Et, y, t)
            lx = optax.softmax_cross_entropy(pX, X1).mean()
            le = optax.softmax_cross_entropy(pE, E1).mean()
            return lx + le
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    rng_j = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(args.n_epoch):
        X1, E1 = sample_graph(epoch)
        rng_j, k = jax.random.split(rng_j)
        t = jax.random.uniform(k)
        state, loss = step(state, X1, E1, y, k, t)
        if epoch % 5 == 0:
            print(f"epoch {epoch:3d} flow-matching loss {float(loss):.4f}")

    # Euler sampling from noise (reference examples/defog sampling loop)
    rng_j, k = jax.random.split(rng_j)
    Xt = jax.nn.one_hot(jax.random.randint(k, (n,), 0, 4), 4)
    Et = jax.nn.one_hot(jax.random.randint(k, (n, n), 0, 3), 3)
    @jax.jit
    def sample_step(state, Xt, Et, y, k, t):
        pX, pE, _ = model.apply(state.params, Xt, Et, y, t)
        return euler_sample_step(k, Xt, Et, pX, pE, t, 0.1)

    t = 0.0
    for i in range(10):
        rng_j, k = jax.random.split(rng_j)
        Xt, Et = sample_step(state, Xt, Et, y, k, jnp.asarray(t))
        t += 0.1
    print("sampled graph: node classes",
          np.asarray(jnp.argmax(Xt, -1)))

    # generation validity: sampled edge matrix should be symmetric like
    # every training graph (a structural-validity fraction standing in
    # for the reference's molecular/spectre metrics, which need rdkit /
    # graph-tool and reference checkpoints unavailable offline)
    e_cls = np.asarray(jnp.argmax(Et, -1))
    validity = float((e_cls == e_cls.T).mean())
    print(f"sampled-graph symmetry validity {validity:.4f}")
    return validity


if __name__ == "__main__":
    main(base_parser(n_epoch=20, lr=0.001).parse_args())
