"""GraphGPT stage-1: graph-text CLIP pretraining.

Reference flow: examples/graphgpt/ in the reference repo. Synthetic fallback
keeps the script runnable offline.

Usage: python examples/graphgpt/graphgpt_trainer.py
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
from gammagl_tpu.models import GraphTextCLIP, GraphLlamaAdapter


def main(args):
    # CLIP-style alignment of node embeddings with token sequences
    # (reference examples/graphgpt/: stage-1 text-graph grounding; the
    # LLM stages require gated checkpoints and run via GraphLlamaAdapter)
    rng = np.random.default_rng(args.seed)
    g, _ = load_node_dataset(args.dataset, args.dataset_path)
    x = jnp.asarray(np.asarray(g.x)[:, :32])
    ei = jnp.asarray(np.asarray(g.edge_index))
    B, T, V = 8, 12, 1000
    model = GraphTextCLIP(embed_dim=32, gnn_hidden=32,
                          transformer_width=32, vocab_size=V,
                          context_length=T)

    def batch(seed):
        r = np.random.default_rng(seed)
        node_ids = r.integers(0, x.shape[0], B)
        tokens = r.integers(0, V, (B, T))
        return jnp.asarray(node_ids), jnp.asarray(tokens)

    node_ids, tokens = batch(0)
    params = model.init(jax.random.PRNGKey(args.seed), x, ei, node_ids,
                        tokens)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    # device data threaded as jit args (never close over device arrays)
    @jax.jit
    def step(state, x, ei, node_ids, tokens):
        def loss_fn(p):
            loss, _ = model.apply(p, x, ei, node_ids, tokens)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    for epoch in range(args.n_epoch):
        node_ids, tokens = batch(epoch)
        state, loss = step(state, x, ei, node_ids, tokens)
        if epoch % 5 == 0:
            print(f"epoch {epoch:3d} CLIP loss {float(loss):.4f}")

    # stage-2 ingredient: splice graph embeddings into LM inputs
    adapter = GraphLlamaAdapter(lm_hidden_size=64, graph_hidden_size=32)
    ap = adapter.init(jax.random.PRNGKey(0), x, ei)
    g_emb = jax.jit(adapter.apply)(ap, x, ei)
    print("graph tokens for the LM:", np.asarray(g_emb).shape)
    return state


if __name__ == "__main__":
    main(base_parser(n_epoch=20, lr=0.001).parse_args())
