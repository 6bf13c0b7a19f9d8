"""GraphGPT training: stage-1 graph-text CLIP pretraining and stage-2
graph-token instruction tuning.

Reference flow: examples/graphgpt/ + gammagl/models/graphgpt.py
(GraphLlamaModel token splicing :354-903, stage-2 tuning). Stage 2 here
runs the REAL splice path — conversation template -> tokenized prompt
with <graph> sentinels -> adapter embeddings spliced into the LM input
-> CE on the response — against TinyCausalLM so it trains offline; a
`transformers` Llama swaps in for the backbone unchanged.

Usage: python examples/graphgpt/graphgpt_trainer.py --stage 2
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


def stage2(args):
    """Graph-token instruction tuning (reference graphgpt.py stage 2)."""
    from gammagl_tpu.models import GraphLlamaLM, build_stage2_batch
    from gammagl_tpu.train import TrainState
    from gammagl_tpu.utils.conversation import get_conv_template
    from gammagl_tpu.utils.gfm_utils import DEFAULT_GRAPH_TOKEN

    rng = np.random.default_rng(args.seed)
    g, _ = load_node_dataset(args.dataset, args.dataset_path)
    x = np.asarray(g.x)[:, :16].astype(np.float32)
    ei = np.asarray(g.edge_index)
    y = np.asarray(g.y)
    nodes = rng.permutation(x.shape[0])[:16]

    def tok(s):
        return [2 + (ord(c) % 60) for c in s][:24]

    prompts, responses = [], []
    for v in nodes:
        conv = get_conv_template("graphchat_v1")
        conv.append_message(conv.roles[0],
                            f"Node {DEFAULT_GRAPH_TOKEN} category?")
        conv.append_message(conv.roles[1], None)
        prompts.append(conv.get_prompt()[-40:])
        responses.append(f"class {y[v]}")
    K = 4  # graph patches per sentinel
    ids, labels = build_stage2_batch(prompts, responses, tok,
                                     num_graph_tokens=K, max_len=64)
    node_ids = np.stack([np.full(K, v) for v in nodes])

    model = GraphLlamaLM(vocab_size=80, lm_hidden=32, graph_hidden=16,
                         lm_layers=1, max_len=64)
    xj, eij = jnp.asarray(x), jnp.asarray(ei)
    idj, labj = jnp.asarray(ids), jnp.asarray(labels)
    nid = jnp.asarray(node_ids)
    params = model.init(jax.random.PRNGKey(args.seed), xj, eij, nid, idj,
                        labj)
    state = TrainState.create(params=params, tx=optax.adam(args.lr))

    @jax.jit
    def step(state, x, ei, nid, ids, labels):
        (loss, _), grads = jax.value_and_grad(
            lambda p: model.apply(p, x, ei, nid, ids, labels),
            has_aux=True)(state.params)
        return state.apply_gradients(grads), loss

    for epoch in range(args.n_epoch):
        state, loss = step(state, xj, eij, nid, idj, labj)
        if epoch % 10 == 0 or epoch == args.n_epoch - 1:
            print(f"stage-2 epoch {epoch:3d} instruction CE "
                  f"{float(loss):.4f}")
    return float(loss)


def main(args):
    if getattr(args, "stage", 1) == 2:
        return stage2(args)
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
    parser = base_parser(n_epoch=20, lr=0.003)
    parser.add_argument("--stage", type=int, default=1, choices=[1, 2])
    main(parser.parse_args())
