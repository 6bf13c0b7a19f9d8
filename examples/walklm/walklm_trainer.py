"""WalkLM pipeline demo (random-walk textualization).

Reference: examples/walklm/ -- an LLM-pipeline example gated behind the
`llm`/`gfm` extras (reference setup.py:173-207); it shells out to gated
Llama/GPT checkpoints. This trainer exercises the library-side pieces
(graph tokens, conversation templates, prompt splicing) with a toy LM so
the pipeline runs offline; swap the toy embeddings for a real checkpoint
loader to reproduce the reference.

Usage: python examples/walklm/walklm_trainer.py
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp

from examples.common import base_parser, load_node_dataset
from gammagl_tpu.models import GraphLlamaAdapter, splice_graph_embeddings
from gammagl_tpu.utils.conversation import get_conv_template
from gammagl_tpu.utils.gfm_utils import (DEFAULT_GRAPH_TOKEN,
                                         DEFAULT_G_START_TOKEN,
                                         DEFAULT_G_END_TOKEN,
                                         GRAPH_TOKEN_INDEX)


def main(args):
    g, _ = load_node_dataset(args.dataset, args.dataset_path)
    x = jnp.asarray(np.asarray(g.x)[:, :32])
    ei = jnp.asarray(np.asarray(g.edge_index))

    conv = get_conv_template("graphchat_v1")
    conv.append_message(conv.roles[0],
                        DEFAULT_G_START_TOKEN + DEFAULT_GRAPH_TOKEN
                        + DEFAULT_G_END_TOKEN + " " + 'Here is a random walk over the graph; embed it.')
    conv.append_message(conv.roles[1], None)
    print("prompt:", conv.get_prompt()[:140], "...")

    # graph tokens from the adapter
    adapter = GraphLlamaAdapter(lm_hidden_size=64, graph_hidden_size=32)
    p = adapter.init(jax.random.PRNGKey(args.seed), x, ei)
    g_emb = adapter.apply(p, x, ei)

    # splice one graph token into a toy LM input sequence
    T, H = 16, 64
    rng = np.random.default_rng(0)
    input_ids = np.arange(T)
    input_ids[3] = GRAPH_TOKEN_INDEX          # sentinel position
    tok_emb = jnp.asarray(rng.normal(size=(T, H)), jnp.float32)
    spliced = splice_graph_embeddings(jnp.asarray(input_ids), tok_emb,
                                      g_emb[:1])
    print("LM input with graph tokens:", spliced.shape)
    return spliced


if __name__ == "__main__":
    main(base_parser(n_epoch=1).parse_args())
