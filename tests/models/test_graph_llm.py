"""Graph-LLM tier: CLIP pretrain, adapter, token splicing, conversation."""

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.models import (GraphTextCLIP, GraphLlamaAdapter,
                                LLaGAEncoder, splice_graph_embeddings)
from gammagl_tpu.utils import get_conv_template
from gammagl_tpu.utils.gfm_utils import (GRAPH_TOKEN_INDEX,
                                         DEFAULT_GRAPH_TOKEN,
                                         tokenizer_graph_token)


def test_graph_text_clip():
    rng = np.random.default_rng(0)
    n, f = 12, 6
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    ei = jnp.asarray(np.stack([rng.integers(0, n, 30),
                               rng.integers(0, n, 30)]))
    node_ids = jnp.asarray([0, 3, 7])
    tokens = jnp.asarray(rng.integers(0, 100, (3, 8)))
    m = GraphTextCLIP(embed_dim=16, gnn_hidden=16, transformer_width=16,
                      transformer_layers=1, transformer_heads=2,
                      vocab_size=100, context_length=8)
    p = m.init(jax.random.PRNGKey(0), x, ei, node_ids, tokens)
    loss, (g_emb, t_emb) = m.apply(p, x, ei, node_ids, tokens)
    assert np.isfinite(float(loss))
    assert g_emb.shape == (3, 16) and t_emb.shape == (3, 16)


def test_adapter_and_splice():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    ei = jnp.asarray(np.stack([rng.integers(0, 8, 20),
                               rng.integers(0, 8, 20)]))
    m = GraphLlamaAdapter(lm_hidden_size=32, graph_hidden_size=16)
    p = m.init(jax.random.PRNGKey(0), x, ei)
    g_emb = m.apply(p, x, ei)
    assert g_emb.shape == (8, 32)

    ids = np.array([1, 2, GRAPH_TOKEN_INDEX, 3, GRAPH_TOKEN_INDEX, 4])
    tok = jnp.asarray(rng.normal(size=(6, 32)).astype(np.float32))
    out = splice_graph_embeddings(ids, tok, g_emb[:2])
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(g_emb[0]))
    np.testing.assert_allclose(np.asarray(out[4]), np.asarray(g_emb[1]))
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(tok[3]))


def test_llaga_encoder():
    hop_feats = jnp.ones((4, 3, 8))
    m = LLaGAEncoder(lm_hidden_size=16)
    p = m.init(jax.random.PRNGKey(0), hop_feats)
    out = m.apply(p, hop_feats)
    assert out.shape == (4, 3, 16)


def test_conversation_and_graph_tokens():
    conv = get_conv_template("graphchat_v1")
    conv.append_message(conv.roles[0],
                        f"Given {DEFAULT_GRAPH_TOKEN}, classify node 3.")
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()
    assert "GraphGPT" in prompt and DEFAULT_GRAPH_TOKEN in prompt

    class FakeTok:
        def encode(self, s):
            return [ord(c) % 50 for c in s][:5]
        def __call__(self, s, add_special_tokens=True):
            class R: pass
            r = R(); r.input_ids = self.encode(s)
            return r

    ids = tokenizer_graph_token(f"hi {DEFAULT_GRAPH_TOKEN} there",
                                FakeTok())
    assert GRAPH_TOKEN_INDEX in ids
