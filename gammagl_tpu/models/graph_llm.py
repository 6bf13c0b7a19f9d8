"""Graph-LLM models: GraphGPT-style CLIP pretraining + graph-token
injection, LLaGA node-sequence encoding.

Reference: gammagl/models/graphgpt.py:1-903 (CLIP graph-text contrastive
:178, GraphLlamaModel graph-token splicing :354+) and llaga.py. The LLM
backbone is decoupled: these modules produce/inject graph embeddings into
any embedding-space language model (pass the LM's token-embedding matrix or
an `embed_fn`), so tests run without a multi-GB checkpoint while a real
Llama (via `transformers`) drops in unchanged.
"""

from typing import Callable, Optional, Sequence

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp

from gammagl_tpu.layers.conv import GCNConv
from gammagl_tpu.utils.gfm_utils import GRAPH_TOKEN_INDEX

__all__ = ["GraphTextCLIP", "GraphLlamaAdapter", "LLaGAEncoder",
           "splice_graph_embeddings"]


class _TextTransformer(nn.Module):
    width: int
    layers: int
    heads: int
    vocab_size: int
    context_length: int

    @nn.compact
    def __call__(self, token_ids):
        # token_ids: (B, L)
        emb = nn.Embed(self.vocab_size, self.width,
                       embedding_init=nn.initializers.normal(0.02))
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (self.context_length, self.width))
        h = emb(token_ids) + pos[None, :token_ids.shape[1]]
        mask = nn.make_causal_mask(token_ids)
        for _ in range(self.layers):
            attn = nn.SelfAttention(num_heads=self.heads,
                                    qkv_features=self.width,
                                    deterministic=True)(
                nn.LayerNorm()(h), mask=mask)
            h = h + attn
            h = h + nn.Dense(self.width)(nn.gelu(nn.Dense(
                4 * self.width)(nn.LayerNorm()(h))))
        return nn.LayerNorm()(h)


class GraphTextCLIP(nn.Module):
    """CLIP-style graph-text contrastive pretraining (reference
    graphgpt.py:178): GNN node embeddings vs transformer text embeddings
    aligned with a symmetric InfoNCE."""

    embed_dim: int = 128
    gnn_hidden: int = 128
    transformer_width: int = 128
    transformer_layers: int = 2
    transformer_heads: int = 4
    vocab_size: int = 32000
    context_length: int = 64
    tau: float = 0.07

    @nn.compact
    def __call__(self, x, edge_index, node_ids, token_ids,
                 num_nodes=None):
        """node_ids: (B,) nodes paired with token_ids (B, L) descriptions."""
        h = nn.relu(GCNConv(self.gnn_hidden)(x, edge_index,
                                             num_nodes=num_nodes))
        h = GCNConv(self.embed_dim)(h, edge_index, num_nodes=num_nodes)
        g_emb = h[node_ids]
        t_h = _TextTransformer(self.transformer_width,
                               self.transformer_layers,
                               self.transformer_heads, self.vocab_size,
                               self.context_length)(token_ids)
        text_proj = self.param("text_projection",
                               nn.initializers.normal(
                                   self.transformer_width ** -0.5),
                               (self.transformer_width, self.embed_dim))
        t_emb = t_h[:, -1] @ text_proj  # EOT pooling

        g = g_emb / (jnp.linalg.norm(g_emb, axis=-1, keepdims=True) + 1e-8)
        t = t_emb / (jnp.linalg.norm(t_emb, axis=-1, keepdims=True) + 1e-8)
        logits = g @ t.T / self.tau
        labels = jnp.arange(logits.shape[0])
        import optax
        loss = (optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels).mean()
                + optax.softmax_cross_entropy_with_integer_labels(
                    logits.T, labels).mean()) / 2
        return loss, (g_emb, t_emb)


class GraphLlamaAdapter(nn.Module):
    """Graph encoder + projector into an LM's hidden space (reference
    GraphLlamaModel.graph_projector :543). The LM itself is external."""

    lm_hidden_size: int
    graph_hidden_size: int = 128

    @nn.compact
    def __call__(self, x, edge_index, num_nodes=None):
        h = nn.relu(GCNConv(self.graph_hidden_size)(
            x, edge_index, num_nodes=num_nodes))
        h = GCNConv(self.graph_hidden_size)(h, edge_index,
                                            num_nodes=num_nodes)
        return nn.Dense(self.lm_hidden_size, name="graph_projector")(h)


class LLaGAEncoder(nn.Module):
    """LLaGA (Chen 2024; reference llaga.py): encode each target node as a
    fixed template of neighborhood features (hop-field or neighborhood-
    detail), projected into the LM hidden space."""

    lm_hidden_size: int
    num_hops: int = 2
    sample_size: int = 10

    @nn.compact
    def __call__(self, hop_features):
        """hop_features: (B, num_hops + 1, F) mean-pooled per-hop features
        (precomputed host-side from sampled neighborhoods)."""
        h = nn.Dense(2 * self.lm_hidden_size)(hop_features)
        h = nn.gelu(h)
        return nn.Dense(self.lm_hidden_size)(h)  # (B, hops+1, H) tokens


def splice_graph_embeddings(input_ids, token_embeds, graph_embeds,
                            graph_token_index=GRAPH_TOKEN_INDEX):
    """Replace sentinel positions in a token sequence with graph embeddings
    (reference GraphLlamaModel.forward :582 splicing loop).

    input_ids: (L,) ints with `graph_token_index` sentinels (k of them)
    token_embeds: (L, H) embeddings from the LM for every position
    graph_embeds: (k, H) embeddings to inject, in order
    """
    input_ids = jnp.asarray(input_ids)
    is_graph = input_ids == graph_token_index
    # position among sentinels for each location (0-based)
    slot = jnp.cumsum(is_graph) - 1
    slot = jnp.clip(slot, 0, graph_embeds.shape[0] - 1)
    return jnp.where(is_graph[:, None], graph_embeds[slot], token_embeds)
