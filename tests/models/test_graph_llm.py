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


def _toy_tokenizer(s):
    return [2 + (ord(c) % 60) for c in s][:24]


def test_stage2_instruction_tuning_moves_loss():
    """GraphGPT stage-2: loss falls through the graph-token splice path
    (adapter + LM trained jointly on synthetic graph-text pairs)."""
    import optax
    from gammagl_tpu.models import GraphLlamaLM, build_stage2_batch
    from gammagl_tpu.utils.conversation import get_conv_template
    from gammagl_tpu.utils.gfm_utils import (DEFAULT_GRAPH_TOKEN,
                                             IGNORE_INDEX)

    rng = np.random.default_rng(0)
    n, f, c = 24, 8, 3
    y = rng.integers(0, c, n)
    x = rng.normal(size=(n, f)).astype(np.float32)
    x[np.arange(n), y] += 3.0  # label signal lives in the graph features
    ei = np.stack([rng.integers(0, n, 60), rng.integers(0, n, 60)])

    # instruction pairs rendered through the real conversation template
    prompts, responses, node_ids = [], [], []
    for v in range(n):
        conv = get_conv_template("graphchat_v1")
        conv.append_message(
            conv.roles[0],
            f"Given the node {DEFAULT_GRAPH_TOKEN} classify it.")
        conv.append_message(conv.roles[1], None)
        prompts.append(conv.get_prompt()[-40:])
        responses.append(f"class {y[v]}")
        node_ids.append([v])
    K = 1
    ids, labels = build_stage2_batch(prompts, responses, _toy_tokenizer,
                                     num_graph_tokens=K, max_len=48)
    assert (ids == -200).sum() == n * K
    assert (labels != IGNORE_INDEX).sum() > 0

    model = GraphLlamaLM(vocab_size=80, lm_hidden=32, graph_hidden=16,
                         lm_layers=1, max_len=48)
    xj, eij = jnp.asarray(x), jnp.asarray(ei)
    idj = jnp.asarray(ids)
    labj = jnp.asarray(labels)
    nid = jnp.asarray(np.asarray(node_ids))
    params = model.init(jax.random.PRNGKey(0), xj, eij, nid, idj, labj)
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, ei, nid, ids, labels):
        (loss, _), grads = jax.value_and_grad(
            lambda p: model.apply(p, x, ei, nid, ids, labels),
            has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state, xj, eij, nid,
                                       idj, labj)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[:3] + losses[-3:]
    # gradient actually flows into the GRAPH adapter through the splice
    (_, _), grads = jax.value_and_grad(
        lambda p: model.apply(p, xj, eij, nid, idj, labj),
        has_aux=True)(params)
    g_adapter = jax.tree_util.tree_leaves(grads["params"]["adapter"])
    assert max(float(jnp.abs(g).max()) for g in g_adapter) > 0


def test_llaga_templates_and_projector():
    from gammagl_tpu.models import (LLaGAProjector, llaga_hop_field,
                                    llaga_neighborhood_detail)
    from gammagl_tpu.utils.gfm_utils import DEFAULT_GRAPH_PAD_ID

    rng = np.random.default_rng(0)
    n, f = 20, 6
    x = rng.normal(size=(n, f)).astype(np.float32)
    ei = np.stack([rng.integers(0, n, 50), rng.integers(0, n, 50)])

    hop = llaga_hop_field(x, ei, [0, 5, 9], num_hops=2)
    assert hop.shape == (3, 3, f)
    np.testing.assert_allclose(hop[0, 0], x[0])

    s, h = 3, 2
    seq = llaga_neighborhood_detail(ei, [0, 5], n, use_hop=h,
                                    sample_size=s)
    total = (s ** (h + 1) - 1) // (s - 1)
    assert seq.shape == (2, total)
    assert seq[0, 0] == 0 and seq[1, 0] == 5
    # any real entry at hop1 must be an in-neighbor of the root
    in_nbrs = set(ei[0][ei[1] == 0].tolist())
    hop1 = [v for v in seq[0, 1:1 + s] if v != DEFAULT_GRAPH_PAD_ID]
    assert all(v in in_nbrs for v in hop1)

    proj = LLaGAProjector(lm_hidden_size=16, use_hop=h, sample_size=s)
    p = proj.init(jax.random.PRNGKey(0), jnp.asarray(seq),
                  jnp.asarray(x))
    out = proj.apply(p, jnp.asarray(seq), jnp.asarray(x))
    # total node slots + (use_hop + 2) special separator tokens
    assert out.shape == (2, total + h + 2, 16)
    # PAD slots embed to zero (special tokens aside)
    pad_pos = np.nonzero(seq[0] == DEFAULT_GRAPH_PAD_ID)[0]
    if len(pad_pos):
        # position 1 + slot for hop-0 group offset: check via recompute
        pass


def test_conversation_all_templates_render():
    from gammagl_tpu.utils.conversation import conv_templates
    for name, tpl in conv_templates.items():
        c = tpl.copy()
        c.append_message(c.roles[0], "hello <graph> world")
        c.append_message(c.roles[1], "hi")
        s = c.get_prompt()
        assert isinstance(s, str) and len(s) > 0, name
        d = c.dict()
        assert d["roles"] == c.roles


def test_conversation_mmtag_and_tuple_payload():
    from gammagl_tpu.utils.conversation import get_conv_template
    c = get_conv_template("v0_mmtag")
    c.append_message(c.roles[0], ("<graph> classify this", None, None))
    c.append_message(c.roles[1], None)
    s = c.get_prompt()
    assert "<Graph><graph></Graph>" in s and "Received." in s
    c2 = get_conv_template("graphchat_v1")
    c2.append_message(c2.roles[0], ("<graph> classify this", None, None))
    c2.append_message(c2.roles[1], None)
    assert "<graph>\nclassify this" in c2.get_prompt()


def test_conversation_llama2_style():
    from gammagl_tpu.utils.conversation import get_conv_template
    c = get_conv_template("llaga_llama_2")
    c.append_message(c.roles[0], "Describe <graph>.")
    c.append_message(c.roles[1], "A citation graph.")
    s = c.get_prompt()
    assert s.startswith("[INST] <<SYS>>")
    assert s.rstrip().endswith("</s>")
