"""Graph.auto_plan / reorder_rcm and the BlockPairPlan dispatch in the
conv fused path: block-pair plans must be drop-in for CSR plans."""

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.data import Graph
from gammagl_tpu.layers.conv import GCNConv, SAGEConv
from gammagl_tpu.ops.pallas import BlockPairPlan, CSRPlan


def _banded_graph(n=4096, band=64, e=32000, seed=0, scramble=False):
    rng = np.random.default_rng(seed)
    dst = rng.integers(0, n, e)
    # linear band (clip, not mod): RCM can fully recover this ordering
    src = np.clip(dst + rng.integers(-band, band + 1, e), 0, n - 1)
    if scramble:
        p = rng.permutation(n)
        src, dst = p[src], p[dst]
    x = rng.normal(size=(n, 8)).astype(np.float32)
    return Graph(x=x, edge_index=np.stack([src, dst]))


def test_auto_plan_picks_block_pair_on_banded():
    g = _banded_graph()
    plan = g.auto_plan()
    assert isinstance(plan, BlockPairPlan), g._bp_plan.fill_ratio
    assert plan.fill_ratio >= 0.8


def test_auto_plan_falls_back_on_random():
    rng = np.random.default_rng(1)
    n, e = 2000, 6000
    g = Graph(x=rng.normal(size=(n, 4)).astype(np.float32),
              edge_index=np.stack([rng.integers(0, n, e),
                                   rng.integers(0, n, e)]))
    plan = g.auto_plan()
    assert isinstance(plan, CSRPlan)


def test_reorder_rcm_recovers_banding():
    g = _banded_graph(scramble=True)
    assert not isinstance(g.auto_plan(), BlockPairPlan)  # scrambled
    g2, perm = g.reorder_rcm()
    np.testing.assert_allclose(np.asarray(g2.x),
                               np.asarray(g.x)[perm])
    plan = g2.auto_plan()
    assert isinstance(plan, BlockPairPlan), g2._bp_plan.fill_ratio


def test_convs_accept_block_pair_plan():
    g = _banded_graph()
    plan = g.auto_plan()
    assert isinstance(plan, BlockPairPlan)
    x = jnp.asarray(g.x)
    ei = jnp.asarray(np.asarray(g.edge_index))
    for conv in (GCNConv(6), SAGEConv(6)):
        params = conv.init(jax.random.PRNGKey(0), x, ei)
        want = conv.apply(params, x, ei)                 # XLA path
        got = conv.apply(params, x, ei, plan=plan)       # block-pair path
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)
        # gradients flow through the kernel
        gfun = jax.grad(lambda p: (conv.apply(p, x, ei, plan=plan)
                                   ** 2).sum())
        gref = jax.grad(lambda p: (conv.apply(p, x, ei) ** 2).sum())
        for a, b in zip(jax.tree_util.tree_leaves(gfun(params)),
                        jax.tree_util.tree_leaves(gref(params))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3)


def _sbm_scrambled(n=16384, k=32, seed=0):
    """Clustered (SBM) graph with SCRAMBLED node ids: natural order has
    no block structure; label propagation must recover the clusters.
    Sized so the scrambled order is pair-sparse (the arxiv-scale regime
    the fill metric models)."""
    rng = np.random.default_rng(seed)
    size = n // k
    src_parts, dst_parts = [], []
    for c in range(k):
        base = c * size
        src_parts.append(base + rng.integers(0, size, 3072))
        dst_parts.append(base + rng.integers(0, size, 3072))
    # sparse cross-cluster noise
    src_parts.append(rng.integers(0, n, n // 4))
    dst_parts.append(rng.integers(0, n, n // 4))
    src = np.concatenate(src_parts)
    dst = np.concatenate(dst_parts)
    p = rng.permutation(n)
    x = rng.normal(size=(n, 8)).astype(np.float32)
    return Graph(x=x, edge_index=np.stack([p[src], p[dst]]))


def test_reorder_cluster_raises_fill_on_sbm():
    g = _sbm_scrambled()
    f0 = g.block_pair_fill(R=128, S=128, ET=128)
    g2, perm, name, fill = g.reorder_best(R=128, S=128, ET=128)
    assert name == "cluster", (name, f0, fill)
    assert fill > 2.5 * f0, (f0, fill)
    # numerics: SpMM on the reordered graph == un-permuted original
    from gammagl_tpu.ops import spmm
    w = np.ones(g.edge_index.shape[1], np.float32)
    ref = spmm(jnp.asarray(np.asarray(g.edge_index)), jnp.asarray(w),
               jnp.asarray(g.x), num_nodes=g.num_nodes)
    out = spmm(jnp.asarray(np.asarray(g2.edge_index)), jnp.asarray(w),
               jnp.asarray(g2.x), num_nodes=g2.num_nodes)
    inv = np.empty(g.num_nodes, np.int64)
    inv[perm] = np.arange(g.num_nodes)
    np.testing.assert_allclose(np.asarray(out)[inv], np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_reorder_best_banded_prefers_rcm_or_better():
    g = _banded_graph(scramble=True)
    f0 = g.block_pair_fill()
    g2, perm, name, fill = g.reorder_best()
    assert fill >= f0
    assert name in ("rcm", "cluster", "natural")


def test_hybrid_plan_matches_dense_and_grads():
    """Mixed graph: one dense diagonal band + scattered noise. The
    hybrid plan must route dense pairs gather-free, keep the tail on
    the CSR kernel, and reproduce the dense reference exactly (fwd and
    input grads)."""
    from gammagl_tpu.ops.pallas import (HybridPlan, build_hybrid_plan,
                                        spmm_hybrid)
    rng = np.random.default_rng(7)
    n = 512
    # dense block pairs: each 64x64 diagonal window heavily populated
    sd, dd = [], []
    for b in range(n // 64):
        base = b * 64
        sd.append(base + rng.integers(0, 64, 800))
        dd.append(base + rng.integers(0, 64, 800))
    # scattered tail
    sd.append(rng.integers(0, n, 700))
    dd.append(rng.integers(0, n, 700))
    src = np.concatenate(sd)
    dst = np.concatenate(dd)
    w = rng.normal(size=len(src)).astype(np.float32)
    x = rng.normal(size=(n, 16)).astype(np.float32)

    plan = build_hybrid_plan(src, dst, n, R=64, S=64, ET=128)
    assert plan.bp is not None and plan.csr is not None
    assert plan.dense_frac > 0.5, plan.dense_frac

    out = spmm_hybrid(jnp.asarray(x), jnp.asarray(w), plan,
                      interpret=True)
    a = np.zeros((n, n))
    np.add.at(a, (dst, src), w)
    ref = a @ x.astype(np.float64)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4,
                               atol=2e-4)

    g = jax.grad(lambda v: jnp.sum(spmm_hybrid(
        v, jnp.asarray(w), plan, interpret=True) ** 2))(jnp.asarray(x))
    refg = 2 * a.T @ (a @ x.astype(np.float64))
    np.testing.assert_allclose(np.asarray(g), refg, rtol=2e-3, atol=2e-3)


def test_auto_plan_returns_hybrid_on_mixed_graph():
    from gammagl_tpu.ops.pallas import HybridPlan
    from gammagl_tpu.layers.conv import GCNConv
    rng = np.random.default_rng(9)
    n = 8192
    sd, dd = [], []
    for b in range(n // 256):
        base = b * 256
        sd.append(base + rng.integers(0, 256, 6000))
        dd.append(base + rng.integers(0, 256, 6000))
    sd.append(rng.integers(0, n, 8000))
    dd.append(rng.integers(0, n, 8000))
    src, dst = np.concatenate(sd), np.concatenate(dd)
    g = Graph(x=rng.normal(size=(n, 8)).astype(np.float32),
              edge_index=np.stack([src, dst]))
    plan = g.auto_plan()
    assert isinstance(plan, HybridPlan), plan
    # the conv fused path dispatches it
    conv = GCNConv(4)
    params = conv.init(jax.random.key(0), jnp.asarray(g.x),
                       jnp.asarray(np.stack([src, dst])))
    out_p = conv.apply(params, jnp.asarray(g.x),
                       jnp.asarray(np.stack([src, dst])), plan=plan)
    out_d = conv.apply(params, jnp.asarray(g.x),
                       jnp.asarray(np.stack([src, dst])))
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d),
                               rtol=2e-4, atol=2e-4)
