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
