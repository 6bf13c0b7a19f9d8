"""Blocked CSR plan correctness (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.ops import spmm
from gammagl_tpu.ops.pallas import (BlockedCSRPlan, build_csr_plan_blocked,
                                    spmm_csr)

INTERP = jax.default_backend() != "tpu"


def test_blocked_plan_matches_xla():
    rng = np.random.default_rng(0)
    N, E, F = 40, 200, 8
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    w = rng.normal(size=E).astype(np.float32)
    x = rng.normal(size=(N, F)).astype(np.float32)
    plan = build_csr_plan_blocked(src, dst, N, R=8, ET=16,
                                  num_src_blocks=3)
    assert isinstance(plan, BlockedCSRPlan)
    assert len(plan.blocks) == 3
    # every edge appears exactly once across blocks
    perms = np.concatenate([b.perm[b.perm < E] for b in plan.blocks])
    assert sorted(perms.tolist()) == list(range(E))

    ref = spmm(jnp.asarray(np.stack([src, dst])), jnp.asarray(w),
               jnp.asarray(x))
    out = spmm_csr(jnp.asarray(x), jnp.asarray(w), plan, interpret=INTERP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3,
                               atol=1e-3)

    g1 = jax.grad(lambda x: (spmm_csr(x, jnp.asarray(w), plan,
                                      interpret=INTERP) ** 2).sum())(
        jnp.asarray(x))
    g2 = jax.grad(lambda x: (spmm(jnp.asarray(np.stack([src, dst])),
                                  jnp.asarray(w), x) ** 2).sum())(
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-2,
                               atol=1e-2)


def test_blocked_plan_single_block_is_plain():
    rng = np.random.default_rng(1)
    src = rng.integers(0, 20, 50)
    dst = rng.integers(0, 20, 50)
    plan = build_csr_plan_blocked(src, dst, 20, num_src_blocks=1)
    assert not isinstance(plan, BlockedCSRPlan)
