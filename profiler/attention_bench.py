"""GAT attention fwd+bwd at arxiv scale, fused Pallas vs decomposed XLA."""
import os.path as osp
import sys
sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import time
import numpy as np
import jax, jax.numpy as jnp

from gammagl_tpu.ops.pallas import (build_csr_plan, flash_edge_attention,
                                    plan_gather_src, plan_gather_dst,
                                    segment_softmax_padded, bspmm_csr)
from gammagl_tpu.ops.pallas.segment_matmul import _segment_matmul

N, E, F = 169_343, 2_315_598, 64
rng = np.random.default_rng(0)
src = rng.integers(0, N, E)
dst = (N * (rng.random(E) ** 1.5)).astype(np.int64)
plan = build_csr_plan(src, dst, N, R=256, ET=512)
rows_c = jnp.asarray(np.minimum(plan.row_global, plan.nblocks*plan.R - 1))

def decomposed(a_s, a_d, x):
    msg = plan_gather_src(x, plan)
    s_src = plan_gather_src(a_s, plan)
    s = s_src + a_d[rows_c]
    s = jnp.where(s >= 0, s, 0.2 * s)
    alpha = segment_softmax_padded(s, plan)
    return _segment_matmul(msg, alpha.astype(x.dtype), plan, False)[:N]

def fused(a_s, a_d, x):
    msg = plan_gather_src(x, plan)
    s_src = plan_gather_src(a_s, plan)
    return flash_edge_attention(s_src, a_d, msg, plan, 0.2)

def chain_time(fn, x0, a0, K=8, reps=3):
    @jax.jit
    def run(x, a):
        def body(carry, _):
            x, a = carry
            loss, (gx, ga) = jax.value_and_grad(
                lambda xx, aa: (fn(aa, aa, xx).astype(jnp.float32) ** 2).sum(),
                argnums=(0, 1))(x, a)
            x = x - (0.001 * gx).astype(x.dtype)
            a = a - 0.001 * ga / (jnp.abs(ga).max() + 1)
            return (x, a), loss
        (x, a), losses = jax.lax.scan(body, (x, a), None, length=K)
        return losses.sum()
    float(run(x0, a0))
    ts = []
    for r in range(reps):
        t0 = time.perf_counter(); float(run(x0 + r, a0 + r * 0.01)); ts.append(time.perf_counter() - t0)
    return min(ts) / K

for dt in (jnp.float32, jnp.bfloat16):
    x0 = jnp.asarray(rng.normal(size=(N, F)), dt)
    a0 = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    td = chain_time(decomposed, x0, a0)
    tf = chain_time(fused, x0, a0)
    print(f"{dt.__name__}: fwd+bwd decomposed {td*1e3:.1f} ms, fused {tf*1e3:.1f} ms, {td/tf:.2f}x")
