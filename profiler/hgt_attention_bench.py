"""HGT per-relation attention: fused plan path vs decomposed XLA, at scale."""
import os.path as osp
import sys
sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import time
import numpy as np
import jax, jax.numpy as jnp

from gammagl_tpu.ops import segment_softmax
from gammagl_tpu.ops.segment import segment_sum
from gammagl_tpu.ops.pallas import (build_csr_plan, flash_softmax_spmm,
                                    plan_gather_dst, plan_gather_src)

N_src, N_dst, E, H, D = 200_000, 100_000, 2_000_000, 4, 64
rng = np.random.default_rng(0)
src = rng.integers(0, N_src, E)
dst = (N_dst * (rng.random(E) ** 1.3)).astype(np.int64)
plan = build_csr_plan(src, dst, N_dst, num_src=N_src, R=256, ET=512)
srcj, dstj = jnp.asarray(src), jnp.asarray(dst)

k = jnp.asarray(rng.normal(size=(N_src, H, D)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(N_src, H, D)), jnp.bfloat16)
q = jnp.asarray(rng.normal(size=(N_dst, H, D)), jnp.bfloat16)
pri = jnp.ones((H,), jnp.float32)

def decomposed(k, v, q):
    k_e = jnp.take(k, srcj, axis=0)
    v_e = jnp.take(v, srcj, axis=0)
    q_e = jnp.take(q, dstj, axis=0)
    score = (q_e.astype(jnp.float32) * k_e.astype(jnp.float32)).sum(-1) \
        * pri / (D ** 0.5)
    alpha = segment_softmax(score, dstj, N_dst)
    return segment_sum(v_e * alpha[..., None].astype(v_e.dtype), dstj,
                       N_dst).reshape(N_dst, H * D)

def fused(k, v, q):
    packed = jnp.concatenate([k.reshape(-1, H * D), v.reshape(-1, H * D)],
                             axis=1)
    g = plan_gather_src(packed, plan)
    q_e = plan_gather_dst(q.reshape(-1, H * D), plan).reshape(-1, H, D)
    k_e = g[:, :H * D].reshape(-1, H, D)
    score = (q_e.astype(jnp.float32) * k_e.astype(jnp.float32)).sum(-1) \
        * pri / (D ** 0.5)
    outs = [flash_softmax_spmm(
        score[:, h],
        jax.lax.slice_in_dim(g, H * D + h * D, H * D + (h + 1) * D, axis=1),
        plan) for h in range(H)]
    return jnp.concatenate(outs, axis=1)

def chain_time(fn, K=8, reps=3):
    @jax.jit
    def run(k0, v0, q0):
        def body(carry, _):
            k0, v0, q0 = carry
            loss, (gk, gv, gq) = jax.value_and_grad(
                lambda a, b, c: (fn(a, b, c).astype(jnp.float32) ** 2).sum(),
                argnums=(0, 1, 2))(k0, v0, q0)
            s = 1e-6
            return ((k0 - (s * gk).astype(k0.dtype)),
                    (v0 - (s * gv).astype(v0.dtype)),
                    (q0 - (s * gq).astype(q0.dtype))), loss
        carry, losses = jax.lax.scan(body, (k0, v0, q0), None, length=K)
        return losses.sum()
    float(run(k, v, q))
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        float(run(k + r * jnp.bfloat16(0.01), v, q))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K

td = chain_time(decomposed)
tf = chain_time(fused)
print(f"HGT relation attention fwd+bwd (E=2M, H=4, D=64 bf16): "
      f"decomposed {td*1e3:.1f} ms, fused {tf*1e3:.1f} ms, {td/tf:.2f}x")
