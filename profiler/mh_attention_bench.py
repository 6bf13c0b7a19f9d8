"""Multi-head flash attention: per-head Python loop vs ONE pallas_call
with H on the grid (flash_edge_attention_mh). Times a fwd+bwd train-ish
step at arxiv scale (N=169k, E=2.3M), H heads of F dims, chained K steps
in one jit (see PERF_NOTES.md on why: RPC floor + relay dedup)."""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.data import Graph
from gammagl_tpu.ops.pallas import (flash_edge_attention,
                                    flash_edge_attention_mh,
                                    plan_gather_src)

N, E, H, F = 169_343, 2_315_598, 4, 64
rng = np.random.default_rng(0)
ei = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)])
g = Graph(x=np.zeros((N, 1), np.float32), edge_index=ei)
plan = g.csr_plan()


def loop_fn(a_s, a_d, x):
    packed = jnp.concatenate([x, a_s.astype(x.dtype)], axis=1)
    gth = plan_gather_src(packed, plan)
    return jnp.stack(
        [flash_edge_attention(
            gth[:, H * F + h], a_d[:, h],
            jax.lax.slice_in_dim(gth, h * F, (h + 1) * F, axis=1),
            plan, 0.2) for h in range(H)], axis=1)


def mh_fn(a_s, a_d, x):
    packed = jnp.concatenate([x, a_s.astype(x.dtype)], axis=1)
    gth = plan_gather_src(packed, plan)
    msg = gth[:, :H * F].reshape(-1, H, F)
    return flash_edge_attention_mh(gth[:, H * F:].astype(jnp.float32),
                                   a_d, msg, plan, 0.2)


def chain_time(fn, x0, a0, K=8, reps=3):
    @jax.jit
    def run(x, a):
        def body(carry, _):
            x, a = carry
            loss, (gx, ga) = jax.value_and_grad(
                lambda xx, aa: (fn(aa, aa, xx).astype(jnp.float32)
                                ** 2).sum(), argnums=(0, 1))(x, a)
            x = x - (0.001 * gx).astype(x.dtype)
            a = a - 0.001 * ga / (jnp.abs(ga).max() + 1)
            return (x, a), loss
        (x, a), losses = jax.lax.scan(body, (x, a), None, length=K)
        return losses.sum()
    tc0 = time.perf_counter()
    float(run(x0, a0))
    tc = time.perf_counter() - tc0
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        float(run(x0 + r, a0 + r * 0.01))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K, tc


for dt in (jnp.float32, jnp.bfloat16):
    x0 = jnp.asarray(rng.normal(size=(N, H * F)), dt)
    a0 = jnp.asarray(rng.normal(size=(N, H)), jnp.float32)
    tl, cl = chain_time(loop_fn, x0, a0)
    tm, cm = chain_time(mh_fn, x0, a0)
    print(f"{dt.__name__}: fwd+bwd per-head loop {tl*1e3:.1f} ms "
          f"(compile {cl:.1f}s), H-grid {tm*1e3:.1f} ms "
          f"(compile {cm:.1f}s), {tl/tm:.2f}x")
