"""Round-5 SpMM headline experiments (VERDICT task 7):
  1. R/ET re-sweep at the current packed-window kernel
  2. src-redundancy histogram (is unique-src tile compaction viable?)
  3. block-pair hybrid fill check on the bench graph
Run: python profiler/spmm_r5_tune.py
"""
import sys, time, os.path as osp
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from gammagl_tpu.ops.pallas import (build_csr_plan_blocked,
                                    pad_edge_weights, spmm_csr)

K = 16

def chain_time(step, x0, reps=3):
    @jax.jit
    def run(x):
        def body(h, _):
            h = step(h)
            return h / (jnp.max(jnp.abs(h)) + 1.0), ()
        h, _ = jax.lax.scan(body, x, None, length=K)
        return h.astype(jnp.float32).sum()
    float(run(x0))
    ts = []
    for r in range(reps):
        t0 = time.perf_counter(); float(run(x0 + r))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K

N, E, F = 169_343, 2_315_598, 256
rng = np.random.default_rng(0)
dst = (N * (rng.random(E) ** 1.5)).astype(np.int64)
src = rng.integers(0, N, E)
w = rng.random(E).astype(np.float32)
x0 = jnp.asarray(rng.normal(size=(N, F)), jnp.bfloat16)
wj = jnp.asarray(w, jnp.bfloat16)

# 1. tile sweep
for R, ET in [(128, 512), (128, 1024), (128, 256), (256, 512),
              (64, 512), (128, 2048)]:
    plan = build_csr_plan_blocked(src, dst, N, num_src_blocks=1,
                                  R=R, ET=ET, window=True)
    wp = pad_edge_weights(plan, wj)
    t = chain_time(lambda h: spmm_csr(h, wp, plan, weights_padded=True),
                   x0)
    print(f"R={R} ET={ET}: {t*1e3:6.2f} ms  {E/t/1e6:6.1f} M e/s",
          flush=True)

# 2. redundancy histogram: distinct srcs per ET-tile of the dst-sorted
# order (unique-src compaction would gather distinct rows only)
order = np.argsort(dst, kind="stable")
ss = src[order]
for ET in (512, 1024):
    nt = E // ET
    tiles = ss[:nt * ET].reshape(nt, ET)
    u = np.array([len(np.unique(t)) for t in tiles[::37]])
    print(f"ET={ET}: mean distinct src/tile = {u.mean():.1f} / {ET} "
          f"(gather saving {100*(1-u.mean()/ET):.1f}%)", flush=True)

# 3. block-pair fill on this graph (128-banded)
try:
    from gammagl_tpu.ops.pallas.block_pair import build_block_pair_plan
    for band in (128, 512):
        bp = build_block_pair_plan(src, dst, N, S=band, R=128,
                                   reorder=True)
        fill = getattr(bp, "fill_ratio", None)
        print(f"block-pair band={band}: fill_ratio={fill}", flush=True)
except Exception as e:
    print("block-pair:", e)
