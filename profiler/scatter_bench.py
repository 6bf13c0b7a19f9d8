import os.path as osp
import sys
sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import time
import numpy as np
import jax, jax.numpy as jnp
from gammagl_tpu.ops.pallas import build_csr_plan
from gammagl_tpu.ops.pallas.segment_matmul import _scatter_rows_by

N, E = 169_343, 2_315_598
rng = np.random.default_rng(0)
src = rng.integers(0, N, E)
dst = (N * (rng.random(E) ** 1.5)).astype(np.int64)
plan = build_csr_plan(src, dst, N, R=256, ET=512)
srcj = jnp.asarray(plan.src_pad)
validf = jnp.asarray(plan.valid)

def chain(fn, v0, K=8, reps=3):
    @jax.jit
    def run(v):
        def body(h, _):
            o = fn(h)
            h = h * 0.999 + 0.001 * jnp.take(o, srcj, axis=0)
            return h, ()
        h, _ = jax.lax.scan(body, v, None, length=K)
        return h.astype(jnp.float32).sum()
    float(run(v0))
    ts = []
    for r in range(reps):
        t0 = time.perf_counter(); float(run(v0 + r)); ts.append(time.perf_counter()-t0)
    return min(ts)/K

for F in (64, 128, 256):
    for dt in (jnp.bfloat16, jnp.float32):
        v0 = jnp.asarray(rng.normal(size=(plan.E_pad, F)), dt)
        v0 = v0 * validf[:, None].astype(dt)
        t_x = chain(lambda v: jax.ops.segment_sum(v, srcj, num_segments=N), v0)
        t_p = chain(lambda v: _scatter_rows_by(v, plan, "src", N), v0)
        print(f"F={F} {dt.__name__}: xla scatter {t_x*1e3:.1f} ms, pallas transpose {t_p*1e3:.1f} ms")
