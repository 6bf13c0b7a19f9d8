"""A/B + (R, ET) tune of the aligned-window SpMM vs the classic padded
plan on chip (bench protocol: arxiv-scale, bf16 F=256 packed path).

The window plan gathers COMPACT (E rows) while the classic plan gathers
E_pad (R/ET-dependent +7..30%); the gather engine is row-rate-bound, so
the delta should track the padding ratio. Run:

    python profiler/spmm_win_tune.py
"""

import sys
import time
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.ops.pallas import (build_csr_plan, pad_edge_weights,
                                    spmm_csr)

K = 16


def chain_time(step, x0, reps=3):
    @jax.jit
    def run(x):
        def body(h, _):
            h = step(h)
            h = h / (jnp.max(jnp.abs(h)) + 1.0)
            return h, ()
        h, _ = jax.lax.scan(body, x, None, length=K)
        return h.astype(jnp.float32).sum()

    float(run(x0))
    ts = []
    for r in range(reps):
        xr = x0 + r
        t0 = time.perf_counter()
        float(run(xr))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K


def main():
    N, E, F = 169_343, 2_315_598, 256
    rng = np.random.default_rng(0)
    dst = (N * (rng.random(E) ** 1.5)).astype(np.int64)
    src = rng.integers(0, N, E)
    w = rng.random(E).astype(np.float32)
    wj = jnp.asarray(w, jnp.bfloat16)
    x0 = jnp.asarray(rng.normal(size=(N, F)), jnp.bfloat16)

    rows = []
    for window in (False, True):
        for R, ET in [(128, 512), (128, 256), (128, 128), (256, 512),
                      (256, 256), (64, 256), (64, 128)]:
            plan = build_csr_plan(src, dst, N, R=R, ET=ET, window=window)
            wp = pad_edge_weights(plan, wj)
            t = chain_time(
                lambda h: spmm_csr(h, wp, plan, weights_padded=True), x0)
            eps = E / t
            grows = plan.gather_len if window else plan.E_pad
            rows.append((window, R, ET, t * 1e3, eps / 1e6, grows))
            print(f"window={window} R={R:4d} ET={ET:4d}: {t*1e3:7.2f} ms "
                  f"{eps/1e6:7.1f} M e/s  gather_rows={grows}")
    best = max(rows, key=lambda r: r[4])
    print("BEST:", best)


if __name__ == "__main__":
    main()
