"""Probe: does viewing bf16 rows as wider lanes lift the gather wall?

PERF_NOTES round-1 table: row-gather rate depends on the number of
128-LANE column groups, not bytes (int8 F=256 == bf16 F=256 == 2 groups
at ~212-222 Mrows/s; bf16 F=128 == 1 group at ~328 Mrows/s). Untested
corollary: bitcast bf16 (N, 256) -> int32 (N, 128) makes the SAME 512
bytes/row ONE column group — if the engine charges per lane group, the
reinterpreted gather (including the bitcasts) should approach ~328
Mrows/s, ~1.5x effective bandwidth for SpMM feature gathers.

Chained-timing discipline per verify SKILL: distinct buffers, K
data-dependent steps inside one jit, one scalar fetch.
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

K = 8


def chain_time(step, x0, reps=3):
    @jax.jit
    def run(x):
        def body(h, _):
            h = step(h)
            h = h / (jnp.max(jnp.abs(h.astype(jnp.float32))) + 1.0)
            return h.astype(x.dtype), ()
        h, _ = jax.lax.scan(body, x, None, length=K)
        return h.astype(jnp.float32).sum()

    float(run(x0))
    ts = []
    for r in range(reps):
        xr = x0 + jnp.asarray(r, x0.dtype)
        t0 = time.perf_counter()
        float(run(xr))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=169_343)
    ap.add_argument("--e", type=int, default=2_315_598)
    ap.add_argument("--f", type=int, default=256)
    args = ap.parse_args()
    n, e, f = args.n, args.e, args.f
    rng = np.random.default_rng(0)
    idx = jax.device_put(rng.integers(0, n, e).astype(np.int32))
    x0 = jax.device_put(rng.normal(size=(n, f)).astype(jnp.bfloat16))
    jax.block_until_ready(x0 + 0)
    jax.block_until_ready(idx * 1)
    eps = jnp.bfloat16(2 ** -14)

    def plain(h):
        g = jnp.take(h, idx, axis=0)          # (E, F) — the wall
        return h + g[:n] * eps                # cheap fold, not DCE-able

    def bitcast32(h):
        v = jax.lax.bitcast_convert_type(
            h.reshape(n, f // 2, 2), jnp.int32)        # (N, F/2)
        g = jnp.take(v, idx, axis=0)                   # (E, F/2)
        back = jax.lax.bitcast_convert_type(g[:n], jnp.bfloat16)
        return h + back.reshape(n, f) * eps

    def bitcast_f32(h):
        v = jax.lax.bitcast_convert_type(
            h.reshape(n, f // 2, 2), jnp.float32)
        g = jnp.take(v, idx, axis=0)
        back = jax.lax.bitcast_convert_type(g[:n], jnp.bfloat16)
        return h + back.reshape(n, f) * eps

    for name, fn in [("bf16 take", plain),
                     ("int32-view take", bitcast32),
                     ("f32-view take", bitcast_f32)]:
        dt = chain_time(fn, x0)
        rate = e / dt
        print(f"{name:18s} {dt * 1e3:7.2f} ms  {rate / 1e6:6.0f} Mrows/s  "
              f"{rate * f * 2 / 1e9:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
