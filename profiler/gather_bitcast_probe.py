"""Probe: does bitcasting bf16 features to wider lanes beat the gather
wall?

PERF_NOTES 'gather wall part 2': row-gather rate is set by the number of
128-lane column groups, not bytes/row (bf16 F=128 -> 328 Mrows/s; any
2-group layout -> ~213; 4 groups -> ~108). A (N, 256) bf16 matrix IS a
(N, 128) f32 matrix byte-for-byte — one lane group. If the engine rates
the f32 view at the 1-group speed, the SpMM's dominant gather drops from
~10.8 ms to ~7 ms at arxiv scale. bitcast+reshape restores the exact
bf16 column order (packing inverse), and SpMM is feature-wise
independent, so even a fixed interleave would be correctness-neutral.

Usage: python profiler/gather_bitcast_probe.py
"""
import sys
import os.path as osp
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp

K = 16


def chain_time(step, x0, reps=3):
    @jax.jit
    def run(x):
        def body(h, _):
            h = step(h)
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
    idx = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    x16 = jnp.asarray(rng.normal(size=(N, F)), jnp.bfloat16)
    jax.block_until_ready((idx, x16))

    def fold(g):
        # consume the gathered rows; keep chain state (N, F) bf16
        s = jnp.sum(g.astype(jnp.float32))
        return (0 * s).astype(jnp.bfloat16)

    def g_bf16(x):
        g = jnp.take(x, idx, axis=0)
        return x + fold(g)
    t = chain_time(g_bf16, x16)
    print(f"bf16 F={F} direct gather: {t * 1e3:7.2f} ms "
          f"{E / t / 1e6:6.1f} Mrows/s", flush=True)

    def g_f32view(x):
        xf = jax.lax.bitcast_convert_type(
            x.reshape(N, F // 2, 2), jnp.float32)  # (N, 128)
        g = jax.lax.bitcast_convert_type(
            jnp.take(xf, idx, axis=0), jnp.bfloat16)  # (E,128,2)
        return x + fold(g)
    t = chain_time(g_f32view, x16)
    print(f"f32-bitcast view (128 lanes): {t * 1e3:7.2f} ms "
          f"{E / t / 1e6:6.1f} Mrows/s", flush=True)

    # correctness: bitcast+reshape restores exact bf16 columns
    xf = jax.lax.bitcast_convert_type(
        x16.reshape(N, F // 2, 2), jnp.float32)
    back = jax.lax.bitcast_convert_type(
        jnp.take(xf, idx[:64], axis=0), jnp.bfloat16).reshape(64, F)
    ref = jnp.take(x16, idx[:64], axis=0)
    same = bool(jnp.all(back == ref))
    print(f"bitcast roundtrip exact: {same}")

    # how far does packing go? 2x f32 per lane via f32 pairs (no wider
    # dtype on TPU) — probe the f32 F=128 native case for the rate curve
    x32 = jnp.asarray(rng.normal(size=(N, 128)), jnp.float32)
    jax.block_until_ready(x32)

    def g_f32native(x):
        g = jnp.take(x, idx, axis=0)
        return x + 0 * jnp.sum(g.astype(jnp.float32))
    t = chain_time(g_f32native, x32)
    print(f"f32 F=128 native gather: {t * 1e3:7.2f} ms "
          f"{E / t / 1e6:6.1f} Mrows/s", flush=True)


if __name__ == "__main__":
    main()
