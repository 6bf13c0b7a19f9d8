"""Probe: does blocking the HGT packed k|v gather under the ~100 MB
gather cliff recover the SpMM-class row rate?

The HGT bench gathers E~2M rows of (256,) f32 (the half-packed k|v,
1 KB/row) from an N_src=200k table = 205 MB footprint, measured at
~106 Mrows/s (BENCH r05, hgt_packed_gather_rows_per_s). The SpMM
blocked plans keep footprints <100 MB and see 345-370 Mrows/s
(measured_gather_wall_rows_per_s). Same engine, same row width class —
if the cliff is the table footprint, gathering the SAME total rows
from B sub-tables (indices partitioned by src block, each block's
table a contiguous slice) should run ~3x faster.

Protocol mirrors bench.bench_hgt's shapes: N_src=200_000, E=2_000_000,
row=(256,) f32. Each timing chains 10 dependent gathers (cache-busting
chain like utils/profiling.chain_time).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def chain_gather(tab, idx, n=10):
    @jax.jit
    def f(t):
        acc = jnp.zeros((), jnp.float32)
        g = None
        for _ in range(n):
            g = jnp.take(t, idx, axis=0)
            acc = acc + g[0, 0]
            t = t + (acc * 0).astype(t.dtype)  # serialize the chain
        return acc, g

    f(tab)[0].block_until_ready()
    t0 = time.perf_counter()
    f(tab)[0].block_until_ready()
    dt = (time.perf_counter() - t0) / n
    return dt


def main():
    N, E, F = 200_000, 2_000_000, 256
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((N, F)), jnp.float32)
    idx_np = rng.integers(0, N, E)

    print(f"table {N}x{F} f32 = {N*F*4/1e6:.0f} MB, {E} gathered rows")

    # monolithic
    idx = jnp.asarray(idx_np)
    dt = chain_gather(tab, idx)
    print(f"monolithic: {dt*1e3:7.2f} ms  {E/dt/1e6:6.1f} Mrows/s")

    # blocked: partition indices by src block, gather per sub-table.
    for B in (2, 3, 4, 8):
        bs = -(-N // B)
        parts = []
        for b in range(B):
            sel = idx_np[(idx_np >= b * bs) & (idx_np < (b + 1) * bs)]
            parts.append(jnp.asarray(sel - b * bs))

        @jax.jit
        def fb(t):
            acc = jnp.zeros((), jnp.float32)
            outs = []
            for _ in range(10):
                outs = [jnp.take(t[b * bs:(b + 1) * bs], parts[b],
                                 axis=0) for b in range(B)]
                acc = acc + sum(o[0, 0] for o in outs)
                t = t + (acc * 0).astype(t.dtype)
            return acc

        fb(tab).block_until_ready()
        t0 = time.perf_counter()
        fb(tab).block_until_ready()
        dt = (time.perf_counter() - t0) / 10
        print(f"blocked B={B} ({N*F*4/B/1e6:4.0f} MB/blk): "
              f"{dt*1e3:7.2f} ms  {E/dt/1e6:6.1f} Mrows/s")


def colsplit():
    """Variant: same rows, but two half-width (128-lane, 512 B) gathers
    instead of one 256-lane (1 KB) gather.

    CAUTION — this probe as first written reported +29% and was WRONG:
    the serialization chain below only perturbs `a`, so `g2 = take(b)`
    is loop-invariant and XLA hoists it out of the timed loop (1 gather
    instead of 10). The fixed chain perturbs both tables. The honest
    result (PERF_NOTES "HGT gather split"): 512 B rows at this 102 MB
    half-footprint gather at ~190 Mrows/s = 95 effective per full row,
    WORSE than the 141 Mrows/s monolithic 1 KB gather; the end-to-end
    split train step measured -12%."""
    N, E, F = 200_000, 2_000_000, 256
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((N, F)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, E))
    lo, hi = tab[:, :128], tab[:, 128:]

    @jax.jit
    def f(a, b):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(10):
            g1 = jnp.take(a, idx, axis=0)
            g2 = jnp.take(b, idx, axis=0)
            acc = acc + g1[0, 0] + g2[0, 0]
            a = a + (acc * 0).astype(a.dtype)
            b = b + (acc * 0).astype(b.dtype)  # keep BOTH gathers in the chain
        return acc

    f(lo, hi).block_until_ready()
    t0 = time.perf_counter()
    f(lo, hi).block_until_ready()
    dt = (time.perf_counter() - t0) / 10
    print(f"col-split 2x512B: {dt*1e3:7.2f} ms  {E/dt/1e6:6.1f} Mrows/s")


if __name__ == "__main__":
    import sys
    if "--colsplit" in sys.argv:
        colsplit()
        raise SystemExit
    main()
