"""SpMM headline tuning scan (run on the real chip, idle host).

Hypotheses probed (PERF_NOTES 'gather wall'):
  * tile geometry (R, ET) moves the kernel's grid-step overhead;
  * splitting the edge set into k independent gather+reduce chains lets
    XLA overlap chain i's reduce (MXU/VPU) with chain i+1's gather
    (gather engine) — the two units are independent, and the serialized
    kernel tail is ~2-3 ms of the 13 ms step;
  * chain order: summing partials as (k1 + k2) vs nested adds.

Usage: PYTHONPATH=$PYTHONPATH:/root/repo python profiler/spmm_tune.py
"""
import sys
import os.path as osp
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import time
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
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    dst = (N * (rng.random(E) ** 1.5)).astype(np.int64)
    src = rng.integers(0, N, E)
    w = rng.random(E).astype(np.float32)
    x0 = jnp.asarray(rng.normal(size=(N, F)), dtype)
    jax.block_until_ready(x0)

    def bench_plan(R, ET):
        plan = build_csr_plan(src, dst, N, R=R, ET=ET)
        wp = pad_edge_weights(plan, jnp.asarray(w, dtype))
        jax.block_until_ready(wp)
        t = chain_time(
            lambda h: spmm_csr(h, wp, plan, weights_padded=True), x0)
        print(f"R={R:4d} ET={ET:5d} T={plan.T:6d} E_pad={plan.E_pad:9,}: "
              f"{t * 1e3:7.2f} ms  {E / t / 1e6:7.1f} M e/s", flush=True)
        return t



    # packed gather + IN-KERNEL unpack: bitcast (N, 256) bf16 ->
    # (N, 128) f32 halves the gather engine's lane groups (rate is
    # group-bound, PERF_NOTES); the kernel receives the packed f32 rows
    # and splits each 32-bit word into its two bf16 halves with u32
    # shifts/masks (VPU, in-register — no relayout copy), then runs TWO
    # one-hot matmuls (even/odd columns). Output comes back
    # [evens | odds]; one (nbR, 2, F/2) transpose restores order.
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def packed_kernel(tb_ref, tf_ref, lr_ref, w_ref, g_ref, out_ref, *,
                      R, ET, F2):
        t = pl.program_id(0)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (R, ET), 0)
               == lr_ref[0])
        w32 = jax.lax.bitcast_convert_type(g_ref[:], jnp.uint32)
        even = jax.lax.bitcast_convert_type(
            w32 << 16, jnp.float32).astype(jnp.bfloat16)
        odd = jax.lax.bitcast_convert_type(
            w32 & jnp.uint32(0xFFFF0000), jnp.float32).astype(
                jnp.bfloat16)
        oh = jnp.where(sel, w_ref[0].astype(jnp.float32),
                       0.0).astype(jnp.bfloat16)
        acc = jnp.concatenate(
            [jnp.dot(oh, even, preferred_element_type=jnp.float32),
             jnp.dot(oh, odd, preferred_element_type=jnp.float32)],
            axis=1)

        @pl.when(tf_ref[t] == 1)
        def _():
            out_ref[:] = acc.astype(out_ref.dtype)

        @pl.when(tf_ref[t] == 0)
        def _():
            out_ref[:] = out_ref[:] + acc.astype(out_ref.dtype)

    def spmm_packed(h, wp, plan, srcp):
        R, ET, T, nb = plan.R, plan.ET, plan.T, plan.nblocks
        F2 = F // 2
        hf = jax.lax.bitcast_convert_type(
            h.reshape(N, F2, 2), jnp.float32)
        g = jnp.take(hf, srcp, axis=0)          # (E_pad, F2) packed
        kern = functools.partial(packed_kernel, R=R, ET=ET, F2=F2)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, 1, ET), lambda t, tb, tf: (t, 0, 0)),
                pl.BlockSpec((1, 1, ET), lambda t, tb, tf: (t, 0, 0)),
                pl.BlockSpec((ET, F2), lambda t, tb, tf: (t, 0)),
            ],
            out_specs=pl.BlockSpec((R, 2 * F2),
                                   lambda t, tb, tf: (tb[t], 0)),
        )
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb * R, 2 * F2),
                                           jnp.bfloat16),
            cost_estimate=pl.CostEstimate(
                flops=4 * R * ET * F2 * T,
                bytes_accessed=(plan.E_pad * F2 * 4
                                + nb * R * F * 2),
                transcendentals=0,
            ),
        )(jnp.asarray(plan.tile_block), jnp.asarray(plan.tile_first),
          jnp.asarray(plan.local_row.reshape(T, 1, ET)),
          wp.reshape(T, 1, ET), g)
        # [evens | odds] -> natural interleave
        return out.reshape(nb * R, 2, F2).transpose(0, 2, 1).reshape(
            nb * R, F)[:N]

    for R, ET in [(128, 512), (128, 1024), (128, 256), (64, 512)]:
        plan = build_csr_plan(src, dst, N, R=R, ET=ET)
        wp = pad_edge_weights(plan, jnp.asarray(w, jnp.float32))
        srcp = jnp.asarray(plan.src_pad)
        jax.block_until_ready((wp, srcp))
        # correctness vs the reference path first
        ref = spmm_csr(x0, pad_edge_weights(plan, jnp.asarray(w, dtype)),
                       plan, weights_padded=True)
        got = spmm_packed(x0, wp, plan, srcp)
        err = float(jnp.abs((got - ref).astype(jnp.float32)).max())
        t = chain_time(lambda h: spmm_packed(h, wp, plan, srcp), x0)
        print(f"packed-unpack-kernel R={R} ET={ET}: {t * 1e3:7.2f} ms  "
              f"{E / t / 1e6:7.1f} M e/s  (maxerr {err:.3g})",
              flush=True)

    # k-way split: independent chains, partials summed -> XLA may overlap
    # chain i's reduce with chain i+1's gather
    for k in ():
        idx = np.arange(E)
        parts = [idx[i::k] for i in range(k)]
        plans = [build_csr_plan(src[p], dst[p], N, R=256, ET=512)
                 for p in parts]
        wps = [pad_edge_weights(pl, jnp.asarray(w[p], dtype))
               for pl, p in zip(plans, parts)]
        jax.block_until_ready(wps)

        def step(h):
            out = None
            for pl, wp in zip(plans, wps):
                part_out = spmm_csr(h, wp, pl, weights_padded=True)
                out = part_out if out is None else out + part_out
            return out
        t = chain_time(step, x0)
        print(f"split k={k} (interleaved edges): {t * 1e3:7.2f} ms  "
              f"{E / t / 1e6:7.1f} M e/s", flush=True)


if __name__ == "__main__":
    main()
