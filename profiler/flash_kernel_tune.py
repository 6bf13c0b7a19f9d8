"""A/B of flash fwd kernel formulations at the bench GAT protocol
(arxiv-scale, F=64 bf16, window plan, compact gather).

  v1: online softmax, dense (R, ET) exp (round-3/4 production kernel)
  v4: GLOBAL-BOUND softmax, lane exp + M=2 hi/lo one-hot MXU pick of
      [a_dst; m_bound] (round-5 candidate)
  v5: GLOBAL-BOUND softmax, dense exp (no online max/rescale, no pick)
  v6: floor — no softmax at all (one-hot matmul + l sum, i.e. the
      segment-matmul SpMM shape at this protocol)

Round-4 history (v2: lane exp + M=1 picks, v3: VPU masked-colsum picks)
measured 197-207M e/s vs v1's 223-233M — M=1 pick matmuls and the extra
selects cost more than the dense exp they saved (PERF_NOTES). Those
variants were removed; this file now A/Bs the global-bound family, which
removes the ONLINE machinery entirely (softmax is shift-invariant and
leaky is monotone, so leaky(global smax + a_dst[r]) bounds every score
of row r — no running max needed).

Run: python profiler/flash_kernel_tune.py [ET]
"""

import sys
import time
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gammagl_tpu.ops.pallas import build_csr_plan, plan_gather_src_compact
from gammagl_tpu.ops.pallas.flash_attention import (_lane_layout,
                                                    _tile_last, _NEG)

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


def make_kernel(variant, R, ET, slope):
    def kernel(tb_ref, tf_ref, tl_ref, ts_ref, lr_ref, adst_ref,
               ssrc_ref, msg_ref, out_ref, m_out_ref, l_out_ref, m_ref,
               l_ref, acc_ref):
        t = pl.program_id(1)
        lanes = lr_ref[0]
        sel = (jax.lax.broadcasted_iota(jnp.int32, (R, ET), 0) == lanes)

        @pl.when(tf_ref[t] == 1)
        def _():
            m_ref[:] = jnp.full((R, 1), _NEG, jnp.float32)
            l_ref[:] = jnp.zeros((R, 1), jnp.float32)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        if variant == 1:
            s = ssrc_ref[0] + adst_ref[0, 0].reshape(R, 1)
            s = jnp.where(s >= 0, s, slope * s)
            s = jnp.where(sel, s, _NEG)
            m_old = m_ref[:]
            m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
            scale = jnp.exp(jnp.minimum(m_old - m_new, 0.0))
            p = jnp.where(sel, jnp.exp(s - m_new), 0.0)
            l_ref[:] = (l_ref[:] * scale
                        + jnp.sum(p, axis=1, keepdims=True))
            upd = jnp.dot(p.astype(jnp.bfloat16), msg_ref[:],
                          preferred_element_type=jnp.float32)
            acc_ref[:] = acc_ref[:] * scale + upd
            m_ref[:] = m_new
        elif variant == 4:
            sel_bf = sel.astype(jnp.bfloat16)
            ab = adst_ref[0]                       # (2, R)
            ab_hi = ab.astype(jnp.bfloat16)
            ab_lo = (ab - ab_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dn = (((1,), (0,)), ((), ()))
            lanes2 = (jax.lax.dot_general(
                          ab_hi, sel_bf, dn,
                          preferred_element_type=jnp.float32)
                      + jax.lax.dot_general(
                          ab_lo, sel_bf, dn,
                          preferred_element_type=jnp.float32))
            s = ssrc_ref[0] + lanes2[0:1]
            s = jnp.where(s >= 0, s, slope * s)
            q = jnp.exp(s - lanes2[1:2])
            w = sel_bf * q.astype(jnp.bfloat16)
            l_ref[:] = l_ref[:] + jnp.sum(w, axis=1, keepdims=True,
                                          dtype=jnp.float32)
            acc_ref[:] = acc_ref[:] + jnp.dot(
                w, msg_ref[:], preferred_element_type=jnp.float32)
        elif variant == 5:
            s = ssrc_ref[0] + adst_ref[0, 0].reshape(R, 1)
            s = jnp.where(s >= 0, s, slope * s)
            p = jnp.exp(s - adst_ref[0, 1].reshape(R, 1))
            w = jnp.where(sel, p, 0.0).astype(jnp.bfloat16)
            l_ref[:] = l_ref[:] + jnp.sum(w, axis=1, keepdims=True,
                                          dtype=jnp.float32)
            acc_ref[:] = acc_ref[:] + jnp.dot(
                w, msg_ref[:], preferred_element_type=jnp.float32)
        elif variant == 6:                        # no-softmax floor
            w = sel.astype(jnp.bfloat16)
            l_ref[:] = l_ref[:] + jnp.sum(w, axis=1, keepdims=True,
                                          dtype=jnp.float32)
            acc_ref[:] = acc_ref[:] + jnp.dot(
                w, msg_ref[:], preferred_element_type=jnp.float32)
        elif variant == 7:                        # matmul only
            w = sel.astype(jnp.bfloat16)
            acc_ref[:] = acc_ref[:] + jnp.dot(
                w, msg_ref[:], preferred_element_type=jnp.float32)
        elif variant == 11:                       # no sel build at all
            w = jnp.ones((R, ET), jnp.bfloat16)
            l_ref[:] = l_ref[:] + jnp.sum(w, axis=1, keepdims=True,
                                          dtype=jnp.float32)
            acc_ref[:] = acc_ref[:] + jnp.dot(
                w, msg_ref[:], preferred_element_type=jnp.float32)
        elif variant == 12:                       # sel as bool select only
            w = jnp.where(sel, jnp.bfloat16(1), jnp.bfloat16(0))
            l_ref[:] = l_ref[:] + jnp.sum(w, axis=1, keepdims=True,
                                          dtype=jnp.float32)
            acc_ref[:] = acc_ref[:] + jnp.dot(
                w, msg_ref[:], preferred_element_type=jnp.float32)
        else:                                     # 8: no matmul
            w = sel.astype(jnp.bfloat16)
            l_ref[:] = l_ref[:] + jnp.sum(w, axis=1, keepdims=True,
                                          dtype=jnp.float32)
            acc_ref[:] = acc_ref[:] + jnp.sum(
                msg_ref[:].astype(jnp.float32), axis=0,
                keepdims=True) * 0 + l_ref[:] * 0

        @pl.when(tl_ref[t] == 1)
        def _():
            out_ref[:] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-16)
                          ).astype(out_ref.dtype)
            m_out_ref[:] = m_ref[:].reshape(1, 1, R)
            l_out_ref[:] = l_ref[:].reshape(1, 1, R)

    return kernel


def launch(variant, ssrc, ab_full, msg, plan, ts_np, Gt, slope=0.2):
    R, ET, T, nb = plan.R, plan.ET, plan.T, plan.nblocks
    F = msg.shape[1]
    kern = make_kernel(variant, R, ET, slope)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1, T),
        in_specs=[
            pl.BlockSpec((1, 1, ET),
                         lambda f, t, tb, tf, tl, ts: (t, 0, 0)),
            pl.BlockSpec((1, 2, R),
                         lambda f, t, tb, tf, tl, ts: (tb[t], 0, 0)),
            pl.BlockSpec((1, 1, ET),
                         lambda f, t, tb, tf, tl, ts: (ts[t], 0, 0)),
            pl.BlockSpec((ET, F),
                         lambda f, t, tb, tf, tl, ts: (ts[t], 0)),
        ],
        out_specs=[
            pl.BlockSpec((R, F),
                         lambda f, t, tb, tf, tl, ts: (tb[t], 0)),
            pl.BlockSpec((1, 1, R),
                         lambda f, t, tb, tf, tl, ts: (tb[t], 0, 0)),
            pl.BlockSpec((1, 1, R),
                         lambda f, t, tb, tf, tl, ts: (tb[t], 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, 1), jnp.float32),
            pltpu.VMEM((R, 1), jnp.float32),
            pltpu.VMEM((R, F), jnp.float32),
        ],
    )
    out, m, l = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb * plan.R, F), msg.dtype),
            jax.ShapeDtypeStruct((nb, 1, plan.R), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, plan.R), jnp.float32),
        ],
    )(jnp.asarray(plan.tile_block), jnp.asarray(plan.tile_first),
      jnp.asarray(_tile_last(plan)), jnp.asarray(ts_np),
      jnp.asarray(plan.local_row.reshape(T, 1, ET)), ab_full, ssrc, msg)
    return out


def main():
    ET = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    N, E, F = 169_343, 2_315_598, 64
    rng = np.random.default_rng(2)
    dst = (N * (rng.random(E) ** 1.5)).astype(np.int64)
    src = rng.integers(0, N, E)
    plan = build_csr_plan(src, dst, N, R=128, ET=ET, window=True)
    x0 = jnp.asarray(rng.normal(size=(N, F)), jnp.bfloat16)
    a_np = rng.normal(size=(N,)).astype(np.float32)
    nb, R, T = plan.nblocks, plan.R, plan.T
    a_pad = np.pad(a_np, (0, nb * R - N))
    ts_np, _, Gt = _lane_layout(plan, plan.gather_len)

    results = {}
    for variant in (6, 7, 8, 11):
        def step(x, variant=variant):
            packed = jnp.concatenate(
                [x, jnp.sum(x.astype(jnp.float32), 1, keepdims=True
                            ).astype(x.dtype)], axis=1)
            g = plan_gather_src_compact(packed, plan)
            ssrc_flat = g[:, F].astype(jnp.float32)
            smax = jnp.max(ssrc_flat)
            xm = smax + jnp.asarray(a_pad)
            mb = jnp.where(xm >= 0, xm, 0.2 * xm)
            ab = jnp.stack(
                [jnp.asarray(a_pad).reshape(nb, R),
                 mb.reshape(nb, R)], axis=1)        # (nb, 2, R)
            ssrc = ssrc_flat.reshape(Gt, 1, ET)
            out = launch(variant, ssrc, ab, g[:, :F], plan, ts_np, Gt)
            return out[:N].astype(x.dtype)
        t = chain_time(step, x0)
        results[variant] = t
        print(f"v{variant}: {t*1e3:7.2f} ms  {E/t/1e6:7.1f} M e/s",
              flush=True)
    # raw compact gather alone for the budget
    def gstep(x):
        packed = jnp.concatenate(
            [x, jnp.sum(x.astype(jnp.float32), 1, keepdims=True
                        ).astype(x.dtype)], axis=1)
        g = plan_gather_src_compact(packed, plan)
        g = jax.lax.optimization_barrier(g)
        return x + jnp.sum(g[:1].astype(jnp.float32)).astype(x.dtype) * 0
    t = chain_time(gstep, x0)
    print(f"gather only: {t*1e3:7.2f} ms ({plan.gather_len/t/1e6:.0f} "
          "Mrows/s)")


if __name__ == "__main__":
    main()
