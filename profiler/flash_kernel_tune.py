"""A/B of flash fwd kernel formulations at the bench GAT protocol
(arxiv-scale, F=64 bf16, window plan, compact gather).

  v1: dense (R, ET) exp (round-3 kernel)
  v2: lane exp + one-hot MXU picks (M=1 matmuls)
  v3: lane exp + VPU masked-colsum picks

Run: python profiler/flash_kernel_tune.py
"""

import functools
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
                                                    _pick_rows, _tile_last,
                                                    _NEG)

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
    def kernel(tb_ref, tf_ref, tl_ref, ts_ref, lr_ref, ssrc_ref, adst_ref,
               msg_ref, out_ref, m_out_ref, l_out_ref, m_ref, l_ref,
               acc_ref):
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
            l_ref[:] = l_ref[:] * scale + jnp.sum(p, axis=1, keepdims=True)
            upd = jnp.dot(p.astype(jnp.bfloat16), msg_ref[:],
                          preferred_element_type=jnp.float32)
        else:
            valid = lanes < R
            sel_bf = jnp.where(sel, 1.0, 0.0).astype(jnp.bfloat16)
            if variant == 2:
                a_e = _pick_rows(adst_ref[0, 0].reshape(R, 1), sel_bf)
            else:
                a_e = jnp.sum(
                    jnp.where(sel, adst_ref[0, 0].reshape(R, 1), 0.0),
                    axis=0, keepdims=True)
            s_pre = ssrc_ref[0] + a_e
            s = jnp.where(s_pre >= 0, s_pre, slope * s_pre)
            sd = jnp.where(sel, s, _NEG)
            m_old = m_ref[:]
            m_new = jnp.maximum(m_old, jnp.max(sd, axis=1, keepdims=True))
            scale = jnp.exp(jnp.minimum(m_old - m_new, 0.0))
            if variant == 2:
                m_pick = _pick_rows(m_new, sel_bf)
            else:
                m_pick = jnp.sum(jnp.where(sel, m_new, 0.0), axis=0,
                                 keepdims=True)
            p = jnp.where(valid, jnp.exp(jnp.minimum(s - m_pick, 30.0)),
                          0.0)
            p_bf = p.astype(jnp.bfloat16)
            P = sel_bf * p_bf
            upd = jnp.dot(P, msg_ref[:],
                          preferred_element_type=jnp.float32)
            l_ref[:] = l_ref[:] * scale + jnp.dot(
                P, jnp.ones((ET, 1), jnp.bfloat16),
                preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * scale + upd
        m_ref[:] = m_new

        @pl.when(tl_ref[t] == 1)
        def _():
            out_ref[:] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-16)
                          ).astype(out_ref.dtype)
            m_out_ref[:] = m_ref[:].reshape(1, 1, R)
            l_out_ref[:] = l_ref[:].reshape(1, 1, R)

    return kernel


def launch(variant, ssrc, a_full, msg, plan, ts_np, Gt, slope=0.2):
    R, ET, T, nb = plan.R, plan.ET, plan.T, plan.nblocks
    F = msg.shape[1]
    kern = make_kernel(variant, R, ET, slope)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1, T),
        in_specs=[
            pl.BlockSpec((1, 1, ET),
                         lambda f, t, tb, tf, tl, ts: (t, 0, 0)),
            pl.BlockSpec((1, 1, ET),
                         lambda f, t, tb, tf, tl, ts: (ts[t], 0, 0)),
            pl.BlockSpec((1, 1, R),
                         lambda f, t, tb, tf, tl, ts: (tb[t], 0, 0)),
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
      jnp.asarray(plan.local_row.reshape(T, 1, ET)), ssrc, a_full, msg)
    return out


def main():
    N, E, F = 169_343, 2_315_598, 64
    rng = np.random.default_rng(2)
    dst = (N * (rng.random(E) ** 1.5)).astype(np.int64)
    src = rng.integers(0, N, E)
    plan = build_csr_plan(src, dst, N, R=128, ET=512, window=True)
    x0 = jnp.asarray(rng.normal(size=(N, F)), jnp.bfloat16)
    a_np = rng.normal(size=(N,)).astype(np.float32)
    nb, R, ET, T = plan.nblocks, plan.R, plan.ET, plan.T
    a_full = jnp.asarray(
        np.pad(a_np, (0, nb * R - N)).reshape(nb, 1, R))
    ts_np, _, Gt = _lane_layout(plan, plan.gather_len)

    results = {}
    for variant in (1, 2, 3):
        def step(x, variant=variant):
            packed = jnp.concatenate(
                [x, jnp.sum(x.astype(jnp.float32), 1, keepdims=True
                            ).astype(x.dtype)], axis=1)
            g = plan_gather_src_compact(packed, plan)
            ssrc = g[:, F].astype(jnp.float32).reshape(Gt, 1, ET)
            out = launch(variant, ssrc, a_full, g[:, :F], plan, ts_np, Gt)
            return out[:N].astype(x.dtype)
        t = chain_time(step, x0)
        results[variant] = t
        print(f"v{variant}: {t*1e3:7.2f} ms  {E/t/1e6:7.1f} M e/s")
    # also measure the raw compact gather alone for the budget
    def gstep(x):
        packed = jnp.concatenate(
            [x, jnp.sum(x.astype(jnp.float32), 1, keepdims=True
                        ).astype(x.dtype)], axis=1)
        g = plan_gather_src_compact(packed, plan)
        g = jax.lax.optimization_barrier(g)
        return x + jnp.sum(g[:1].astype(jnp.float32)).astype(x.dtype) * 0
    t = chain_time(gstep, x0)
    print(f"gather only: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
