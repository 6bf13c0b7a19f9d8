"""Isolate the flash kernel's per-tile operand-DMA overhead: time a
kernel that ONLY streams the gathered msg blocks + matmuls them into a
resident accumulator (v13), then add back the small per-tile operands
one at a time (v14: +local_row, v15: +ssrc, v16: +ab at tb[t],
v17: everything = v6-equivalent). Run: python profiler/flash_stream_probe.py
"""
import sys, time, os.path as osp
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from gammagl_tpu.ops.pallas import build_csr_plan, plan_gather_src_compact
from gammagl_tpu.ops.pallas.flash_attention import _lane_layout, _tile_last

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

def launch(variant, g, ssrc, ab, lr, plan, ts_np):
    R, ET, T, nb = plan.R, plan.ET, plan.T, plan.nblocks
    F = 64
    msg = g[:, :F]
    specs = [pl.BlockSpec((ET, F), lambda f, t, tb, tf, tl, ts: (ts[t], 0))]
    ops = [msg]
    if variant >= 14:
        specs.append(pl.BlockSpec((1, 1, ET),
                                  lambda f, t, tb, tf, tl, ts: (t, 0, 0)))
        ops.append(lr)
    if variant >= 15:
        specs.append(pl.BlockSpec((1, 1, ET),
                                  lambda f, t, tb, tf, tl, ts: (ts[t], 0, 0)))
        ops.append(ssrc)
    if variant >= 16:
        specs.append(pl.BlockSpec((1, 2, R),
                                  lambda f, t, tb, tf, tl, ts: (tb[t], 0, 0)))
        ops.append(ab)

    def kernel(tb_ref, tf_ref, tl_ref, ts_ref, msg_ref, *rest, variant=variant):
        out_ref = rest[-2]; acc_ref = rest[-1]
        ins = rest[:-2]
        t = pl.program_id(1)
        w = jnp.ones((R, ET), jnp.bfloat16)
        if variant >= 14:
            lrv = ins[0][0]
            sel = (jax.lax.broadcasted_iota(jnp.int32, (R, ET), 0) == lrv)
            w = sel.astype(jnp.bfloat16)
        extra = 0.0
        if variant >= 15:
            extra = extra + jnp.sum(ins[1][0]) * 0
        if variant >= 16:
            extra = extra + jnp.sum(ins[2][0]) * 0
        @pl.when(tf_ref[t] == 1)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        acc_ref[:] = acc_ref[:] + jnp.dot(
            w, msg_ref[:], preferred_element_type=jnp.float32) + extra
        @pl.when(tl_ref[t] == 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4, grid=(1, T),
        in_specs=specs,
        out_specs=[pl.BlockSpec((R, F),
                                lambda f, t, tb, tf, tl, ts: (tb[t], 0))],
        scratch_shapes=[pltpu.VMEM((R, F), jnp.float32)],
    )
    out, = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nb * R, F), jnp.bfloat16)],
    )(jnp.asarray(plan.tile_block), jnp.asarray(plan.tile_first),
      jnp.asarray(_tile_last(plan)), jnp.asarray(ts_np), *ops)
    return out

def main():
    N, E, F = 169_343, 2_315_598, 64
    rng = np.random.default_rng(2)
    dst = (N * (rng.random(E) ** 1.5)).astype(np.int64)
    src = rng.integers(0, N, E)
    plan = build_csr_plan(src, dst, N, R=128, ET=1024, window=True)
    x0 = jnp.asarray(rng.normal(size=(N, F)), jnp.bfloat16)
    nb, R, ET, T = plan.nblocks, plan.R, plan.ET, plan.T
    ts_np, _, Gt = _lane_layout(plan, plan.gather_len)
    a_pad = np.zeros(nb * R, np.float32)
    ab = jnp.asarray(np.stack([a_pad.reshape(nb, R)] * 2, axis=1))
    lr = jnp.asarray(plan.local_row.reshape(T, 1, ET))
    for variant in (13, 14, 15, 16):
        def step(x, variant=variant):
            packed = jnp.concatenate(
                [x, jnp.sum(x.astype(jnp.float32), 1, keepdims=True
                            ).astype(x.dtype)], axis=1)
            g = plan_gather_src_compact(packed, plan)
            ssrc = g[:, F].astype(jnp.float32).reshape(Gt, 1, ET)
            out = launch(variant, g, ssrc, ab, lr, plan, ts_np)
            return out[:N].astype(x.dtype)
        t = chain_time(step, x0)
        print(f"v{variant}: {t*1e3:7.2f} ms  {E/t/1e6:7.1f} M e/s",
              flush=True)



# --- v19: TRANSPOSED global-bound kernel: score column rides the msg
# block ((ET, 65->72 lanes) DMA), dense (ET, R) score matrix, no
# separate ssrc operand. a/mb come as (2, R) rows (native orientation).
def launch_t(g, ab, lr_col, plan, ts_np, with_stats=True):
    R, ET, T, nb = plan.R, plan.ET, plan.T, plan.nblocks
    F = 64

    def kernel(tb_ref, tf_ref, tl_ref, ts_ref, g_ref, lr_ref, ab_ref,
               out_ref, *rest):
        t = pl.program_id(1)
        if with_stats:
            m_out_ref, l_out_ref, l_ref, acc_ref = rest
        else:
            l_ref, acc_ref = rest

        @pl.when(tf_ref[t] == 1)
        def _():
            l_ref[:] = jnp.zeros((1, R), jnp.float32)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        sel_t = (jax.lax.broadcasted_iota(jnp.int32, (ET, R), 1)
                 == lr_ref[0])                       # (ET, R), lr (ET,1)
        s_col = g_ref[:, F:F + 1].astype(jnp.float32)  # (ET, 1)
        a_row = ab_ref[0, 0:1, :]                      # (1, R)
        mb_row = ab_ref[0, 1:2, :]
        s = s_col + a_row                              # (ET, R) dense
        s = jnp.where(s >= 0, s, 0.2 * s)
        p = jnp.exp(s - mb_row)
        w = jnp.where(sel_t, p, 0.0).astype(jnp.bfloat16)
        l_ref[:] = l_ref[:] + jnp.sum(w, axis=0, keepdims=True,
                                      dtype=jnp.float32)
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            w, g_ref[:, :F], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(tl_ref[t] == 1)
        def _():
            out_ref[:] = (acc_ref[:] / jnp.maximum(
                l_ref[:].reshape(R, 1), 1e-16)).astype(out_ref.dtype)
            if with_stats:
                m_out_ref[:] = ab_ref[:, 1:2, :]
                l_out_ref[:] = l_ref[:].reshape(1, 1, R)

    out_shapes = [jax.ShapeDtypeStruct((nb * R, F), jnp.bfloat16)]
    out_specs = [pl.BlockSpec((R, F),
                              lambda f, t, tb, tf, tl, ts: (tb[t], 0))]
    scratch = [pltpu.VMEM((1, R), jnp.float32),
               pltpu.VMEM((R, F), jnp.float32)]
    if with_stats:
        out_shapes += [jax.ShapeDtypeStruct((nb, 1, R), jnp.float32),
                       jax.ShapeDtypeStruct((nb, 1, R), jnp.float32)]
        out_specs += [pl.BlockSpec((1, 1, R),
                                   lambda f, t, tb, tf, tl, ts:
                                   (tb[t], 0, 0))] * 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4, grid=(1, T),
        in_specs=[
            pl.BlockSpec((ET, g.shape[1]),
                         lambda f, t, tb, tf, tl, ts: (ts[t], 0)),
            pl.BlockSpec((1, ET, 1),
                         lambda f, t, tb, tf, tl, ts: (t, 0, 0)),
            pl.BlockSpec((1, 2, R),
                         lambda f, t, tb, tf, tl, ts: (tb[t], 0, 0)),
        ],
        out_specs=out_specs, scratch_shapes=scratch)
    res = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
    )(jnp.asarray(plan.tile_block), jnp.asarray(plan.tile_first),
      jnp.asarray(_tile_last(plan)), jnp.asarray(ts_np), g, lr_col, ab)
    return res[0]


def main_t():
    N, E, F = 169_343, 2_315_598, 64
    rng = np.random.default_rng(2)
    dst = (N * (rng.random(E) ** 1.5)).astype(np.int64)
    src = rng.integers(0, N, E)
    plan = build_csr_plan(src, dst, N, R=128, ET=1024, window=True)
    x0 = jnp.asarray(rng.normal(size=(N, F)), jnp.bfloat16)
    nb, R, ET, T = plan.nblocks, plan.R, plan.ET, plan.T
    ts_np, _, Gt = _lane_layout(plan, plan.gather_len)
    a_np = rng.normal(size=(N,)).astype(np.float32)
    a_pad = np.pad(a_np, (0, nb * R - N))
    lr_col = jnp.asarray(
        plan.local_row.reshape(T, 1, ET).transpose(0, 2, 1).copy())
    a_dev = jnp.asarray(a_pad)
    for ws in (True, False):
        def step(x, ws=ws):
            packed = jnp.concatenate(
                [x, jnp.sum(x.astype(jnp.float32), 1, keepdims=True
                            ).astype(x.dtype)], axis=1)
            g = plan_gather_src_compact(packed, plan)
            smax = jnp.max(g[:, F].astype(jnp.float32))
            xm = smax + a_dev
            mb = jnp.where(xm >= 0, xm, 0.2 * xm)
            ab = jnp.stack([a_dev.reshape(nb, R), mb.reshape(nb, R)],
                           axis=1)
            out = launch_t(g, ab, lr_col, plan, ts_np, with_stats=ws)
            return out[:N].astype(x.dtype)
        t = chain_time(step, x0)
        print(f"v19 stats={ws}: {t*1e3:7.2f} ms  {E/t/1e6:7.1f} M e/s",
              flush=True)




# --- v20: original (R, ET) orientation; score column rides the msg
# block and is transposed to lanes IN-KERNEL (one (ET,1)->(1,ET)
# relayout per tile) -- no separate ssrc operand.
def launch_t2(g, ab, lr, plan, ts_np, with_stats=True):
    R, ET, T, nb = plan.R, plan.ET, plan.T, plan.nblocks
    F = 64

    def kernel(tb_ref, tf_ref, tl_ref, ts_ref, g_ref, lr_ref, ab_ref,
               out_ref, *rest):
        t = pl.program_id(1)
        if with_stats:
            m_out_ref, l_out_ref, l_ref, acc_ref = rest
        else:
            l_ref, acc_ref = rest

        @pl.when(tf_ref[t] == 1)
        def _():
            l_ref[:] = jnp.zeros((R, 1), jnp.float32)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        sel = (jax.lax.broadcasted_iota(jnp.int32, (R, ET), 0)
               == lr_ref[0])
        s_col = g_ref[:, F:F + 1].astype(jnp.float32)   # (ET, 1)
        s_row = jax.lax.transpose(s_col, (1, 0))        # (1, ET)
        a_col = ab_ref[0, 0:1, :].reshape(R, 1)
        mb_col = ab_ref[0, 1:2, :].reshape(R, 1)
        s = s_row + a_col                               # (R, ET)
        s = jnp.where(s >= 0, s, 0.2 * s)
        p = jnp.exp(s - mb_col)
        w = jnp.where(sel, p, 0.0).astype(jnp.bfloat16)
        l_ref[:] = l_ref[:] + jnp.sum(w, axis=1, keepdims=True,
                                      dtype=jnp.float32)
        acc_ref[:] = acc_ref[:] + jnp.dot(
            w, g_ref[:, :F], preferred_element_type=jnp.float32)

        @pl.when(tl_ref[t] == 1)
        def _():
            out_ref[:] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-16)
                          ).astype(out_ref.dtype)
            if with_stats:
                m_out_ref[:] = ab_ref[:, 1:2, :]
                l_out_ref[:] = l_ref[:].reshape(1, 1, R)

    out_shapes = [jax.ShapeDtypeStruct((nb * R, F), jnp.bfloat16)]
    out_specs = [pl.BlockSpec((R, F),
                              lambda f, t, tb, tf, tl, ts: (tb[t], 0))]
    scratch = [pltpu.VMEM((R, 1), jnp.float32),
               pltpu.VMEM((R, F), jnp.float32)]
    if with_stats:
        out_shapes += [jax.ShapeDtypeStruct((nb, 1, R), jnp.float32),
                       jax.ShapeDtypeStruct((nb, 1, R), jnp.float32)]
        out_specs += [pl.BlockSpec((1, 1, R),
                                   lambda f, t, tb, tf, tl, ts:
                                   (tb[t], 0, 0))] * 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4, grid=(1, T),
        in_specs=[
            pl.BlockSpec((ET, g.shape[1]),
                         lambda f, t, tb, tf, tl, ts: (ts[t], 0)),
            pl.BlockSpec((1, 1, ET),
                         lambda f, t, tb, tf, tl, ts: (t, 0, 0)),
            pl.BlockSpec((1, 2, R),
                         lambda f, t, tb, tf, tl, ts: (tb[t], 0, 0)),
        ],
        out_specs=out_specs, scratch_shapes=scratch)
    res = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
    )(jnp.asarray(plan.tile_block), jnp.asarray(plan.tile_first),
      jnp.asarray(_tile_last(plan)), jnp.asarray(ts_np), g,
      jnp.asarray(plan.local_row.reshape(T, 1, ET)), ab)
    return res[0]


def main_t2():
    N, E, F = 169_343, 2_315_598, 64
    rng = np.random.default_rng(2)
    dst = (N * (rng.random(E) ** 1.5)).astype(np.int64)
    src = rng.integers(0, N, E)
    plan = build_csr_plan(src, dst, N, R=128, ET=1024, window=True)
    x0 = jnp.asarray(rng.normal(size=(N, F)), jnp.bfloat16)
    nb, R, ET, T = plan.nblocks, plan.R, plan.ET, plan.T
    ts_np, _, Gt = _lane_layout(plan, plan.gather_len)
    a_np = rng.normal(size=(N,)).astype(np.float32)
    a_pad = np.pad(a_np, (0, nb * R - N))
    a_dev = jnp.asarray(a_pad)
    for ws in (True, False):
        def step(x, ws=ws):
            packed = jnp.concatenate(
                [x, jnp.sum(x.astype(jnp.float32), 1, keepdims=True
                            ).astype(x.dtype)], axis=1)
            g = plan_gather_src_compact(packed, plan)
            smax = jnp.max(g[:, F].astype(jnp.float32))
            xm = smax + a_dev
            mb = jnp.where(xm >= 0, xm, 0.2 * xm)
            ab = jnp.stack([a_dev.reshape(nb, R), mb.reshape(nb, R)],
                           axis=1)
            out = launch_t2(g, ab, plan.local_row, plan, ts_np,
                            with_stats=ws)
            return out[:N].astype(x.dtype)
        t = chain_time(step, x0)
        print(f"v20 stats={ws}: {t*1e3:7.2f} ms  {E/t/1e6:7.1f} M e/s",
              flush=True)


if __name__ == "__main__":
    if "--t2" in sys.argv:
        main_t2()
    elif "--t" in sys.argv:
        main_t()
    else:
        main()
