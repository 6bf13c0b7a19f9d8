"""Per-component budget of the HGT train-step bench (bench.bench_hgt
protocol: bipartite 200k->100k, 2M edges, H=4 D=64 bf16, fwd+bwd).

Times each stage in isolation (chained, distinct buffers) and prints
the budget vs the measured full step, so bench.py can publish
hgt_pct_of_roofline. Run: python profiler/hgt_roofline.py
"""
import sys, time, os.path as osp
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from gammagl_tpu.ops.pallas import (build_csr_plan, expand_dst_csr,
                                    flash_softmax_spmm,
                                    flash_softmax_spmm_mh,
                                    plan_gather_src_compact)

K = 8

def chain_time(step, x0, reps=3):
    @jax.jit
    def run(x):
        def body(h, _):
            h = step(h)
            return h / (jnp.max(jnp.abs(h.astype(jnp.float32))).astype(h.dtype) + 1), ()
        h, _ = jax.lax.scan(body, x, None, length=K)
        return h.astype(jnp.float32).sum()
    float(run(x0))
    ts = []
    for r in range(reps):
        t0 = time.perf_counter(); float(run(x0 + jnp.asarray(r, x0.dtype)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K

def main():
    N_src, N_dst, E, H, D = 200_000, 100_000, 2_000_000, 4, 64
    rng = np.random.default_rng(3)
    src = rng.integers(0, N_src, E)
    dst = (N_dst * (rng.random(E) ** 1.3)).astype(np.int64)
    plan = build_csr_plan(src, dst, N_dst, num_src=N_src, R=128, ET=512,
                          window=True)
    kv0 = jnp.asarray(rng.normal(size=(N_src, 2 * H * D)), jnp.bfloat16)
    q0 = jnp.asarray(rng.normal(size=(N_dst, H * D)), jnp.bfloat16)
    pri = jnp.ones((H,), jnp.float32)
    G = plan.gather_len

    # (a) the packed k|v gather alone (4 column groups bf16)
    def g_step(kv):
        g = plan_gather_src_compact(kv, plan)
        return kv + (jnp.sum(g) * 0).astype(kv.dtype)
    t = chain_time(g_step, kv0)
    print(f"a) k|v gather (512 bf16 cols): {t*1e3:7.2f} ms "
          f"({G/t/1e6:.0f} Mrows/s)", flush=True)

    # (b) q dst-expand on the MXU
    def e_step(q):
        qe = expand_dst_csr(q, plan, False, True)
        return q + (jnp.sum(qe) * 0).astype(q.dtype)
    t = chain_time(e_step, q0)
    print(f"b) q expand (256 cols):       {t*1e3:7.2f} ms", flush=True)

    # (c) fwd only: full fused attention fwd (per-head loop, as bench)
    def fwd(kv, q):
        g = plan_gather_src_compact(kv, plan)
        q_e = expand_dst_csr(q, plan, False, True).reshape(-1, H, D)
        k_e = g[:, :H * D].reshape(-1, H, D)
        score = (q_e.astype(jnp.float32) * k_e.astype(jnp.float32)
                 ).sum(-1) * pri / (D ** 0.5)
        outs = [flash_softmax_spmm(
            score[:, h],
            jax.lax.slice_in_dim(g, H * D + h * D, H * D + (h + 1) * D,
                                 axis=1), plan) for h in range(H)]
        return jnp.concatenate(outs, axis=1)

    def f_step(kv):
        return kv.at[:N_dst, :H * D].add(
            fwd(kv, q0).astype(jnp.bfloat16) * 0)
    t_f = chain_time(f_step, kv0)
    print(f"c) full fwd (per-head loop):  {t_f*1e3:7.2f} ms "
          f"({E/t_f/1e6:.1f} M e/s fwd)", flush=True)

    # (d) fwd with the MULTI-HEAD single launch
    def fwd_mh(kv, q):
        g = plan_gather_src_compact(kv, plan)
        q_e = expand_dst_csr(q, plan, False, True).reshape(-1, H, D)
        k_e = g[:, :H * D].reshape(-1, H, D)
        score = (q_e.astype(jnp.float32) * k_e.astype(jnp.float32)
                 ).sum(-1) * pri / (D ** 0.5)
        v = g[:, H * D:].reshape(-1, H, D)
        return flash_softmax_spmm_mh(score, v, plan)

    def fmh_step(kv):
        return kv.at[:N_dst, :H * D].add(
            fwd_mh(kv, q0).reshape(N_dst, H * D).astype(jnp.bfloat16) * 0)
    t_mh = chain_time(fmh_step, kv0)
    print(f"d) full fwd (mh launch):      {t_mh*1e3:7.2f} ms "
          f"({E/t_mh/1e6:.1f} M e/s fwd)", flush=True)

    # (e) fwd+bwd (bench protocol, per-head loop)
    def step_train(kv):
        loss, gkv = jax.value_and_grad(
            lambda a: (fwd(a, q0).astype(jnp.float32) ** 2).sum())(kv)
        return kv - (1e-6 * gkv).astype(kv.dtype)
    t_tr = chain_time(step_train, kv0)
    print(f"e) fwd+bwd (per-head loop):   {t_tr*1e3:7.2f} ms "
          f"({E/t_tr/1e6:.1f} M e/s train)", flush=True)

    # (f) fwd+bwd with the mh launch
    def step_train_mh(kv):
        loss, gkv = jax.value_and_grad(
            lambda a: (fwd_mh(a, q0).astype(jnp.float32) ** 2).sum())(kv)
        return kv - (1e-6 * gkv).astype(kv.dtype)
    t_tmh = chain_time(step_train_mh, kv0)
    print(f"f) fwd+bwd (mh launch):       {t_tmh*1e3:7.2f} ms "
          f"({E/t_tmh/1e6:.1f} M e/s train)", flush=True)

    # (g/h) score via the FUSED SDDMM kernel: kills the q expand and
    # gathers k at 2 column groups (256 bf16) instead of riding the
    # 4-group k|v gather; v gathered separately (2 groups), serialized
    # behind the scores (independent gathers collapse -- PERF_NOTES).
    from gammagl_tpu.ops.pallas import sddmm_csr_mh
    from gammagl_tpu.ops.pallas.segment_matmul import gather_rows

    def fwd_sddmm(kv, q):
        k3 = kv[:, :H * D].reshape(-1, H, D)
        scores = sddmm_csr_mh(k3, q.reshape(-1, H, D), plan)
        scores = scores * pri / (D ** 0.5)
        v_flat, scores = jax.lax.optimization_barrier(
            (kv[:, H * D:], scores))
        v_pad = gather_rows(v_flat, plan, "src")
        outs = [flash_softmax_spmm(
            scores[:, h],
            jax.lax.slice_in_dim(v_pad, h * D, (h + 1) * D, axis=1),
            plan) for h in range(H)]
        return jnp.concatenate(outs, axis=1)

    def g_step2(kv):
        return kv.at[:N_dst, :H * D].add(
            fwd_sddmm(kv, q0).astype(jnp.bfloat16) * 0)
    t_g = chain_time(g_step2, kv0)
    print(f"g) fwd (sddmm scores):        {t_g*1e3:7.2f} ms "
          f"({E/t_g/1e6:.1f} M e/s fwd)", flush=True)

    def step_train_sddmm(kv):
        loss, gkv = jax.value_and_grad(
            lambda a: (fwd_sddmm(a, q0).astype(jnp.float32) ** 2).sum())(kv)
        return kv - (1e-6 * gkv).astype(kv.dtype)
    t_h = chain_time(step_train_sddmm, kv0)
    print(f"h) fwd+bwd (sddmm scores):    {t_h*1e3:7.2f} ms "
          f"({E/t_h/1e6:.1f} M e/s train)", flush=True)



def main_packed():
    """(i/j) the round-5 fused packed path: hgt_flash_packed."""
    from gammagl_tpu.ops.pallas import build_csr_plan, hgt_flash_packed
    ET = int(sys.argv[sys.argv.index("--packed") + 1])         if len(sys.argv) > sys.argv.index("--packed") + 1 else 512
    N_src, N_dst, E, H, D = 200_000, 100_000, 2_000_000, 4, 64
    rng = np.random.default_rng(3)
    src = rng.integers(0, N_src, E)
    dst = (N_dst * (rng.random(E) ** 1.3)).astype(np.int64)
    plan = build_csr_plan(src, dst, N_dst, num_src=N_src, R=128, ET=ET,
                          window=True)
    print(f"ET={ET}")
    kv0 = jnp.asarray(rng.normal(size=(N_src, 2 * H * D)), jnp.bfloat16)
    q0 = jnp.asarray(rng.normal(size=(N_dst, H, D)), jnp.bfloat16)

    def f_step(kv):
        out = hgt_flash_packed(kv, q0, plan)
        return kv.at[:N_dst, :H * D].add(out * 0)
    t = chain_time(f_step, kv0)
    print(f"i) fwd (fused packed):        {t*1e3:7.2f} ms "
          f"({E/t/1e6:.1f} M e/s fwd)", flush=True)

    def t_step(kv):
        loss, gkv = jax.value_and_grad(
            lambda a: (hgt_flash_packed(a, q0, plan).astype(jnp.float32)
                       ** 2).sum())(kv)
        return kv - (1e-6 * gkv).astype(kv.dtype)
    t = chain_time(t_step, kv0)
    print(f"j) fwd+bwd (fused packed):    {t*1e3:7.2f} ms "
          f"({E/t/1e6:.1f} M e/s train)", flush=True)


if __name__ == "__main__":
    if "--packed" in sys.argv:
        main_packed()
    else:
        main()
