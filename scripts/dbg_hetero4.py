import sys, os.path as osp
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from gammagl_tpu.ops.pallas import build_csr_plan
from gammagl_tpu.ops.pallas.hetero_flash import hgt_flash_packed

rng = np.random.default_rng(0)
n, H, D = 120, 4, 64
F = H * D
ei = np.stack([rng.integers(0, n, 400), rng.integers(0, n, 400)])
plan = build_csr_plan(ei[0], ei[1], n, num_src=n, R=64, ET=64,
                      window=True)
x = jnp.asarray(rng.normal(size=(n, 256)), jnp.float32)
wk = jnp.asarray(rng.normal(size=(256, F)) * 0.05, jnp.float32)
wv = jnp.asarray(rng.normal(size=(256, F)) * 0.05, jnp.float32)
wq = jnp.asarray(rng.normal(size=(256, F)) * 0.05, jnp.float32)
a_rel = jnp.asarray(rng.normal(size=(H, D, D)) * 0.1, jnp.bfloat16)
m_rel = jnp.asarray(rng.normal(size=(H, D, D)) * 0.1, jnp.bfloat16)

def f(x, stage):
    k0 = (x @ wk).astype(jnp.bfloat16).reshape(-1, H, D)
    v0 = (x @ wv).astype(jnp.bfloat16).reshape(-1, H, D)
    q0 = (x @ wq).astype(jnp.bfloat16).reshape(-1, H, D)
    if stage >= 1:
        k = jnp.einsum("nhd,hde->nhe", k0, a_rel)
        v = jnp.einsum("nhd,hde->nhe", v0, m_rel)
    else:
        k, v = k0, v0
    kv = jnp.concatenate([k.reshape(-1, F), v.reshape(-1, F)], axis=1)
    q_scaled = (q0.astype(jnp.float32) / (D ** 0.5)).astype(jnp.bfloat16)
    return hgt_flash_packed(kv, q_scaled, plan)

for stage in (0, 1):
    o_e = np.asarray(f(x, stage), np.float32)
    o_j = np.asarray(jax.jit(lambda xx: f(xx, stage))(x), np.float32)
    print(f"stage={stage} eager={np.isfinite(o_e).all()} "
          f"jit={np.isfinite(o_j).all()} "
          f"diff={np.abs(o_j - o_e).max():.4f}", flush=True)

def f2(x):
    k0 = (x @ wk).astype(jnp.bfloat16).reshape(-1, H, D)
    v0 = (x @ wv).astype(jnp.bfloat16).reshape(-1, H, D)
    q0 = (x @ wq).astype(jnp.bfloat16).reshape(-1, H, D)
    k = jnp.einsum("nhd,hde->nhe", k0, a_rel)
    v = jnp.einsum("nhd,hde->nhe", v0, m_rel)
    kv = jnp.concatenate([k.reshape(-1, F), v.reshape(-1, F)], axis=1)
    kv = jax.lax.optimization_barrier(kv)
    q_scaled = (q0.astype(jnp.float32) / (D ** 0.5)).astype(jnp.bfloat16)
    return hgt_flash_packed(kv, q_scaled, plan)

o_j = np.asarray(jax.jit(f2)(x), np.float32)
print("barrier jit finite:", np.isfinite(o_j).all())
