"""hgt_flash_packed (fused packed multi-head dot-product attention) vs
a decomposed XLA reference: forward values and both gradients, on a
bipartite graph with empty rows, through the window-plan layout."""

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.ops.pallas import build_csr_plan
from gammagl_tpu.ops.pallas.hetero_flash import hgt_flash_packed


def _ref(kv, q, src, dst, n_dst, H, D):
    """Decomposed f32 reference: per-edge scores, segment softmax,
    weighted aggregate."""
    F = H * D
    k = np.asarray(kv, np.float32)[:, :F].reshape(-1, H, D)
    v = np.asarray(kv, np.float32)[:, F:].reshape(-1, H, D)
    qf = np.asarray(q, np.float32)
    E = len(src)
    s = np.einsum("ehd,ehd->eh", qf[dst], k[src])
    out = np.zeros((n_dst, H, D))
    for h in range(H):
        sh = s[:, h]
        mx = np.full(n_dst, -np.inf)
        np.maximum.at(mx, dst, sh)
        e = np.exp(sh - np.where(np.isinf(mx[dst]), 0.0, mx[dst]))
        den = np.zeros(n_dst)
        np.add.at(den, dst, e)
        alpha = e / np.maximum(den[dst], 1e-16)
        np.add.at(out[:, h], dst, alpha[:, None] * v[src, h])
    return out.reshape(n_dst, F)


def _case(seed=0, n_src=150, n_dst=90, e=1200, H=2, D=64):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_src, e)
    # leave some dst rows empty (they must stay exactly zero)
    dst = rng.integers(0, n_dst - 7, e)
    plan = build_csr_plan(src, dst, n_dst, num_src=n_src, R=16, ET=128,
                          window=True)
    kv = jnp.asarray(rng.normal(size=(n_src, 2 * H * D)), jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(n_dst, H, D)), jnp.bfloat16)
    return kv, q, src, dst, plan


def test_forward_matches_reference():
    H, D = 2, 64
    kv, q, src, dst, plan = _case(H=H, D=D)
    out = hgt_flash_packed(kv, q, plan)
    ref = _ref(kv, q, src, dst, plan.num_nodes, H, D)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=0.15, atol=0.15)
    # empty dst rows stay exactly zero
    used = np.zeros(plan.num_nodes, bool)
    used[dst] = True
    assert np.abs(np.asarray(out, np.float32)[~used]).max() == 0.0


def test_gradients_match_reference():
    H, D = 2, 64
    kv, q, src, dst, plan = _case(seed=1, H=H, D=D)
    n_dst = plan.num_nodes
    rng = np.random.default_rng(2)
    gout = jnp.asarray(rng.normal(size=(n_dst, H * D)), jnp.bfloat16)

    def loss(kv, q):
        return jnp.sum(hgt_flash_packed(kv, q, plan).astype(jnp.float32)
                       * gout.astype(jnp.float32))

    dkv, dq = jax.grad(loss, argnums=(0, 1))(kv, q)

    def loss_ref(kv, q):
        from gammagl_tpu.ops import segment_softmax, spmm
        F = H * D
        k = kv.astype(jnp.float32)[:, :F].reshape(-1, H, D)
        v = kv.astype(jnp.float32)[:, F:].reshape(-1, H, D)
        qf = q.astype(jnp.float32)
        sj = jnp.asarray(src)
        dj = jnp.asarray(dst)
        s = jnp.einsum("ehd,ehd->eh", qf[dj], k[sj])
        tot = 0.0
        for h in range(H):
            alpha = segment_softmax(s[:, h], dj, num_segments=n_dst)
            ei = jnp.stack([sj, dj])
            outh = spmm(ei, alpha, v[:, h], num_nodes=n_dst)
            tot = tot + jnp.sum(
                outh * gout.astype(jnp.float32).reshape(n_dst, H, D)[:, h])
        return tot

    dkv_r, dq_r = jax.grad(loss_ref, argnums=(0, 1))(kv, q)
    np.testing.assert_allclose(
        np.asarray(dkv, np.float32), np.asarray(dkv_r, np.float32),
        rtol=0.3, atol=0.3)
    np.testing.assert_allclose(
        np.asarray(dq, np.float32), np.asarray(dq_r, np.float32),
        rtol=0.3, atol=0.3)


def test_single_head_and_h4():
    for H, D, seed in [(1, 64, 3), (4, 32, 4)]:
        kv, q, src, dst, plan = _case(seed=seed, H=H, D=D, e=800)
        out = hgt_flash_packed(kv, q, plan)
        ref = _ref(kv, q, src, dst, plan.num_nodes, H, D)
        np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                                   rtol=0.15, atol=0.15)


def test_split_gather_parts(monkeypatch):
    """The GGL_HGT_GATHER_PARTS column-split layout (kept for future
    re-probing; production default is 1 part — see _gather_parts) stays
    numerically exact at ngp=2 and 4, plus the D-does-not-divide
    fallback."""
    monkeypatch.setenv("GGL_HGT_GATHER_PARTS", "2")
    for H, D, seed in [(4, 64, 5), (8, 32, 6), (1, 256, 7)]:
        kv, q, src, dst, plan = _case(seed=seed, H=H, D=D, e=800)
        out = hgt_flash_packed(kv, q, plan)
        ref = _ref(kv, q, src, dst, plan.num_nodes, H, D)
        np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                                   rtol=0.15, atol=0.15)
    monkeypatch.setenv("GGL_HGT_GATHER_PARTS", "4")
    kv, q, src, dst, plan = _case(seed=10, H=8, D=32, e=800)
    out = hgt_flash_packed(kv, q, plan)
    ref = _ref(kv, q, src, dst, plan.num_nodes, 8, 32)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=0.15, atol=0.15)


def test_gradients_split_path(monkeypatch):
    """Gradients through the ngp=2 split-gather layout (H=4, D=64 —
    the bench/HGTConv shape) against the same decomposed reference as
    test_gradients_match_reference."""
    monkeypatch.setenv("GGL_HGT_GATHER_PARTS", "2")
    H, D = 4, 64
    kv, q, src, dst, plan = _case(seed=8, H=H, D=D)
    n_dst = plan.num_nodes
    rng = np.random.default_rng(9)
    gout = jnp.asarray(rng.normal(size=(n_dst, H * D)), jnp.bfloat16)

    def loss(kv, q):
        return jnp.sum(hgt_flash_packed(kv, q, plan).astype(jnp.float32)
                       * gout.astype(jnp.float32))

    dkv, dq = jax.grad(loss, argnums=(0, 1))(kv, q)

    def loss_ref(kv, q):
        from gammagl_tpu.ops import segment_softmax, spmm
        F = H * D
        k = kv.astype(jnp.float32)[:, :F].reshape(-1, H, D)
        v = kv.astype(jnp.float32)[:, F:].reshape(-1, H, D)
        qf = q.astype(jnp.float32)
        sj = jnp.asarray(src)
        dj = jnp.asarray(dst)
        s = jnp.einsum("ehd,ehd->eh", qf[dj], k[sj])
        tot = 0.0
        for h in range(H):
            alpha = segment_softmax(s[:, h], dj, num_segments=n_dst)
            ei = jnp.stack([sj, dj])
            outh = spmm(ei, alpha, v[:, h], num_nodes=n_dst)
            tot = tot + jnp.sum(
                outh * gout.astype(jnp.float32).reshape(n_dst, H, D)[:, h])
        return tot

    dkv_r, dq_r = jax.grad(loss_ref, argnums=(0, 1))(kv, q)
    np.testing.assert_allclose(
        np.asarray(dkv, np.float32), np.asarray(dkv_r, np.float32),
        rtol=0.3, atol=0.3)
    np.testing.assert_allclose(
        np.asarray(dq, np.float32), np.asarray(dq_r, np.float32),
        rtol=0.3, atol=0.3)
