"""SpMM / SDDMM / sparse conversion correctness vs dense reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gammagl_tpu.ops import (spmm, bspmm, sddmm, sddmm_dot, ind2ptr, ptr2ind,
                             ind2ptr_np, ptr2ind_np)


def _random_graph(rng, n=30, e=120, f=8):
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    x = rng.normal(size=(n, f)).astype(np.float32)
    w = rng.normal(size=e).astype(np.float32)
    return np.stack([src, dst]), w, x


def _dense_adj(ei, w, n):
    a = np.zeros((n, n), np.float32)
    np.add.at(a, (ei[1], ei[0]), w)  # out[d] = sum_s A[d,s] x[s]
    return a


def test_spmm_sum_matches_dense():
    rng = np.random.default_rng(0)
    ei, w, x = _random_graph(rng)
    out = spmm(jnp.asarray(ei), jnp.asarray(w), jnp.asarray(x))
    dense = _dense_adj(ei, w, x.shape[0]) @ x
    np.testing.assert_allclose(np.asarray(out), dense, rtol=1e-4, atol=1e-4)


def test_spmm_mean_max():
    rng = np.random.default_rng(1)
    ei, w, x = _random_graph(rng)
    n = x.shape[0]
    out_mean = np.asarray(spmm(jnp.asarray(ei), None, jnp.asarray(x),
                               reduce="mean"))
    out_max = np.asarray(spmm(jnp.asarray(ei), None, jnp.asarray(x),
                              reduce="max"))
    for d in range(n):
        nbrs = ei[0][ei[1] == d]
        if len(nbrs):
            np.testing.assert_allclose(out_mean[d], x[nbrs].mean(0),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(out_max[d], x[nbrs].max(0),
                                       rtol=1e-5, atol=1e-5)
        else:
            np.testing.assert_allclose(out_mean[d], 0.0)


def test_spmm_grad_matches_dense():
    rng = np.random.default_rng(2)
    ei, w, x = _random_graph(rng, n=10, e=40, f=4)
    a = _dense_adj(ei, w, 10)

    def loss_sparse(x):
        return (spmm(jnp.asarray(ei), jnp.asarray(w), x) ** 2).sum()

    def loss_dense(x):
        return ((jnp.asarray(a) @ x) ** 2).sum()

    gs = jax.grad(loss_sparse)(jnp.asarray(x))
    gd = jax.grad(loss_dense)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), rtol=1e-4,
                               atol=1e-4)


def test_bspmm_multihead():
    rng = np.random.default_rng(3)
    n, e, h, f = 12, 50, 3, 4
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    x = rng.normal(size=(n, h, f)).astype(np.float32)
    alpha = rng.normal(size=(e, h)).astype(np.float32)
    out = np.asarray(bspmm(jnp.asarray(np.stack([src, dst])),
                           jnp.asarray(alpha), jnp.asarray(x)))
    expect = np.zeros((n, h, f), np.float32)
    for k in range(e):
        expect[dst[k]] += alpha[k][:, None] * x[src[k]]
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


def test_sddmm_dot():
    rng = np.random.default_rng(4)
    n, e, f = 9, 30, 5
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    a = rng.normal(size=(n, f)).astype(np.float32)
    b = rng.normal(size=(n, f)).astype(np.float32)
    out = np.asarray(sddmm_dot(jnp.asarray(np.stack([src, dst])),
                               jnp.asarray(a), jnp.asarray(b)))
    expect = np.einsum("ef,ef->e", a[src], b[dst])
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("impl", ["np", "jnp"])
def test_ind2ptr_roundtrip(impl):
    ind = np.array([0, 0, 1, 3, 3, 3])
    if impl == "np":
        ptr = ind2ptr_np(ind, 5)
        back = ptr2ind_np(ptr)
    else:
        ptr = np.asarray(ind2ptr(jnp.asarray(ind), 5))
        back = np.asarray(ptr2ind(jnp.asarray(ptr), 6))
    np.testing.assert_array_equal(ptr, [0, 2, 3, 3, 6, 6])
    np.testing.assert_array_equal(back, ind)
