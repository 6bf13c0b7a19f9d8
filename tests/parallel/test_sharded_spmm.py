"""Sharded SpMM on the 8-device virtual CPU mesh vs single-device result."""

import numpy as np
import jax
import jax.numpy as jnp

from gammagl_tpu.ops import spmm
from gammagl_tpu.parallel import (make_mesh, partition_edges_uniform,
                                  partition_edges_by_dst, sharded_spmm)


def _case(seed=0, n=64, e=400, f=16):
    rng = np.random.default_rng(seed)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    return ei, w, x


def test_uniform_partition_matches():
    assert len(jax.devices()) == 8
    ei, w, x = _case()
    mesh = make_mesh(axis_names=("dp",))
    part = partition_edges_uniform(ei, 64, 8, w)
    ref = spmm(jnp.asarray(ei), jnp.asarray(w), jnp.asarray(x))
    out = sharded_spmm(mesh, jnp.asarray(part.edge_index),
                       jnp.asarray(part.edge_weight), jnp.asarray(x), 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_dst_partition_matches():
    ei, w, x = _case(seed=1)
    mesh = make_mesh(axis_names=("dp",))
    part = partition_edges_by_dst(ei, 64, 8, w)
    ref = spmm(jnp.asarray(ei), jnp.asarray(w), jnp.asarray(x))
    out = sharded_spmm(mesh, jnp.asarray(part.edge_index),
                       jnp.asarray(part.edge_weight), jnp.asarray(x), 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_sharded_spmm_grad():
    ei, w, x = _case(seed=2, n=32, e=100, f=8)
    mesh = make_mesh(axis_names=("dp",))
    part = partition_edges_uniform(ei, 32, 8, w)
    eis, ws = jnp.asarray(part.edge_index), jnp.asarray(part.edge_weight)

    g_ref = jax.grad(
        lambda x: (spmm(jnp.asarray(ei), jnp.asarray(w), x) ** 2).sum())(
        jnp.asarray(x))
    g_out = jax.grad(
        lambda x: (sharded_spmm(mesh, eis, ws, x, 32) ** 2).sum())(
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)
