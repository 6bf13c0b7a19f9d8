"""Planned (overlapped + kernel-backed) halo SpMM vs the flat tier.

Runs on the 8-virtual-CPU mesh from conftest; the Pallas path
auto-interprets off-TPU so the same numbers flow through the kernel
layout machinery.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gammagl_tpu.parallel import (build_halo_partition,
                                  build_halo_partition_planned,
                                  make_halo_spmm, make_halo_spmm_planned)


def _graph(n=200, e=1600, seed=0):
    rng = np.random.default_rng(seed)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, 24)).astype(np.float32)
    return ei, w, x


def _dense_ref(ei, w, x, n):
    a = np.zeros((n, n), np.float64)
    np.add.at(a, (ei[1], ei[0]), w)
    return a @ x.astype(np.float64)


def _mesh(ndev):
    return Mesh(np.asarray(jax.devices()[:ndev]), ("dp",))


@pytest.mark.parametrize("kernel", [False, True])
def test_planned_matches_dense(kernel):
    n, ndev = 200, 4
    ei, w, x = _graph(n)
    mesh = _mesh(ndev)
    part = build_halo_partition_planned(ei, n, ndev, w, R=16, ET=128)
    total = part.num_parts * part.rows_per
    xs = jax.device_put(jnp.asarray(np.pad(x, ((0, total - n), (0, 0)))),
                        NamedSharding(mesh, P("dp")))
    out = jax.jit(make_halo_spmm_planned(mesh, part, kernel=kernel))(xs)
    ref = _dense_ref(ei, w, x, n)
    got = np.asarray(out).reshape(total, -1)[:n]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_planned_matches_flat_tier():
    n, ndev = 120, 8
    ei, w, x = _graph(n, e=900, seed=3)
    mesh = _mesh(ndev)
    flat = build_halo_partition(ei, n, ndev, w)
    plan = build_halo_partition_planned(ei, n, ndev, w, R=8, ET=128)
    assert flat.rows_per == plan.rows_per
    total = ndev * flat.rows_per
    xs = jax.device_put(jnp.asarray(np.pad(x, ((0, total - n), (0, 0)))),
                        NamedSharding(mesh, P("dp")))
    a = jax.jit(make_halo_spmm(mesh, flat))(xs)
    b = jax.jit(make_halo_spmm_planned(mesh, plan, kernel=False))(xs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_planned_grad_flows():
    n, ndev = 96, 4
    ei, w, x = _graph(n, e=700, seed=7)
    mesh = _mesh(ndev)
    part = build_halo_partition_planned(ei, n, ndev, w, R=8, ET=128)
    total = ndev * part.rows_per
    spmm = make_halo_spmm_planned(mesh, part, kernel=True)
    xs = jax.device_put(jnp.asarray(np.pad(x, ((0, total - n), (0, 0)))),
                        NamedSharding(mesh, P("dp")))

    def loss(xv):
        return jnp.sum(spmm(xv) ** 2)

    g = jax.jit(jax.grad(loss))(xs)
    # reference gradient: 2 A^T (A x)
    a = np.zeros((n, n), np.float64)
    np.add.at(a, (ei[1], ei[0]), w)
    ref = 2 * a.T @ (a @ x.astype(np.float64))
    got = np.asarray(g).reshape(total, -1)[:n]
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_empty_boundary_class():
    # all edges interior (block-diagonal graph): boundary plans are pure
    # padding and must contribute exactly zero
    ndev = 4
    n = 64
    rows = 16
    rng = np.random.default_rng(1)
    src = rng.integers(0, rows, 400) + (np.arange(400) % ndev) * rows
    dst = (src // rows) * rows + rng.integers(0, rows, 400)
    ei = np.stack([src, dst])
    w = np.ones(400, np.float32)
    x = rng.normal(size=(n, 8)).astype(np.float32)
    mesh = _mesh(ndev)
    part = build_halo_partition_planned(ei, n, ndev, w, R=8, ET=128)
    assert part.halo_per_peer == 8  # minimum padding only
    total = ndev * part.rows_per
    xs = jax.device_put(jnp.asarray(np.pad(x, ((0, total - n), (0, 0)))),
                        NamedSharding(mesh, P("dp")))
    out = jax.jit(make_halo_spmm_planned(mesh, part))(xs)
    ref = _dense_ref(ei, w, x, n)
    np.testing.assert_allclose(
        np.asarray(out).reshape(total, -1)[:n], ref, rtol=1e-4, atol=1e-4)
