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
                                  make_halo_spmm, make_halo_spmm_planned,
                                  pad_nodes, unpad_nodes)


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
    xs = jax.device_put(jnp.asarray(pad_nodes(x, part)),
                        NamedSharding(mesh, P("dp")))
    out = jax.jit(make_halo_spmm_planned(mesh, part, kernel=kernel))(xs)
    ref = _dense_ref(ei, w, x, n)
    np.testing.assert_allclose(unpad_nodes(out, part), ref,
                               rtol=2e-4, atol=2e-4)


def test_planned_matches_flat_tier():
    n, ndev = 120, 8
    ei, w, x = _graph(n, e=900, seed=3)
    mesh = _mesh(ndev)
    flat = build_halo_partition(ei, n, ndev, w)
    plan = build_halo_partition_planned(ei, n, ndev, w, R=8, ET=128)
    assert flat.rows_per == plan.rows_per
    np.testing.assert_array_equal(flat.node_perm, plan.node_perm)
    xs = jax.device_put(jnp.asarray(pad_nodes(x, flat)),
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
    spmm = make_halo_spmm_planned(mesh, part, kernel=True)
    xs = jax.device_put(jnp.asarray(pad_nodes(x, part)),
                        NamedSharding(mesh, P("dp")))

    def loss(xv):
        return jnp.sum(spmm(xv) ** 2)

    g = jax.jit(jax.grad(loss))(xs)
    # reference gradient: 2 A^T (A x)
    a = np.zeros((n, n), np.float64)
    np.add.at(a, (ei[1], ei[0]), w)
    ref = 2 * a.T @ (a @ x.astype(np.float64))
    np.testing.assert_allclose(unpad_nodes(g, part), ref,
                               rtol=2e-3, atol=2e-3)


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
    part = build_halo_partition_planned(ei, n, ndev, w, R=8, ET=128,
                                        balance=False)
    assert part.halo_per_peer == 8  # minimum padding only
    total = ndev * part.rows_per
    xs = jax.device_put(jnp.asarray(np.pad(x, ((0, total - n), (0, 0)))),
                        NamedSharding(mesh, P("dp")))
    out = jax.jit(make_halo_spmm_planned(mesh, part))(xs)
    ref = _dense_ref(ei, w, x, n)
    np.testing.assert_allclose(
        np.asarray(out).reshape(total, -1)[:n], ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kernel", [False, True])
def test_hier_planned_matches_dense(kernel):
    from gammagl_tpu.parallel import (build_hier_halo_partition_planned,
                                      make_hier_halo_spmm_planned)
    n, S, D = 180, 2, 4
    ei, w, x = _graph(n, e=1400, seed=5)
    mesh = Mesh(np.asarray(jax.devices()[:S * D]).reshape(S, D),
                ("slice", "dp"))
    part = build_hier_halo_partition_planned(ei, n, S, D, w, R=8, ET=128)
    xs = jax.device_put(jnp.asarray(pad_nodes(x, part)),
                        NamedSharding(mesh, P(("slice", "dp"))))
    out = jax.jit(make_hier_halo_spmm_planned(mesh, part, kernel=kernel))(xs)
    ref = _dense_ref(ei, w, x, n)
    np.testing.assert_allclose(unpad_nodes(out, part), ref,
                               rtol=2e-4, atol=2e-4)


def test_hier_planned_grad_flows():
    from gammagl_tpu.parallel import (build_hier_halo_partition_planned,
                                      make_hier_halo_spmm_planned)
    n, S, D = 100, 2, 2
    ei, w, x = _graph(n, e=800, seed=9)
    mesh = Mesh(np.asarray(jax.devices()[:S * D]).reshape(S, D),
                ("slice", "dp"))
    part = build_hier_halo_partition_planned(ei, n, S, D, w, R=8, ET=128)
    spmm = make_hier_halo_spmm_planned(mesh, part)
    xs = jax.device_put(jnp.asarray(pad_nodes(x, part)),
                        NamedSharding(mesh, P(("slice", "dp"))))
    g = jax.jit(jax.grad(lambda v: jnp.sum(spmm(v) ** 2)))(xs)
    a = np.zeros((n, n), np.float64)
    np.add.at(a, (ei[1], ei[0]), w)
    ref = 2 * a.T @ (a @ x.astype(np.float64))
    np.testing.assert_allclose(unpad_nodes(g, part), ref,
                               rtol=2e-3, atol=2e-3)


def test_hier_planned_as_args_matches_embed_and_grad():
    """Hier-tier as_args (plan buffers as sharded jit arguments) must
    match embed mode in value AND gradient — same O(E)-program-bytes
    rationale as the flat planned tier (round-2 advisor finding)."""
    from gammagl_tpu.parallel import (build_hier_halo_partition_planned,
                                      make_hier_halo_spmm_planned)
    n, S, D = 180, 2, 4
    ei, w, x = _graph(n, e=1400, seed=5)
    mesh = Mesh(np.asarray(jax.devices()[:S * D]).reshape(S, D),
                ("slice", "dp"))
    part = build_hier_halo_partition_planned(ei, n, S, D, w, R=8, ET=128)
    total = part.num_parts * part.rows_per
    xs = jax.device_put(jnp.asarray(np.pad(x, ((0, total - n), (0, 0)))),
                        NamedSharding(mesh, P(("slice", "dp"))))
    spmm_e = make_hier_halo_spmm_planned(mesh, part)
    spmm_a, consts = make_hier_halo_spmm_planned(mesh, part, as_args=True)
    out_e = jax.jit(spmm_e)(xs)
    out_a = jax.jit(spmm_a)(xs, consts)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_e),
                               rtol=1e-6, atol=1e-6)
    ge = jax.jit(jax.grad(lambda v: (spmm_e(v) ** 2).sum()))(xs)
    ga = jax.jit(jax.grad(
        lambda v, cd: (spmm_a(v, cd) ** 2).sum()))(xs, consts)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ge),
                               rtol=1e-5, atol=1e-5)


def test_hier_planned_full_graph_recipe():
    from gammagl_tpu.parallel import (build_hier_halo_partition_planned,
                                      make_mesh, make_partitioned_gcn_train,
                                      shard_nodes)
    from gammagl_tpu.utils import calc_gcn_norm
    from tests.parallel.test_full_graph import _sbm
    ei, x, y = _sbm(seed=11)
    n, f = x.shape
    w = np.asarray(calc_gcn_norm(jnp.asarray(ei), n))
    mesh = make_mesh(shape=(2, 4), axis_names=("slice", "dp"))
    part = build_hier_halo_partition_planned(ei, n, 2, 4, w, R=8, ET=128)
    params, opt_state, step, eval_logits = make_partitioned_gcn_train(
        mesh, part, feat_dim=f, hidden_dim=16, num_classes=2,
        num_layers=2, compute_dtype=jnp.float32, learning_rate=5e-2)
    mask = np.ones(n, np.float32)
    xs = shard_nodes(x, mesh, part)
    ys = shard_nodes(y, mesh, part)
    ms = shard_nodes(mask, mesh, part)
    losses = []
    for _ in range(40):
        params, opt_state, loss = step(params, opt_state, xs, ys, ms)
        losses.append(float(loss))
    assert losses[-1] < 0.4 * losses[0], losses[::10]


def test_src_blocked_interior_matches():
    from gammagl_tpu.parallel.halo_plan import (auto_src_blocks,
                                                build_halo_partition_planned,
                                                make_halo_spmm_planned)
    n, ndev = 160, 4
    ei, w, x = _graph(n, e=1300, seed=13)
    mesh = _mesh(ndev)
    assert auto_src_blocks(2_000_000, 128, np.float32) >= 10
    part = build_halo_partition_planned(ei, n, ndev, w, R=8, ET=128,
                                        num_src_blocks=3)
    # balanced relabeling can add span-sharing chunk plans beyond the
    # requested block count — at least the requested split must exist
    assert len(part.in_extra) >= 2
    xs = jax.device_put(jnp.asarray(pad_nodes(x, part)),
                        NamedSharding(mesh, P("dp")))
    spmm = make_halo_spmm_planned(mesh, part)
    out = jax.jit(spmm)(xs)
    ref = _dense_ref(ei, w, x, n)
    np.testing.assert_allclose(unpad_nodes(out, part), ref,
                               rtol=2e-4, atol=2e-4)
    # gradient through the blocked interior + transpose partition
    g = jax.jit(jax.grad(lambda v: jnp.sum(spmm(v) ** 2)))(xs)
    a = np.zeros((n, n), np.float64)
    np.add.at(a, (ei[1], ei[0]), w)
    refg = 2 * a.T @ (a @ x.astype(np.float64))
    np.testing.assert_allclose(unpad_nodes(g, part), refg,
                               rtol=2e-3, atol=2e-3)


def test_planned_as_args_matches_embed_and_grad():
    """as_args mode (device-resident plan buffers threaded through the
    jit boundary) must match embed mode in value AND gradient — the mode
    exists because embedded literals scale O(E) in program bytes and
    break remote compilation at papers100M shard scale (HTTP 413)."""
    n, ndev = 200, 4
    ei, w, x = _graph(n)
    mesh = _mesh(ndev)
    part = build_halo_partition_planned(ei, n, ndev, w, R=16, ET=128)
    total = part.num_parts * part.rows_per
    xs = jax.device_put(jnp.asarray(np.pad(x, ((0, total - n), (0, 0)))),
                        NamedSharding(mesh, P("dp")))

    spmm_e = make_halo_spmm_planned(mesh, part, kernel=True)
    spmm_a, consts = make_halo_spmm_planned(mesh, part, kernel=True,
                                            as_args=True)
    out_e = jax.jit(spmm_e)(xs)
    out_a = jax.jit(spmm_a)(xs, consts)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_e),
                               rtol=1e-6, atol=1e-6)

    ge = jax.jit(jax.grad(lambda v: (spmm_e(v) ** 2).sum()))(xs)
    ga = jax.jit(jax.grad(
        lambda v, cd: (spmm_a(v, cd) ** 2).sum()))(xs, consts)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ge),
                               rtol=1e-5, atol=1e-5)


def test_src_block_bounds_balance_powerlaw():
    """Edge-balanced src-block boundaries: on a zipf-source graph no
    block may hold the bulk of the edges (uniform spans put ~40%+ in the
    hub block -> 10 GB gathered-message OOM at papers100M shard scale)."""
    from gammagl_tpu.parallel import build_halo_partition_planned
    rng = np.random.default_rng(0)
    n, e = 512, 20000
    src = (rng.zipf(1.35, e) - 1) % n          # hub-heavy sources
    dst = rng.integers(0, n, e)
    ei = np.stack([src, dst])
    w = np.ones(e, np.float32)
    part = build_halo_partition_planned(ei, n, 1, w, R=16, ET=64,
                                        num_src_blocks=4)
    B = len(part.src_spans)
    assert B >= 4
    # per-block real edge mass from the padded weights (pads carry w=0)
    blocks = [part.in_w] + [x[1] for x in part.in_extra]
    masses = [float(np.asarray(b).sum()) for b in blocks]
    assert len(masses) == B
    assert max(masses) <= 1.5 * e / 4 + 64, masses

    # numerics unchanged vs dense
    x = rng.normal(size=(n, 8)).astype(np.float32)
    mesh = _mesh(1)
    total = part.num_parts * part.rows_per
    xs = jax.device_put(jnp.asarray(np.pad(x, ((0, total - n), (0, 0)))),
                        NamedSharding(mesh, P("dp")))
    out = jax.jit(make_halo_spmm_planned(mesh, part, kernel=True))(xs)
    ref = _dense_ref(ei, w, x, n)
    np.testing.assert_allclose(np.asarray(out)[:n], ref, rtol=2e-4,
                               atol=2e-4)


def test_src_block_bounds_balance_multidevice():
    """num_parts > 1: the chunking cap must bound PER-DEVICE span mass
    (a cap from the global edge total would let one device's hub block
    grow num_parts x past the per-device OOM target). Regression test
    for the round-2 advisor finding (halo_plan.py hub-chunking cap)."""
    from gammagl_tpu.parallel import build_halo_partition_planned
    rng = np.random.default_rng(1)
    n, e, ndev = 512, 24000, 4
    rows_per = n // ndev
    # hub sources concentrated on ONE device's local rows so the global
    # total is ~ndev x that device's interior mass
    src = (rng.zipf(1.35, e) - 1) % rows_per   # device-0 local hub rows
    dst = rng.integers(0, n, e)
    ei = np.stack([src, dst])
    w = np.ones(e, np.float32)
    part = build_halo_partition_planned(ei, n, ndev, w, R=16, ET=64,
                                        num_src_blocks=4, balance=False)
    B = len(part.src_spans)
    assert B >= 4
    # per-device interior mass per span block must respect the
    # worst-device cap, not the global-total cap
    worst_dev = e  # every interior edge is owned by device 0 here
    cap = -(-worst_dev // 4)
    blocks = [part.in_w] + [x[1] for x in part.in_extra]
    for b in blocks:
        per_dev = np.asarray(b).reshape(ndev, -1).sum(axis=1)
        assert per_dev.max() <= 1.5 * cap + 64, per_dev

    # numerics unchanged vs dense
    x = rng.normal(size=(n, 8)).astype(np.float32)
    mesh = _mesh(ndev)
    total = part.num_parts * part.rows_per
    xs = jax.device_put(jnp.asarray(np.pad(x, ((0, total - n), (0, 0)))),
                        NamedSharding(mesh, P("dp")))
    out = jax.jit(make_halo_spmm_planned(mesh, part, kernel=True))(xs)
    ref = _dense_ref(ei, w, x, n)
    np.testing.assert_allclose(np.asarray(out)[:n], ref, rtol=2e-4,
                               atol=2e-4)


def test_planned_packed_gather_path_matches(monkeypatch):
    """bf16 F=256 engages the packed-gather kernel inside the shard_map
    body (interpret off-TPU; opt-in — see halo_plan._PACKED_HALO); value
    and gradient must match the dense reference like the unpacked
    path."""
    import gammagl_tpu.parallel.halo_plan as hp
    monkeypatch.setattr(hp, "_PACKED_HALO", True)
    n, ndev = 96, 4
    rng = np.random.default_rng(21)
    ei = np.stack([rng.integers(0, n, 700), rng.integers(0, n, 700)])
    w = rng.normal(size=700).astype(np.float32)
    x = rng.normal(size=(n, 256)).astype(np.float32)
    mesh = _mesh(ndev)
    part = build_halo_partition_planned(ei, n, ndev, w, R=8, ET=128)
    xs = jax.device_put(jnp.asarray(pad_nodes(x, part), jnp.bfloat16),
                        NamedSharding(mesh, P("dp")))
    spmm = make_halo_spmm_planned(mesh, part, kernel=True)
    out = jax.jit(spmm)(xs)
    ref = _dense_ref(ei, w, np.asarray(jnp.asarray(x, jnp.bfloat16),
                                       np.float64), n)
    np.testing.assert_allclose(
        unpad_nodes(out, part).astype(np.float64), ref, rtol=2e-2,
        atol=2e-1)  # bf16 features
    g = jax.jit(jax.grad(
        lambda v: jnp.sum(spmm(v).astype(jnp.float32) ** 2)))(xs)
    a = np.zeros((n, n), np.float64)
    np.add.at(a, (ei[1], ei[0]), w)
    xd = np.asarray(jnp.asarray(x, jnp.bfloat16), np.float64)
    refg = 2 * a.T @ (a @ xd)
    np.testing.assert_allclose(unpad_nodes(g, part).astype(np.float64),
                               refg, rtol=5e-2, atol=2.0)


def test_planned_packed_srcblocked_fold_matches(monkeypatch):
    """num_src_blocks > 1 on the packed path engages the round-5
    IN-KERNEL partial folding (segment_matmul_dyn_packed out_acc): each
    block's kernel folds the previous block's full-size partial, and
    the boundary aggregation folds last — the chain must match the
    dense reference in value and gradient exactly like the outside-add
    formulation it replaced."""
    import gammagl_tpu.parallel.halo_plan as hp
    monkeypatch.setattr(hp, "_PACKED_HALO", True)
    n, ndev = 96, 4
    rng = np.random.default_rng(23)
    ei = np.stack([rng.integers(0, n, 900), rng.integers(0, n, 900)])
    w = rng.normal(size=900).astype(np.float32)
    x = rng.normal(size=(n, 256)).astype(np.float32)
    mesh = _mesh(ndev)
    part = build_halo_partition_planned(ei, n, ndev, w, R=8, ET=128,
                                        num_src_blocks=3)
    xs = jax.device_put(jnp.asarray(pad_nodes(x, part), jnp.bfloat16),
                        NamedSharding(mesh, P("dp")))
    spmm = make_halo_spmm_planned(mesh, part, kernel=True)
    out = jax.jit(spmm)(xs)
    ref = _dense_ref(ei, w, np.asarray(jnp.asarray(x, jnp.bfloat16),
                                       np.float64), n)
    np.testing.assert_allclose(
        unpad_nodes(out, part).astype(np.float64), ref, rtol=2e-2,
        atol=2e-1)
    g = jax.jit(jax.grad(
        lambda v: jnp.sum(spmm(v).astype(jnp.float32) ** 2)))(xs)
    a = np.zeros((n, n), np.float64)
    np.add.at(a, (ei[1], ei[0]), w)
    xd = np.asarray(jnp.asarray(x, jnp.bfloat16), np.float64)
    refg = 2 * a.T @ (a @ xd)
    np.testing.assert_allclose(unpad_nodes(g, part).astype(np.float64),
                               refg, rtol=5e-2, atol=2.0)


def test_hier_planned_packed_gather_matches(monkeypatch):
    import gammagl_tpu.parallel.halo_plan as hp
    monkeypatch.setattr(hp, "_PACKED_HALO", True)
    from gammagl_tpu.parallel import (build_hier_halo_partition_planned,
                                      make_hier_halo_spmm_planned)
    n, S, D = 96, 2, 4
    rng = np.random.default_rng(22)
    ei = np.stack([rng.integers(0, n, 700), rng.integers(0, n, 700)])
    w = rng.normal(size=700).astype(np.float32)
    x = rng.normal(size=(n, 256)).astype(np.float32)
    mesh = Mesh(np.asarray(jax.devices()[:S * D]).reshape(S, D),
                ("slice", "dp"))
    part = build_hier_halo_partition_planned(ei, n, S, D, w, R=8, ET=128)
    xs = jax.device_put(jnp.asarray(pad_nodes(x, part), jnp.bfloat16),
                        NamedSharding(mesh, P(("slice", "dp"))))
    out = jax.jit(make_hier_halo_spmm_planned(mesh, part))(xs)
    ref = _dense_ref(ei, w, np.asarray(jnp.asarray(x, jnp.bfloat16),
                                       np.float64), n)
    np.testing.assert_allclose(
        unpad_nodes(out, part).astype(np.float64), ref, rtol=2e-2,
        atol=2e-1)
