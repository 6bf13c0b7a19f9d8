"""Halo-exchange partitioned SpMM vs single-device reference, plus an
end-to-end partitioned GCN training step on the 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from gammagl_tpu.ops import spmm
from gammagl_tpu.parallel import make_mesh, pad_nodes, unpad_nodes
from gammagl_tpu.parallel.halo import (build_halo_partition, make_halo_spmm,
                                       reorder_bandwidth)
from jax.sharding import NamedSharding, PartitionSpec as P


def _case(seed=0, n=100, e=600, f=16):
    rng = np.random.default_rng(seed)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    return ei, w, x


def _pad_x(x, part):
    # pad_nodes applies the (default-on) balanced relabeling too
    return pad_nodes(x, part)


def test_halo_spmm_matches_dense():
    ei, w, x = _case()
    n = 100
    mesh = make_mesh(axis_names=("dp",))
    part = build_halo_partition(ei, n, 8, w)
    fn = make_halo_spmm(mesh, part)
    xp = jnp.asarray(_pad_x(x, part))
    xp = jax.device_put(xp, NamedSharding(mesh, P("dp")))
    out = fn(xp)
    ref = spmm(jnp.asarray(ei), jnp.asarray(w), jnp.asarray(x),
               num_nodes=n)
    np.testing.assert_allclose(unpad_nodes(out, part), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # padded tail rows receive nothing
    np.testing.assert_allclose(np.asarray(out)[n:], 0.0)


def test_halo_spmm_grad():
    ei, w, x = _case(seed=1, n=64, e=300, f=8)
    mesh = make_mesh(axis_names=("dp",))
    part = build_halo_partition(ei, 64, 8, w)
    fn = make_halo_spmm(mesh, part)
    xp = jnp.asarray(_pad_x(x, part))

    g_halo = jax.grad(lambda x: (fn(x) ** 2).sum())(xp)
    g_ref = jax.grad(lambda x: (spmm(jnp.asarray(ei), jnp.asarray(w), x,
                                     num_nodes=64) ** 2).sum())(
        jnp.asarray(x))
    np.testing.assert_allclose(unpad_nodes(g_halo, part), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_partitioned_gcn_training_step():
    """Full jit'd 2-layer GCN train step over the halo partition."""
    ei, w, x = _case(seed=2, n=80, e=500, f=12)
    n, c = 80, 3
    y = np.random.default_rng(0).integers(0, c, n)
    mesh = make_mesh(axis_names=("dp",))
    part = build_halo_partition(ei, n, 8, np.abs(w))
    fn = make_halo_spmm(mesh, part)
    total = part.num_parts * part.rows_per
    xp = jax.device_put(jnp.asarray(_pad_x(x, part)),
                        NamedSharding(mesh, P("dp")))
    yp = jnp.asarray(pad_nodes(y, part))
    mask = jnp.asarray(np.arange(total) < n)

    params = {
        "w1": jnp.asarray(np.random.default_rng(1).normal(
            size=(12, 16)) * 0.1, jnp.float32),
        "w2": jnp.asarray(np.random.default_rng(2).normal(
            size=(16, c)) * 0.1, jnp.float32),
    }
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x):
        def loss_fn(p):
            h = jax.nn.relu(fn(x @ p["w1"]))
            logits = fn(h @ p["w2"])
            ll = optax.softmax_cross_entropy_with_integer_labels(logits, yp)
            return jnp.where(mask, ll, 0).sum() / mask.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    l0 = None
    for _ in range(15):
        params, opt_state, loss = step(params, opt_state, xp)
        l0 = float(loss) if l0 is None else l0
    assert float(loss) < l0


def test_reorder_bandwidth():
    ei, _, _ = _case(seed=3, n=50, e=200)
    perm, inv = reorder_bandwidth(ei, 50)
    assert sorted(perm.tolist()) == list(range(50))
    np.testing.assert_array_equal(perm[inv], np.arange(50))
