"""Drill: partitioned GAT attention tier on the REAL TPU chip.

Runs the halo-attention layer (gammagl_tpu/parallel/halo_attention.py)
on a 1-device mesh over the real chip — real Pallas segment-matmul, no
interpret — and checks forward + gradients against a dense jnp
reference. Multi-device semantics are covered by
tests/parallel/test_halo_attention.py on the 8-virtual-CPU mesh.
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gammagl_tpu.parallel import (build_halo_partition_attn,
                                  make_partitioned_gat_layer)


def dense_gat(ei, x, a_src, a_dst, n, heads, slope=0.2):
    fh = x.shape[1] // heads
    h3 = x.reshape(n, heads, fh).astype(jnp.float32)
    src, dst = ei[0], ei[1]
    as_n = jnp.einsum("nhf,hf->nh", h3, a_src.astype(jnp.float32))
    ad_n = jnp.einsum("nhf,hf->nh", h3, a_dst.astype(jnp.float32))
    e = jax.nn.leaky_relu(as_n[src] + ad_n[dst], slope)
    m = jax.ops.segment_max(e, dst, n)
    ex = jnp.exp(e - m[dst])
    s = jax.ops.segment_sum(ex, dst, n)
    alpha = ex / s[dst]
    out = jax.ops.segment_sum(alpha[:, :, None] * h3[src], dst, n)
    return out.reshape(n, heads * fh)


def main():
    dev = jax.devices()[0]
    print("device:", dev.platform, dev)
    n, e, heads, fh = 2048, 16384, 4, 32
    rng = np.random.default_rng(0)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    ei = np.concatenate([ei, np.stack([np.arange(n)] * 2)], 1)
    x = (rng.normal(size=(n, heads * fh)) * 0.5).astype(np.float32)
    a_src = (rng.normal(size=(heads, fh)) * 0.5).astype(np.float32)
    a_dst = (rng.normal(size=(heads, fh)) * 0.5).astype(np.float32)

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("dp",))
    part = build_halo_partition_attn(ei, n, 1, R=256, ET=512)
    total = part.num_parts * part.rows_per
    layer = make_partitioned_gat_layer(mesh, part, heads)
    xs = jax.device_put(jnp.asarray(np.pad(x, ((0, total - n), (0, 0)))),
                        NamedSharding(mesh, P("dp")))

    out = jax.jit(layer)(xs, jnp.asarray(a_src), jnp.asarray(a_dst))
    ref = dense_gat(jnp.asarray(ei), jnp.asarray(x), jnp.asarray(a_src),
                    jnp.asarray(a_dst), n, heads)
    err = float(jnp.max(jnp.abs(jnp.asarray(np.asarray(out))[:n] - ref)))
    print(f"forward max err: {err:.2e}")
    assert err < 5e-4, err

    def loss(xv, asv, adv):
        return jnp.sum(layer(xv, asv, adv) ** 2)

    gx, gas, gad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(
        xs, jnp.asarray(a_src), jnp.asarray(a_dst))

    def ref_loss(xv, asv, adv):
        return jnp.sum(dense_gat(jnp.asarray(ei), xv, asv, adv,
                                 n, heads) ** 2)

    rx, ras, rad = jax.grad(ref_loss, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(a_src), jnp.asarray(a_dst))
    ex = float(jnp.max(jnp.abs(jnp.asarray(np.asarray(gx))[:n] - rx)))
    es = float(jnp.max(jnp.abs(jnp.asarray(np.asarray(gas)) - ras)))
    ed = float(jnp.max(jnp.abs(jnp.asarray(np.asarray(gad)) - rad)))
    print(f"grad max err: x {ex:.2e}  a_src {es:.2e}  a_dst {ed:.2e}")
    scale = float(jnp.max(jnp.abs(rx)))
    assert ex < 5e-3 * max(scale, 1.0), (ex, scale)
    assert es < 2e-2 and ed < 2e-2, (es, ed)
    print("HALO ATTENTION DRILL OK")


if __name__ == "__main__":
    main()
