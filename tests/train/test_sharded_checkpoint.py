"""Orbax sharded checkpointing: save/restore a mesh-sharded pytree with
shardings preserved (the papers100M preemption-resume path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from gammagl_tpu.parallel import make_mesh
from gammagl_tpu.train import (load_checkpoint_sharded,
                               save_checkpoint_sharded)


def test_sharded_roundtrip(tmp_path):
    mesh = make_mesh(axis_names=("dp",))
    sh = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    x = jax.device_put(jnp.arange(64.0).reshape(16, 4), sh)
    w = jax.device_put(jnp.ones((4, 3)), rep)
    tree = {"x": x, "w": w}
    save_checkpoint_sharded(tmp_path / "ckpt", tree, step=7)

    tmpl = {"x": jax.device_put(jnp.zeros((16, 4)), sh),
            "w": jax.device_put(jnp.zeros((4, 3)), rep)}
    restored, step = load_checkpoint_sharded(tmp_path / "ckpt", tmpl)
    assert step == 7
    np.testing.assert_array_equal(np.asarray(restored["x"]),
                                  np.asarray(x))
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(w))
    assert restored["x"].sharding.spec == P("dp")
