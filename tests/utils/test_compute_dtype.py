"""Global compute-dtype context: one switch flips the conv zoo to bf16
(params stay f32), local knobs still win, and state restores on exit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gammagl_tpu.layers.conv import (GCNConv, GATConv, GATV2Conv, SAGEConv)
from gammagl_tpu.utils import (compute_dtype, get_compute_dtype,
                               resolve_dtype, set_compute_dtype)


def _graph(n=8, e=24, f=6, seed=0):
    rng = np.random.default_rng(seed)
    ei = jnp.asarray(np.stack([rng.integers(0, n, e),
                               rng.integers(0, n, e)]))
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    return x, ei


@pytest.mark.parametrize("conv_ctor", [
    lambda: GCNConv(4, add_bias=False),
    lambda: GATConv(4, heads=2, add_bias=False),
    lambda: GATV2Conv(4, heads=2, add_bias=False),
    lambda: SAGEConv(4, add_bias=False),
], ids=["gcn", "gat", "gatv2", "sage"])
def test_global_bf16_flips_compute(conv_ctor):
    x, ei = _graph()
    conv = conv_ctor()
    params = conv.init(jax.random.PRNGKey(0), x, ei)
    assert conv.apply(params, x, ei).dtype == jnp.float32
    with compute_dtype(jnp.bfloat16):
        out = conv.apply(params, x, ei)
    assert out.dtype == jnp.bfloat16
    # params untouched (f32) either way
    assert all(a.dtype == jnp.float32
               for a in jax.tree_util.tree_leaves(params))
    # context restored
    assert get_compute_dtype() is None
    assert conv.apply(params, x, ei).dtype == jnp.float32


def test_local_knob_wins_over_global():
    x, ei = _graph()
    conv = GCNConv(4, dtype=jnp.float32)
    params = conv.init(jax.random.PRNGKey(0), x, ei)
    with compute_dtype(jnp.bfloat16):
        assert conv.apply(params, x, ei).dtype == jnp.float32


def test_set_and_resolve():
    assert resolve_dtype(None) is None
    set_compute_dtype(jnp.bfloat16)
    try:
        assert resolve_dtype(None) == jnp.bfloat16
        assert resolve_dtype(jnp.float32) == jnp.float32
    finally:
        set_compute_dtype(None)
