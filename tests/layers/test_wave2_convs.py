"""Wave-2 conv shape/finite tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gammagl_tpu.layers.conv import (PNAConv, FILMConv, EdgeConv, GMMConv,
                                     CompConv, GaANConv, DNAConv,
                                     HypergraphConv)


@pytest.fixture
def tiny():
    ei = np.array([[0, 1, 2, 3, 0, 1], [1, 0, 1, 2, 2, 3]])
    x = np.arange(16, dtype=np.float32).reshape(4, 4) / 10.0
    return jnp.asarray(x), jnp.asarray(ei)


def _run(conv, *args, **kw):
    params = conv.init(jax.random.PRNGKey(0), *args, **kw)
    return conv.apply(params, *args, **kw)


def test_pna(tiny):
    x, ei = tiny
    out = _run(PNAConv(out_channels=5), x, ei)
    assert out.shape == (4, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_film(tiny):
    x, ei = tiny
    out = _run(FILMConv(out_channels=6), x, ei)
    assert out.shape == (4, 6)
    et = jnp.asarray(np.array([0, 1, 0, 1, 0, 1]))
    out = _run(FILMConv(out_channels=6, num_relations=2), x, ei, et)
    assert out.shape == (4, 6)


def test_edge_conv(tiny):
    x, ei = tiny
    out = _run(EdgeConv(out_channels=7), x, ei)
    assert out.shape == (4, 7)


def test_gmm(tiny):
    x, ei = tiny
    pseudo = jnp.asarray(np.random.default_rng(0).normal(
        size=(6, 2)).astype(np.float32))
    out = _run(GMMConv(out_channels=5, dim=2, kernel_size=3), x, ei, pseudo)
    assert out.shape == (4, 5)


def test_comp(tiny):
    x, ei = tiny
    et = jnp.asarray(np.array([0, 1, 0, 1, 0, 1]))
    rel = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 4)).astype(np.float32))
    conv = CompConv(out_channels=4, op="sub")
    params = conv.init(jax.random.PRNGKey(0), x, ei, et, rel)
    out, rel_out = conv.apply(params, x, ei, et, rel)
    assert out.shape == (4, 4)
    assert rel_out.shape == (2, 4)


def test_gaan(tiny):
    x, ei = tiny
    out = _run(GaANConv(out_channels=4, heads=2), x, ei)
    assert out.shape == (4, 4)


def test_dna(tiny):
    x, ei = tiny
    x_all = jnp.stack([x, x * 2], axis=1)  # (N, L=2, F=4)
    out = _run(DNAConv(heads=2), x_all, ei)
    assert out.shape == (4, 4)


def test_hypergraph(tiny):
    x, _ = tiny
    # 2 hyperedges: {0,1,2}, {2,3}
    hei = jnp.asarray(np.array([[0, 1, 2, 2, 3], [0, 0, 0, 1, 1]]))
    out = _run(HypergraphConv(out_channels=6), x, hei)
    assert out.shape == (4, 6)
    assert np.isfinite(np.asarray(out)).all()
