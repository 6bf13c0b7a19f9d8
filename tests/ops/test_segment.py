"""Kernel correctness: segment reductions vs hand-written expectations.

Mirrors the reference's dtype/dim-parametrized kernel tests
(reference tests/mpops/torch_ops.py:28-60).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from gammagl_tpu.ops import (segment_sum, segment_mean, segment_max,
                             segment_min, segment_softmax)

DTYPES = [jnp.float32, jnp.float64, jnp.int32]


@pytest.mark.parametrize("dtype", DTYPES)
def test_segment_sum(dtype):
    data = jnp.array([[1, 2], [3, 4], [5, 6], [7, 8]], dtype=dtype)
    ids = jnp.array([0, 0, 2, 2])
    out = segment_sum(data, ids, 3)
    expect = np.array([[4, 6], [0, 0], [12, 14]])
    np.testing.assert_allclose(np.asarray(out), expect)


def test_segment_mean_empty_segment():
    data = jnp.array([[2.0], [4.0], [6.0]])
    ids = jnp.array([0, 0, 2])
    out = segment_mean(data, ids, 3)
    np.testing.assert_allclose(np.asarray(out), [[3.0], [0.0], [6.0]])


def test_segment_max_min():
    data = jnp.array([[1.0, -5.0], [3.0, 2.0], [0.0, 7.0]])
    ids = jnp.array([1, 1, 2])
    out = segment_max(data, ids, 4)
    np.testing.assert_allclose(np.asarray(out),
                               [[0, 0], [3, 2], [0, 7], [0, 0]])
    out = segment_min(data, ids, 4)
    np.testing.assert_allclose(np.asarray(out),
                               [[0, 0], [1, -5], [0, 7], [0, 0]])


def test_padded_edges_dropped():
    # padding convention: id == num_segments is a no-op
    data = jnp.ones((5, 2))
    ids = jnp.array([0, 1, 2, 3, 3])
    out_full = segment_sum(data, ids, 3)
    out_pad = segment_sum(data, jnp.array([0, 1, 2, 3, 3]), 3)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_pad))
    assert float(out_full[2, 0]) == 1.0


def test_3d_segment_sum():
    data = jnp.ones((4, 2, 3))
    ids = jnp.array([0, 1, 1, 1])
    out = segment_sum(data, ids, 2)
    assert out.shape == (2, 2, 3)
    np.testing.assert_allclose(np.asarray(out[1]), 3 * np.ones((2, 3)))


def test_segment_softmax():
    data = jnp.array([1.0, 2.0, 3.0, 1.0])
    ids = jnp.array([0, 0, 1, 1])
    out = np.asarray(segment_softmax(data, ids, 2))
    e = np.exp([1.0, 2.0])
    np.testing.assert_allclose(out[:2], e / e.sum(), rtol=1e-6)
    e2 = np.exp([3.0, 1.0])
    np.testing.assert_allclose(out[2:], e2 / e2.sum(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(segment_sum(jnp.asarray(out), ids, 2)), [1.0, 1.0],
        rtol=1e-6)


def test_segment_softmax_multihead():
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32))
    ids = jnp.asarray(np.sort(rng.integers(0, 5, 10)))
    out = segment_softmax(data, ids, 5)
    sums = np.asarray(segment_sum(out, ids, 5))
    counts = np.bincount(np.asarray(ids), minlength=5)
    np.testing.assert_allclose(sums[counts > 0],
                               np.ones_like(sums[counts > 0]), rtol=1e-5)
