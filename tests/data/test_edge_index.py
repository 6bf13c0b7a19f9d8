"""EdgeIndex container + manifold math sanity tests."""

import numpy as np
import jax.numpy as jnp

from gammagl_tpu.data import EdgeIndex
from gammagl_tpu.utils import manifold_math as mm


def test_edge_index_views():
    ei = EdgeIndex(np.array([[2, 0, 1], [0, 1, 1]]))
    assert ei.num_edges == 3
    rowptr, col, perm = ei.get_csr()
    np.testing.assert_array_equal(rowptr, [0, 1, 2, 3])
    np.testing.assert_array_equal(col, [1, 1, 0])
    colptr, row, perm_c = ei.get_csc()
    np.testing.assert_array_equal(colptr, [0, 1, 3, 3])
    srt, perm = ei.sort_by("row")
    assert (np.diff(srt.data[0]) >= 0).all()
    np.testing.assert_array_equal(np.asarray(ei), ei.data)


def test_manifold_roundtrips():
    c = 1.0
    v = jnp.asarray([[0.1, -0.2], [0.3, 0.05]])
    y = mm.expmap0(v, c)
    back = mm.logmap0(y, c)
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), rtol=1e-4,
                               atol=1e-5)
    # mobius identity: x (+) 0 = x
    zero = jnp.zeros_like(v)
    np.testing.assert_allclose(np.asarray(mm.mobius_add(y, zero, c)),
                               np.asarray(y), rtol=1e-5)
    # distance symmetry and zero on diagonal
    d = mm.poincare_distance(y[0], y[1], c)
    d2 = mm.poincare_distance(y[1], y[0], c)
    np.testing.assert_allclose(float(d), float(d2), rtol=1e-5)
    assert float(mm.poincare_distance(y[0], y[0], c)) < 1e-5
    # expmap/logmap around a base point
    x = mm.expmap0(jnp.asarray([[0.05, 0.02], [0.0, 0.1]]), c)
    z = mm.expmap(v * 0.1, x, c)
    vb = mm.logmap(z, x, c)
    np.testing.assert_allclose(np.asarray(vb), np.asarray(v * 0.1),
                               rtol=1e-3, atol=1e-5)
