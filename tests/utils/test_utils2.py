"""Wave-2 utility tests: paths, embeddings IO, Inspector, shortest path."""

import numpy as np
import pytest

from gammagl_tpu.utils import (find_all_simple_paths, read_embeddings,
                               save_embeddings, Inspector, shortest_path)


def test_find_all_simple_paths():
    ei = np.array([[0, 0, 1, 2], [1, 2, 3, 3]])
    paths = find_all_simple_paths(ei, 0, 3, max_length=4)
    assert sorted(paths) == [[0, 1, 3], [0, 2, 3]]


def test_embeddings_roundtrip(tmp_path):
    emb = np.random.default_rng(0).random((5, 3)).astype(np.float32)
    path = str(tmp_path / "emb.txt")
    save_embeddings(path, emb)
    back = read_embeddings(path)
    np.testing.assert_allclose(back, emb, atol=1e-5)


def test_inspector():
    class Layer:
        def message(self, x, edge_weight=None, alpha=1.0):
            return x

    insp = Inspector(Layer).inspect(Layer.message)
    assert insp.keys() == {"x", "edge_weight", "alpha"}
    out = insp.distribute("message", {"x": 1, "alpha": 2, "junk": 3})
    assert out == {"x": 1, "edge_weight": None, "alpha": 2}


def test_shortest_path():
    ei = np.array([[0, 1, 2], [1, 2, 3]])
    d = shortest_path(ei, 4)
    assert d[0, 3] == 3
    assert d[3, 0] == -1


def test_from_smiles_gated():
    from gammagl_tpu.utils import from_smiles
    try:
        import rdkit  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError):
            from_smiles("CCO")
        return
    g = from_smiles("CCO")
    assert g.num_nodes == 3


def test_shortest_path_scipy_matches_python_bfs():
    from gammagl_tpu.utils.shortest_path import _bfs_python
    rng = np.random.default_rng(0)
    ei = rng.integers(0, 20, (2, 60))
    d_fast = shortest_path(ei, 20)
    d_ref = _bfs_python(ei, 20)
    assert (d_fast == d_ref).all()
    # max_dist clips reachable distances but keeps -1 for unreachable
    d_clip = shortest_path(ei, 20, max_dist=2)
    assert d_clip.max() <= 2
    assert ((d_clip == -1) == (d_ref == -1)).all()


def test_bucketed_spatial_encoding():
    from types import SimpleNamespace
    from gammagl_tpu.utils.shortest_path import bucketed_spatial_encoding
    rng = np.random.default_rng(1)
    graphs = []
    for n in (5, 12, 20, 70):
        ei = rng.integers(0, n, (2, 3 * n))
        graphs.append(SimpleNamespace(edge_index=ei, num_nodes=n))
    out = bucketed_spatial_encoding(graphs, buckets=(16, 32), max_dist=4)
    # 5 and 12 share the 16-bucket; 20 -> 32; 70 -> own 8-multiple
    assert sorted(out) == [16, 32, 72]
    b16 = out[16]
    assert b16["dist"].shape == (2, 16, 16) and b16["index"] == [0, 1]
    assert b16["mask"][0].sum() == 5
    # padded rows are exactly the no-relation id
    assert (b16["dist"][0][5:, :] == -1).all()
    assert out[32]["dist"].dtype == np.int32
    d = shortest_path(graphs[2].edge_index, 20, max_dist=4)
    assert (out[32]["dist"][0][:20, :20] == d).all()
