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
