"""Native C++ KD-tree extension: parity with the scipy fallback.

Runs only when the extension is built (python setup.py build_ext --inplace);
the suite otherwise covers the scipy path through the same interface.
"""

import numpy as np
import pytest

from edgegaussians_tpu.eval import neighbors


pytestmark = pytest.mark.skipif(not neighbors.HAVE_NATIVE,
                                reason="native kdtree extension not built")


def test_native_matches_scipy_k1():
    from scipy.spatial import cKDTree
    r = np.random.default_rng(1)
    data, query = r.random((3000, 3)), r.random((2000, 3))
    d_n, i_n = neighbors._native_kdtree.query(data, query, 1)
    d_s, i_s = cKDTree(data).query(query, k=1)
    np.testing.assert_allclose(np.ravel(d_n), d_s, rtol=1e-12)
    assert (np.ravel(i_n) == i_s).all()


def test_native_matches_scipy_k5_with_duplicates():
    from scipy.spatial import cKDTree
    r = np.random.default_rng(2)
    data = np.repeat(r.random((500, 3)), 2, axis=0)    # exact ties
    query = data[::3] + 1e-9
    d_n, i_n = neighbors._native_kdtree.query(data, query, 5)
    d_s, _ = cKDTree(data).query(query, k=5)
    # tie-broken index order may differ; distances must agree
    np.testing.assert_allclose(np.asarray(d_n), d_s, rtol=1e-9, atol=1e-12)


def test_knn_self_excludes_self():
    pts = np.random.default_rng(3).random((200, 3))
    d, i = neighbors.knn_self(pts, 4)
    assert d.shape == (200, 4) and i.shape == (200, 4)
    assert (i != np.arange(200)[:, None]).all()
    assert (d > 0).all()
