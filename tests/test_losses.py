"""Loss semantics tests (reference: losses.py, edge_gs.py:288-380)."""

import jax
import jax.numpy as jnp
import numpy as np

from edgegaussians_tpu.models import losses
from edgegaussians_tpu.ops.knn import knn
from edgegaussians_tpu.ops.transforms import (major_directions,
                                              quats_to_rotmats)


def test_masked_l1():
    pred = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    gt = jnp.zeros((2, 2))
    mask = jnp.array([[True, False], [False, True]])
    assert np.isclose(float(losses.masked_l1(pred, gt, mask)), 2.5)


def test_weighted_l1():
    pred = jnp.array([[1.0, 2.0]])
    gt = jnp.zeros((1, 2))
    w = jnp.array([[0.5, 1.0]])
    assert np.isclose(float(losses.weighted_l1(pred, gt, w)), 1.25)


def test_weight_mask_inverse_frequency():
    edge_mask = jnp.array([[True, False, False, False]])
    w = losses.compute_weight_mask(edge_mask)
    assert np.isclose(float(w[0, 0]), 0.75)      # edge weight = #bg / total
    assert np.isclose(float(w[0, 1]), 0.25)      # bg weight = #edge / total


def test_projection_whole_l1_l2():
    pred = jnp.full((4, 4), 0.5)
    gt = jnp.zeros((4, 4))
    assert np.isclose(float(losses.projection_loss_whole(pred, gt, "l1")), 0.5)
    assert np.isclose(float(losses.projection_loss_whole(pred, gt, "l2")), 0.25)


def test_bg_edge_ratio_components():
    """bg_edge_ratio = edge masked-L1 + sampled-bg masked-L1."""
    key = jax.random.PRNGKey(0)
    h = w = 16
    gt = jnp.zeros((h, w)).at[4:6, :].set(1.0)
    edge_mask = gt >= 0.5
    pred = jnp.full((h, w), 0.25)
    loss = losses.projection_loss_bg_edge_ratio(pred, gt, edge_mask, 1.0, key)
    # edge term = |0.25-1| = 0.75; bg term = |0.25 - gt(sampled flat px)|
    # sampled flat pixels come from [0, #bg) and gt there is 0 or 1
    assert 0.75 < float(loss) < 0.75 + 1.01


def test_kth_smallest_matches_sort_selection():
    """Bisection order statistic selects exactly the sort-based set."""
    key = jax.random.PRNGKey(3)
    for n, m, k in [(4096, 4000, 100), (4096, 4000, 4000),
                    (4096, 100, 500), (65536, 60000, 3000)]:
        key, sk = jax.random.split(key)
        flat = jnp.arange(n)
        scores = jnp.where(flat < m, jax.random.uniform(sk, (n,)), 2.0)
        kth_sort = jnp.sort(scores)[jnp.clip(k - 1, 0, n - 1)]
        kth_bis = losses._kth_smallest(scores, jnp.int32(k))
        assert bool(jnp.all((scores <= kth_sort) == (scores <= kth_bis))), \
            (n, m, k)


def test_knn_exact():
    pts = jnp.array([[0.0, 0, 0], [1.0, 0, 0], [2.5, 0, 0], [10.0, 0, 0]])
    d, idx = knn(pts, 2)
    np.testing.assert_array_equal(np.array(idx[0]), [1, 2])
    np.testing.assert_allclose(np.array(d[0]), [1.0, 2.5], atol=1e-5)
    np.testing.assert_array_equal(np.array(idx[3]), [2, 1])


def test_knn_mask_excludes_dead():
    pts = jnp.array([[0.0, 0, 0], [0.1, 0, 0], [1.0, 0, 0], [2.0, 0, 0]])
    mask = jnp.array([True, False, True, True])
    _, idx = knn(pts, 2, mask=mask)
    assert 1 not in np.array(idx[0])


def test_major_directions():
    # identity quat: major axis = column of I at argmax scale
    quats = jnp.array([[1.0, 0, 0, 0]])
    scales = jnp.array([[0.1, 0.5, 0.2]])
    d = major_directions(scales, quats)
    np.testing.assert_allclose(np.array(d[0]), [0, 1, 0], atol=1e-6)


def test_quats_to_rotmats_orthonormal(rng):
    q = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)
    R = quats_to_rotmats(q)
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(np.array(eye),
                               np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)


def test_direction_loss_collinear_is_zero():
    """Points on a line with major axes along it -> perfect alignment."""
    n = 12
    means = jnp.stack([jnp.linspace(0, 1, n), jnp.zeros(n), jnp.zeros(n)],
                      axis=1)
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1))
    scales = jnp.tile(jnp.array([[0.5, 0.01, 0.01]]), (n, 1))  # major = x
    alive = jnp.ones((n,), bool)
    nn_idx = losses.update_nearest_neighbors(means, alive, 3)
    val = losses.direction_loss(means, scales, quats, nn_idx, alive, 3)
    assert float(val) < 1e-5


def test_ratio_loss_needle_is_zero():
    scales = jnp.array([[1.0, 1e-12, 1e-12]])
    alive = jnp.ones((1,), bool)
    assert float(losses.ratio_loss(scales, alive)) < 1e-6

    scales2 = jnp.array([[1.0, 0.5, 0.1]])
    assert np.isclose(float(losses.ratio_loss(scales2, alive)), 0.5)
