"""Camera math tests (reference: cameras.py, colmap_read_write_model.py)."""

import numpy as np

from edgegaussians_tpu.cameras import (
    Camera, max_pairwise_center_distance, qvec2rotmat, rotmat2qvec,
    stack_cameras)


def test_qvec_rotmat_roundtrip(rng):
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = qvec2rotmat(q)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-10)
        assert np.isclose(np.linalg.det(R), 1.0)
        q2 = rotmat2qvec(R)
        assert np.allclose(q2, q, atol=1e-8)


def test_identity_quat():
    np.testing.assert_allclose(qvec2rotmat(np.array([1.0, 0, 0, 0])),
                               np.eye(3), atol=1e-12)


def test_camera_from_colmap_viewmat():
    q = np.array([1.0, 0, 0, 0])
    t = np.array([1.0, 2.0, 3.0])
    cam = Camera.from_colmap(480, 640, 500, 500, 320, 240, q, t)
    vm = cam.viewmat
    np.testing.assert_allclose(vm[:3, :3], np.eye(3))
    np.testing.assert_allclose(vm[:3, 3], t)
    np.testing.assert_allclose(vm[3], [0, 0, 0, 1])
    np.testing.assert_allclose(cam.center, -t)
    np.testing.assert_allclose(
        cam.K, [[500, 0, 320], [0, 500, 240], [0, 0, 1]])


def test_camera_from_camtoworld_inverts():
    rng = np.random.default_rng(0)
    q = rng.normal(size=4); q /= np.linalg.norm(q)
    R_c2w = qvec2rotmat(q)
    t_c2w = rng.normal(size=3)
    c2w = np.eye(4); c2w[:3, :3] = R_c2w; c2w[:3, 3] = t_c2w
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    cam = Camera.from_camtoworld(480, 640, K, c2w)
    # w2c @ c2w == identity
    np.testing.assert_allclose(cam.viewmat @ c2w, np.eye(4), atol=1e-10)


def test_scaling_factor_matches_reference_ceil():
    # reference ceil-rounds scaled size (cameras.py:66-67)
    cam = Camera.from_colmap(481, 641, 500, 500, 320, 240,
                             np.array([1.0, 0, 0, 0]), np.zeros(3),
                             scaling_factor=0.5)
    assert cam.height == 241 and cam.width == 321
    assert np.isclose(cam.fx, 250.0)


def test_scale_translation():
    cam = Camera.from_colmap(480, 640, 500, 500, 320, 240,
                             np.array([1.0, 0, 0, 0]), np.array([2.0, 0, 0]))
    cam2 = cam.scale_translation(0.5)
    np.testing.assert_allclose(cam2.t, [1.0, 0, 0])


def test_stack_and_center_distance():
    cams = [
        Camera.from_colmap(480, 640, 500, 500, 320, 240,
                           np.array([1.0, 0, 0, 0]), np.array([float(i), 0, 0]))
        for i in range(3)]
    Ks, vms, h, w = stack_cameras(cams)
    assert Ks.shape == (3, 3, 3) and vms.shape == (3, 4, 4)
    assert (h, w) == (480, 640)
    assert np.isclose(max_pairwise_center_distance(cams), 2.0)
