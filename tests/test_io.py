"""PLY / COLMAP I/O round-trip tests (schema contract: io_utils.py:4-39)."""

import numpy as np
import pytest

from edgegaussians_tpu.io import ply as ply_io


def test_gaussian_ply_roundtrip(tmp_path, rng):
    n = 17
    means = rng.normal(size=(n, 3)).astype(np.float32)
    scales = np.abs(rng.normal(size=(n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(size=(n, 1)).astype(np.float32)

    path = str(tmp_path / "g.ply")
    ply_io.write_gaussian_params_as_ply(means, scales, quats, opac, path)
    m2, s2, q2, o2 = ply_io.read_gaussian_params_from_ply(path)
    np.testing.assert_allclose(m2, means, rtol=1e-6)
    np.testing.assert_allclose(s2, scales, rtol=1e-6)
    np.testing.assert_allclose(q2, quats, rtol=1e-6)
    np.testing.assert_allclose(o2, opac, rtol=1e-6)


def test_ply_header_schema(tmp_path, rng):
    """The 11-field schema must match the reference byte contract."""
    path = str(tmp_path / "g.ply")
    ply_io.write_gaussian_params_as_ply(
        np.zeros((2, 3)), np.ones((2, 3)), np.ones((2, 4)),
        np.ones((2, 1)), path)
    header = open(path, "rb").read(400).split(b"end_header")[0].decode()
    for field in ["x", "y", "z", "scale1", "scale2", "scale3",
                  "quat1", "quat2", "quat3", "quat4", "opacity"]:
        assert f"property float {field}" in header
    assert "binary_little_endian" in header


def test_major_dirs_ply_roundtrip(tmp_path, rng):
    pos = rng.normal(size=(5, 3)).astype(np.float32)
    dirs = rng.normal(size=(5, 3)).astype(np.float32)
    path = str(tmp_path / "d.ply")
    ply_io.write_pts_with_major_dirs_as_ply(pos, dirs, path)
    p2, d2 = ply_io.read_pts_with_major_dirs_from_ply(path)
    np.testing.assert_allclose(p2, pos, rtol=1e-6)
    np.testing.assert_allclose(d2, dirs, rtol=1e-6)


def test_ascii_ply_read(tmp_path):
    path = str(tmp_path / "a.ply")
    pts = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    ply_io.write_ply(path, {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2]},
                     binary=False)
    back = ply_io.read_point_cloud(path)
    np.testing.assert_allclose(back, pts, rtol=1e-5)


def test_colmap_text_roundtrip(tmp_path):
    from edgegaussians_tpu.io import colmap as colmap_io
    cam_file = tmp_path / "cameras.txt"
    cam_file.write_text(
        "# comment\n1 PINHOLE 640 480 500.0 501.0 320.0 240.0\n")
    cams = colmap_io.read_cameras_text(str(cam_file))
    assert cams[1].model == "PINHOLE"
    assert cams[1].width == 640
    np.testing.assert_allclose(cams[1].params, [500.0, 501.0, 320.0, 240.0])

    img_file = tmp_path / "images.txt"
    img_file.write_text(
        "1 0.9 0.1 0.2 0.3 1.0 2.0 3.0 1 img0.png\n"
        "100 200 -1\n")
    images = colmap_io.read_images_text(str(img_file))
    assert images[1].name == "img0.png"
    np.testing.assert_allclose(images[1].qvec, [0.9, 0.1, 0.2, 0.3])

    pts_file = tmp_path / "points3D.txt"
    pts_file.write_text("7 1.0 2.0 3.0 255 0 0 0.5 1 0\n")
    pts = colmap_io.read_points3D_text(str(pts_file))
    np.testing.assert_allclose(pts[7].xyz, [1.0, 2.0, 3.0])


def test_colmap_database_roundtrip(tmp_path):
    """COLMAP database.db schema: write cameras/images/keypoints/matches,
    read them back (reference counterpart: utils/colmap_database.py)."""
    from edgegaussians_tpu.io import colmap_db

    path = str(tmp_path / "database.db")
    kp1 = np.random.default_rng(0).uniform(0, 800, (12, 2)).astype(np.float32)
    kp2 = np.random.default_rng(1).uniform(0, 800, (9, 2)).astype(np.float32)
    matches = np.array([[0, 3], [5, 1], [11, 8]], np.uint32)

    with colmap_db.ColmapDatabase(path) as db:
        cam = db.add_camera(model=1, width=800, height=800,
                            params=[1111.0, 1111.0, 400.0, 400.0])
        im1 = db.add_image("a.png", cam)
        im2 = db.add_image("b.png", cam)
        db.add_keypoints(im1, kp1)
        db.add_keypoints(im2, kp2)
        db.add_matches(im1, im2, matches)
        db.add_two_view_geometry(im1, im2, matches)

    db = colmap_db.ColmapDatabase(path)
    cams = db.cameras()
    assert cams[cam][0] == 1 and cams[cam][1] == 800
    np.testing.assert_allclose(cams[cam][3], [1111.0, 1111.0, 400.0, 400.0])
    assert db.images() == {im1: ("a.png", cam), im2: ("b.png", cam)}
    np.testing.assert_allclose(db.keypoints(im1), kp1)
    np.testing.assert_array_equal(db.matches(im1, im2), matches)
    # symmetric pair key: query in reverse order flips columns
    np.testing.assert_array_equal(db.matches(im2, im1), matches[:, ::-1])
    pid = colmap_db.image_ids_to_pair_id(im2, im1)
    assert colmap_db.pair_id_to_image_ids(pid) == (im1, im2)
    db.close()
