"""Extraction pipeline tests: filtering, clustering, fitting, sampling."""

import json

import numpy as np
import pytest

from edgegaussians_tpu.config import (FilteringConfig, FrameworkConfig,
                                      ParametricFittingConfig)
from edgegaussians_tpu.extract import clustering, filtering, fitting
from edgegaussians_tpu.extract.pipeline import (extract_edges,
                                                major_directions_np)
from edgegaussians_tpu.eval import gt as gt_mod
from edgegaussians_tpu.io import ply as ply_io


def test_filter_stat_outliers():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(200, 3)) * 0.01
    pts[0] = [10, 10, 10]
    inliers = filtering.filter_stat_outliers(pts, num_nn=10,
                                             std_multiplier=2.0)
    assert 0 not in inliers
    assert len(inliers) >= 190


def test_filter_by_opacity():
    op = np.array([0.1, 0.5, 0.9])
    mask = filtering.filter_by_opacity(op, 0.3)
    np.testing.assert_array_equal(mask, [False, True, True])


def test_project2d():
    K = np.array([[100.0, 0, 50], [0, 100, 50], [0, 0, 1]])
    R = np.eye(3)
    t = np.zeros((3, 1))
    uv = filtering.project2D_single(K, R, t, np.array([[0.0, 0, 2.0]]))
    np.testing.assert_allclose(uv[0], [50, 50])


def test_filter_by_projection():
    K = np.array([[10.0, 0, 8], [0, 10, 8], [0, 0, 1]])
    cam = {"K": K, "R": np.eye(3), "t": np.zeros((3, 1)), "h": 16, "w": 16}
    edge = np.zeros((16, 16))
    edge[8, 8] = 1.0
    pts = np.array([[0.0, 0, 2.0],     # projects to (8,8): on edge
                    [0.5, 0.5, 2.0]])  # projects to (10.5,10.5): off edge
    mask = filtering.filter_by_projection(pts, [edge], [cam],
                                          visib_thresh=0.5)
    np.testing.assert_array_equal(mask, [True, False])


def test_major_directions_np():
    quats = np.array([[1.0, 0, 0, 0]])
    scales = np.array([[0.01, 0.5, 0.1]])
    d = major_directions_np(scales, quats)
    np.testing.assert_allclose(d[0], [0, 1, 0], atol=1e-12)


def _line_cloud(n=60, noise=0.0005, rng=None):
    rng = rng or np.random.default_rng(0)
    t = np.linspace(0, 1, n)
    pts = np.stack([t, np.zeros(n), np.zeros(n)], axis=1)
    pts += rng.normal(size=pts.shape) * noise
    dirs = np.tile([1.0, 0, 0], (n, 1))
    return pts.astype(np.float64), dirs


def test_clustering_groups_line():
    pts, dirs = _line_cloud()
    clusters, _, _ = clustering.cluster_points_using_directions_greedy(
        pts, dirs, angle_thresh=0.8, min_cluster_size=5,
        rng=np.random.default_rng(1))
    assert len(clusters) >= 1
    assert max(len(c) for c in clusters) > 30


def test_clustering_separates_orthogonal_lines():
    pts1, dirs1 = _line_cloud()
    pts2 = pts1[:, [1, 0, 2]] + np.array([0, 0, 1.0])   # y-axis line, offset
    dirs2 = np.tile([0.0, 1.0, 0], (len(pts2), 1))
    pts = np.concatenate([pts1, pts2])
    dirs = np.concatenate([dirs1, dirs2])
    clusters, _, _ = clustering.cluster_points_using_directions_greedy(
        pts, dirs, angle_thresh=0.8, min_cluster_size=5,
        rng=np.random.default_rng(2))
    # no cluster should span both lines
    for c in clusters:
        ids = np.array(sorted(c))
        assert (ids < 60).all() or (ids >= 60).all()


def test_ransac_line_rejects_outliers():
    pts, _ = _line_cloud(noise=0.0001)
    pts[5] = [0.5, 3.0, 0.0]
    mask = fitting.ransac_line(pts, residual_threshold=0.01,
                               rng=np.random.default_rng(0))
    assert not mask[5]
    assert mask.sum() >= 55


def test_line_fitting_endpoints():
    pts = np.stack([np.linspace(0, 2, 10), np.zeros(10), np.zeros(10)],
                   axis=1)
    line, lam = fitting.line_fitting(pts)
    ends = sorted([line[:3][0], line[3:][0]])
    np.testing.assert_allclose(ends, [0, 2], atol=1e-9)
    assert lam > 0.99


def test_bezier_fit_recovers_curve():
    ctrl = np.array([[0, 0, 0], [0.3, 0.5, 0], [0.7, 0.5, 0], [1, 0, 0]])
    t = np.linspace(0, 1, 50)
    pts = fitting.bezier_curve(t, ctrl.reshape(-1))
    out = fitting.bezier_fit(pts)
    assert out is not None
    popt, _, _ = out
    np.testing.assert_allclose(popt.reshape(4, 3), ctrl, atol=1e-8)


def test_fit_edges_line_vs_curve(tmp_path):
    rng = np.random.default_rng(0)
    # straight-line cluster
    line_pts, line_dirs = _line_cloud(noise=0.0002, rng=rng)
    # curved cluster (parabola in y)
    t = np.linspace(0, 1, 60)
    curve_pts = np.stack([t, 0.3 * np.sin(np.pi * t), np.full(60, 2.0)],
                         axis=1)
    pts = np.concatenate([line_pts, curve_pts])
    dirs = np.concatenate([line_dirs, np.tile([1.0, 0, 0], (60, 1))])
    clusters = [set(range(60)), set(range(60, 120))]
    out_json = str(tmp_path / "parametric_edges.json")
    edges, parametric = fitting.fit_edges(
        clusters, pts, dirs, ransac_thresh=0.005,
        line_curve_residual_comp_factor=0.4, output_json=out_json,
        rng=rng)
    types = [e["type"] for e in edges]
    assert types == ["line", "curve"]
    data = json.load(open(out_json))
    assert len(data["lines_end_pts"]) == 1
    assert len(data["curves_ctl_pts"]) == 1
    assert np.array(data["curves_ctl_pts"][0]).shape == (4, 3)
    line_ep = np.array(data["lines_end_pts"][0])
    assert abs(line_ep[0] - line_ep[3]) > 0.9     # spans ~[0,1] in x


def test_sample_parametric_edges_resolution():
    parametric = {
        "curves_ctl_pts": [[[0, 0, 0], [0.3, 0.3, 0], [0.7, 0.3, 0],
                            [1, 0, 0]]],
        "lines_end_pts": [[0, 0, 0, 1.0, 0, 0]],
    }
    cp, lp, cd, ld = gt_mod.sample_parametric_edges(parametric, 0.01)
    # line length 1.0 -> ~100 samples
    assert 95 <= len(lp) <= 101
    assert len(cp) > 90
    assert len(ld) == len(lp)
    # spacing ~ resolution along the line
    seg = np.diff(lp[:, 0])
    assert np.allclose(seg, seg[0])


def test_bezier_length_straight_line():
    ctrl = np.array([[0, 0, 0], [1 / 3, 0, 0], [2 / 3, 0, 0], [1, 0, 0]])
    length = gt_mod.bezier_curve_length(ctrl, num_samples=20)
    assert np.isclose(length, 1.0, atol=1e-6)


def test_extract_edges_end_to_end(tmp_path):
    """PLY in -> parametric_edges.json + sampled points out."""
    rng = np.random.default_rng(0)
    n = 80
    t = np.linspace(0, 1, n)
    pos = np.stack([t, np.zeros(n), np.zeros(n)], axis=1)
    pos += rng.normal(size=pos.shape) * 0.0005
    scales = np.tile([0.05, 0.005, 0.005], (n, 1))
    quats = np.tile([1.0, 0, 0, 0], (n, 1))
    opac = np.full((n, 1), 0.9)
    ply = str(tmp_path / "gaussians_all.ply")
    ply_io.write_gaussian_params_as_ply(pos, scales, quats, opac, ply)

    cfg = FrameworkConfig()
    cfg.filtering = FilteringConfig(
        filter_by_opacity=True, filter_opacity_min=0.2,
        filter_stat_outliers=True, filter_stat_outlier_num_nn=10,
        filter_stat_outlier_std_mult=3.0, filter_by_projection=False)
    cfg.parametric_fitting = ParametricFittingConfig(
        angle_thresh=0.7, line_ransac_thresh=0.01,
        line_curve_residual_comp_factor=0.4, min_cluster_size=5)

    res = extract_edges(ply, cfg, output_dir=str(tmp_path),
                        save_filtered=True, save_sampled_points=True,
                        seed=0)
    assert (tmp_path / "parametric_edges.json").exists()
    assert (tmp_path / "gaussians_filtered.ply").exists()
    assert (tmp_path / "pts_with_major_dirs.ply").exists()
    assert len(res.edges) >= 1
    assert res.sampled_points is not None and len(res.sampled_points) > 50
