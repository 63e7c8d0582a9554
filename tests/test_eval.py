"""Evaluation metric and GT parsing tests (reference: eval_utils.py)."""

import json
import os

import numpy as np
import pytest

from edgegaussians_tpu.eval import gt as gt_mod
from edgegaussians_tpu.eval import metrics as metrics_mod
from edgegaussians_tpu.eval.neighbors import k_nearest_neighbors, knn_self


def test_knn_backend():
    data = np.array([[0.0, 0, 0], [1, 0, 0], [2, 0, 0]])
    q = np.array([[0.1, 0, 0]])
    d, i = k_nearest_neighbors(q, data, k=1)
    assert i[0] == 0 and np.isclose(d[0], 0.1)
    d2, i2 = knn_self(data, 1)
    assert i2[0, 0] == 1 and i2[2, 0] == 1


def test_chamfer_identical_clouds():
    pts = np.random.default_rng(0).normal(size=(100, 3))
    ch, acc, comp = metrics_mod.chamfer_distance(pts, pts)
    assert ch == 0 and acc == 0 and comp == 0


def test_chamfer_known_offset():
    a = np.zeros((10, 3))
    b = np.zeros((10, 3)); b[:, 0] = 0.5
    ch, acc, comp = metrics_mod.chamfer_distance(a, b)
    assert np.isclose(acc, 0.5) and np.isclose(comp, 0.5)
    assert np.isclose(ch, 1.0)


def test_precision_recall_iou():
    gt = np.stack([np.linspace(0, 1, 100), np.zeros(100), np.zeros(100)],
                  axis=1)
    pred = gt.copy()
    pred[:50, 1] = 0.1            # half the predictions are 0.1 away
    m = metrics_mod.empty_metrics([0.02])
    metrics_mod.compute_precision_recall_IOU(pred.astype(np.float32),
                                             gt.astype(np.float32), m,
                                             [0.02])
    assert np.isclose(m["precision_0.02"][0], 0.5)
    # gt[49] is also covered by pred[50] (grid spacing 1/99 < 0.02)
    assert np.isclose(m["recall_0.02"][0], 0.51)
    p, r = 0.5, 0.51
    assert np.isclose(m["fscore_0.02"][0], 2 * p * r / (p + r))
    # reference IoU: min(correct) / (|pred| + |gt| - max(correct))
    assert np.isclose(m["IOU_0.02"][0], 50 / (100 + 100 - 51))


def test_downsample_voxel_average():
    pts = np.array([[0.0, 0, 0], [0.01, 0, 0], [1.0, 1, 1]])
    out = metrics_mod.downsample_point_cloud_average(pts, 2)
    assert len(out) == 2
    np.testing.assert_allclose(sorted(out[:, 0]), [0.005, 1.0])


@pytest.fixture
def gt_dir(tmp_path):
    """Synthetic ABC-style GT: a unit-square sharp edge loop."""
    objs = tmp_path / "obj"
    objs.mkdir()
    verts = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)]
    obj_lines = [f"v {x} {y} {z}\n" for x, y, z in verts]
    (objs / "00000001_model.obj").write_text("".join(obj_lines))

    feats = {"00000001": [
        {"type": "Line", "sharp": True, "vert_indices": [0, 1]},
        {"type": "Line", "sharp": True, "vert_indices": [1, 2]},
        {"type": "BSpline", "sharp": False, "vert_indices": [2, 3]},
    ]}
    stats = {"00000001": {"bbox": [0, 0, 0, 1, 1, 0, 1, 1, 0]}}
    (tmp_path / "chunk_0000_feats.json").write_text(json.dumps(feats))
    (tmp_path / "chunk_0000_stats.json").write_text(json.dumps(stats))
    return str(tmp_path)


def test_get_gt_points(gt_dir):
    raw, sampled, _ = gt_mod.get_gt_points("00000001", interval=0.01,
                                           data_base_dir=gt_dir)
    # only the two sharp lines contribute: 2 edges x 2 vertices
    assert raw.shape == (4, 3)
    # ~100 samples per unit edge at 0.01 interval, both edges
    assert 150 <= len(sampled) <= 210
    # normalized into the 0.5-centered cube
    assert sampled.min() >= -0.05 and sampled.max() <= 1.05


def test_gt_points_edge_type_filter(gt_dir):
    raw, _, _ = gt_mod.get_gt_points("00000001", edge_type="curve",
                                     interval=0.01, data_base_dir=gt_dir)
    assert raw is None      # the only curve is not sharp


def test_vis_smoke(tmp_path):
    from edgegaussians_tpu.vis import vis_utils
    pts = np.random.default_rng(0).normal(size=(30, 3))
    clusters = [set(range(15)), set(range(15, 30))]
    png = str(tmp_path / "c.png")
    vis_utils.visualize_clusters(pts, clusters, save_path=png)
    assert os.path.getsize(png) > 0
    ply = str(tmp_path / "c.ply")
    vis_utils.export_clusters_as_ply(pts, clusters, ply)
    assert os.path.getsize(ply) > 0
    dirs = np.tile([1.0, 0, 0], (30, 1))
    png2 = str(tmp_path / "d.png")
    vis_utils.visualize_points_with_major_dirs(pts, dirs, save_path=png2)
    assert os.path.getsize(png2) > 0
