"""Synthetic ABC-style scene generator: layout, geometry, and an end-to-end
train -> fit -> evaluate pass on a miniature generated scan."""

import json
import os

import numpy as np

from edgegaussians_tpu.data import synthetic
from edgegaussians_tpu.io import ply as ply_io


def test_wireframe_and_gt_sampling():
    rng = np.random.default_rng(3)
    wf = synthetic.sample_wireframe(rng, n_lines=5, n_curves=3)
    assert wf["lines"].shape == (5, 2, 3)
    assert wf["curves"].shape == (3, 4, 3)
    pts = synthetic.sample_edge_points(wf, spacing=0.005)
    assert pts.shape[0] > 100
    assert pts.min() >= 0.0 and pts.max() <= 1.0
    # consecutive same-edge samples are ~spacing apart
    d = np.linalg.norm(np.diff(pts[:20], axis=0), axis=1)
    assert np.all(d < 0.01)


def test_edge_map_rendering():
    rng = np.random.default_rng(0)
    wf = synthetic.sample_wireframe(rng, n_lines=3, n_curves=1)
    pts = synthetic.sample_edge_points(wf, spacing=0.002)
    c2ws, K = synthetic.make_cameras(rng, n_views=2, width=96, height=96,
                                     focal=130.0)
    img = synthetic.render_edge_map(pts, c2ws[0], K, 96, 96)
    assert img.shape == (96, 96)
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert img.max() > 0.9           # edges land in view
    assert (img > 0.5).mean() < 0.2  # ... and are sparse


def test_generate_scene_layout(tmp_path):
    paths = synthetic.generate_scene(str(tmp_path), "SYN0", seed=1,
                                     n_views=3, width=64, height=64,
                                     n_lines=3, n_curves=1)
    meta = json.loads(open(paths["meta_data"]).read())
    assert meta["width"] == 64 and len(meta["frames"]) == 3
    for fr in meta["frames"]:
        assert os.path.exists(os.path.join(paths["edge_dir"],
                                           fr["rgb_path"]))
        c2w = np.array(fr["camtoworld"])
        # valid rigid transform
        R = c2w[:3, :3]
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-6)
    gt = ply_io.read_point_cloud(paths["gt_ply"])
    assert gt.shape[0] > 50
    wf = json.loads(open(paths["wireframe"]).read())
    assert len(wf["lines"]) == 3 and len(wf["curves"]) == 1


def test_synthetic_end_to_end(tmp_path):
    """Train on a tiny generated scan, fit edges, evaluate vs its GT."""
    from edgegaussians_tpu.cli import evaluate as eval_cli
    from edgegaussians_tpu.cli import fit_edges as fit_cli
    from edgegaussians_tpu.cli import train as train_cli

    base = tmp_path / "synth"
    synthetic.generate_scene(str(base), "SYN1", seed=2, n_views=4,
                             width=96, height=96, n_lines=2, n_curves=0)

    cfg = {
        "model": {
            "init_random_init": True, "init_min_num_gaussians": 256,
            "random_init_box_center": 0.5, "random_init_box_size": 1.0,
            "init_scales_val": 0.02, "init_opacity_val": 0.2,
            "if_duplicate_high_pos_grad": False,
            "if_cull_low_opacity": False, "if_cull_wayward": False,
            "if_cull_gaussians_not_projecting": False,
            "max_num_gaussians": 256, "tile_gaussian_capacity": 64,
            "tile_dense_capacity": 0, "tile_size": 16,
        },
        "training": {
            "num_epochs": 5,
            "optim": {
                "means": {"type": "step", "start_lr": 2e-3,
                          "milestones": [], "gamma": 1.0},
                "scales": {"type": "start_at", "start_lr": 2e-3,
                           "start_at_epoch": 0},
                "quats": {"type": "start_at", "start_lr": 2e-3,
                          "start_at_epoch": 0},
                "opacities": {"type": "start_at", "start_lr": 0.05,
                              "start_at_epoch": 0},
            },
            "loss": {
                "orientation_losses": {"start_dir_loss_at_epoch": 99,
                                       "start_ratio_loss_at_epoch": 99},
                "projection_losses": {"start_alternating_at_epoch": 99},
            },
        },
        "data": {"parser_type": "emap", "dataset_name": "ABC",
                 "base_dir": str(base / "data") + "/",
                 "edge_detection_method": "DexiNed",
                 "image_res_scaling_factor": 1, "scale_scene_unit": False},
        "output": {"output_dir": str(tmp_path / "out") + "/",
                   "export_ply": True,
                   "log_dir": str(tmp_path / "logs") + "/",
                   "exp_name": "syn"},
        "filtering": {"filter_by_opacity": True, "filter_opacity_min": 0.01,
                      "filter_stat_outliers": False,
                      "filter_by_projection": False},
        "parametric_fitting": {"angle_thresh": 0.6,
                               "line_ransac_thresh": 0.03,
                               "line_curve_residual_comp_factor": 0.4,
                               "min_cluster_size": 3},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    assert train_cli.main(["--config_file", str(cfg_path),
                           "--scene_name", "SYN1",
                           "--backend", "jax"]) == 0
    assert fit_cli.main(["--config_file", str(cfg_path),
                         "--scene_name", "SYN1"]) == 0

    import collections

    out_dir = str(tmp_path / "out" / "syn_DexiNed")
    metrics_pr = collections.defaultdict(list)
    res = eval_cli.evaluate_scan(
        "SYN1", str(base / "groundtruth"), out_dir, metrics_pr,
        use_parametric_edges=True)
    # a 5-epoch toy run gives weak metrics; only require the pipeline to
    # produce finite numbers against the generated GT
    assert res is not None
    assert np.isfinite(res["chamfer_dist"])
    assert metrics_pr["fscore_0.01"] and \
        np.isfinite(metrics_pr["fscore_0.01"][0])


def test_detector_noise():
    rng = np.random.default_rng(5)
    img = np.zeros((64, 64), np.float32)
    img[30:33, 10:50] = 1.0
    noisy = synthetic.add_detector_noise(img, rng, dropout=0.3,
                                         n_spurious=4,
                                         intensity_jitter=0.1)
    assert noisy.shape == img.shape
    assert 0.0 <= noisy.min() and noisy.max() <= 1.0
    # dropout removed some edge mass on the band...
    band = noisy[30:33, 10:50]
    assert band.sum() < img[30:33, 10:50].sum()
    # ...and spurious blobs added response off the band
    off = noisy.copy()
    off[28:35, 8:52] = 0.0
    assert off.sum() > 0.5
