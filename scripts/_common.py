"""Shared plumbing for the experiment scripts in this directory."""

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np  # noqa: E402

SCAN = "00004926"
GT_BASE = "data/ABC-NEF_Edge/groundtruth"


def scene_run_dir(cfg, out_root: str, scan: str = SCAN) -> str:
    """The per-scene output directory cli/train.py writes to."""
    exp = f"{cfg.output.exp_name}_{cfg.data.edge_detection_method}"
    return os.path.join(out_root, "ABC", exp, scan)


def extract_and_eval(ply: str, cfg, out_dir: str, scan: str = SCAN,
                     gt_base: str = GT_BASE, extraction_seeds: int = 3,
                     scene=None):
    """Run extraction + eval `extraction_seeds` times on one trained PLY.

    Returns a dict of per-seed metric lists: chamfer, f5, f10, f20.
    ``out_dir`` must be the directory holding/receiving the scan's outputs
    (i.e. .../<scan>); evaluate_scan is pointed at its parent.
    """
    from edgegaussians_tpu.cli.evaluate import evaluate_scan
    from edgegaussians_tpu.data import parsers
    from edgegaussians_tpu.eval import metrics as metrics_mod
    from edgegaussians_tpu.extract.pipeline import extract_edges

    if scene is None and cfg.filtering.filter_by_projection:
        scene = parsers.load_scene(cfg.data, scan)

    os.makedirs(out_dir, exist_ok=True)
    out = {"chamfer": [], "f5": [], "f10": [], "f20": []}
    for es in range(extraction_seeds):
        extract_edges(ply, cfg, scene=scene, output_dir=out_dir,
                      save_sampled_points=True, sample_resolution=0.005,
                      seed=es)
        pr = metrics_mod.empty_metrics()
        res = evaluate_scan(scan, gt_base, os.path.dirname(out_dir), pr,
                            use_parametric_edges=True,
                            sample_resolution=0.005)
        if res is None:
            continue
        out["chamfer"].append(res["chamfer_dist"])
        for name, t in (("f5", "0.005"), ("f10", "0.01"), ("f20", "0.02")):
            out[name].append(metrics_mod.f_score(
                np.mean(pr[f"precision_{t}"]), np.mean(pr[f"recall_{t}"])))
    return out
