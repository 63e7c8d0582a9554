"""Multi-scene spread harness: fit_edges + per-scan evaluation over synthetic
scans trained with cli.sweep (see docs/RESULTS.md "multi-scene spread").

Usage:
    python scripts/spread_synth.py --config_file /tmp/spread_cfg.json \
        --gt_base_dir /tmp/synth_abc/groundtruth \
        --output_base_dir /tmp/spread_out/ABC/release_DexiNed \
        --scan_names SYN01,SYN02,SYN03
"""

import argparse
import collections
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from edgegaussians_tpu.cli import evaluate as eval_cli
from edgegaussians_tpu.cli import fit_edges as fit_cli


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_file", required=True)
    ap.add_argument("--gt_base_dir", required=True)
    ap.add_argument("--output_base_dir", required=True)
    ap.add_argument("--scan_names", required=True)
    ap.add_argument("--skip_fit", action="store_true")
    args = ap.parse_args()

    scans = args.scan_names.split(",")
    rows = {}
    for scan in scans:
        if not args.skip_fit:
            rc = fit_cli.main(["--config_file", args.config_file,
                               "--scene_name", scan])
            if rc != 0:
                print(f"{scan}: fit_edges failed rc={rc}")
                continue
        pr = collections.defaultdict(list)
        res = eval_cli.evaluate_scan(scan, args.gt_base_dir,
                                     args.output_base_dir, pr,
                                     use_parametric_edges=True)
        if res is None:
            print(f"{scan}: no predictions")
            continue
        rows[scan] = {**res, **{k: v[0] for k, v in pr.items()}}

    keys = ["chamfer_dist", "acc", "comp", "precision_0.01", "recall_0.01",
            "fscore_0.01", "fscore_0.02"]
    print("\nscan        " + "  ".join(f"{k:>14s}" for k in keys))
    for scan, r in rows.items():
        print(f"{scan:<10s}  " + "  ".join(f"{r[k]:14.4f}" for k in keys))
    if rows:
        vals = {k: np.array([r[k] for r in rows.values()]) for k in keys}
        print("mean        " + "  ".join(f"{vals[k].mean():14.4f}"
                                         for k in keys))
        print("std         " + "  ".join(f"{vals[k].std():14.4f}"
                                         for k in keys))
    print(json.dumps({s: {k: float(v) for k, v in r.items()}
                      for s, r in rows.items()}))


if __name__ == "__main__":
    main()
