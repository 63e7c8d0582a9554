"""Multi-scene training sweep (BASELINE.json configs[4]).

Trains many scenes with one config. Scenes are partitioned across JAX
processes (multi-host: one host group per scene subset, embarrassingly
parallel — SURVEY §5.8); within a process they run sequentially, reusing
the compiled epoch function across scenes of identical geometry.

    python -m edgegaussians_tpu.cli.sweep --config_file configs/ABC_DexiNed.json \
        --scene_names 00004926,00000952,...   [--backend pallas]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from edgegaussians_tpu.config import load_config
from edgegaussians_tpu.data import parsers, seed_points as seeds_mod
from edgegaussians_tpu.models.gaussians import export_as_ply
from edgegaussians_tpu.train import trainer


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_file", type=str, required=True)
    ap.add_argument("--scene_names", type=str, required=True,
                    help="comma-separated, or 'all' to scan base_dir")
    ap.add_argument("--backend", type=str, default="auto")
    ap.add_argument("--force_rerun", action="store_true")
    args = ap.parse_args(argv)

    from edgegaussians_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    cfg = load_config(args.config_file)
    if args.scene_names == "all":
        scenes = sorted(os.listdir(cfg.data.base_dir))
    else:
        scenes = args.scene_names.split(",")

    # partition scenes across host processes (multi-host DP sweep)
    pidx, pcnt = jax.process_index(), jax.process_count()
    my_scenes = scenes[pidx::pcnt]
    print(f"process {pidx}/{pcnt}: {len(my_scenes)} scenes")

    exp_name = f"{cfg.output.exp_name}_{cfg.data.edge_detection_method}"
    results = {}
    for scene_name in my_scenes:
        output_dir = os.path.join(cfg.output.output_dir, exp_name,
                                  scene_name)
        ply_path = os.path.join(output_dir, "gaussians_all.ply")
        if os.path.exists(ply_path) and not args.force_rerun:
            print(f"{scene_name}: already trained, skipping")
            continue
        rng = np.random.default_rng(cfg.training.seed)
        if cfg.model.init_random_init:
            seeds = seeds_mod.init_seed_points_random(
                cfg.model.init_min_num_gaussians,
                cfg.model.random_init_box_center,
                cfg.model.random_init_box_size, rng)
        else:
            _, _, seed_path = parsers.get_paths_from_data_config(
                cfg.data, scene_name)
            seeds = seeds_mod.init_seed_points_from_file(
                seed_path, cfg.model.init_min_num_gaussians, rng)
        scene = parsers.load_scene(cfg.data, scene_name)
        t0 = time.time()
        ts = trainer.train(scene, seeds, cfg, backend=args.backend)
        elapsed = time.time() - t0
        os.makedirs(output_dir, exist_ok=True)
        n = export_as_ply(ts.gaussians, ply_path)
        results[scene_name] = {"seconds": elapsed, "gaussians": n}
        print(f"{scene_name}: {n} Gaussians in {elapsed:.1f}s")

    summary = os.path.join(cfg.output.output_dir, exp_name,
                           f"sweep_p{pidx}.json")
    os.makedirs(os.path.dirname(summary), exist_ok=True)
    with open(summary, "w") as f:
        json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
