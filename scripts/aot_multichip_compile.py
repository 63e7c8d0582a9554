"""AOT-compile every sharded strategy for a REAL multi-chip TPU topology.

This environment exposes one physical chip, so multi-chip execution is
validated on virtual CPU meshes (tests/) and 2-process Gloo
(tests/test_multiprocess.py). This script closes the remaining gap —
"does the program actually compile for a multi-chip TPU target?" — via
JAX AOT compilation against a v5e:2x2 topology description: the XLA:TPU
backend compiles the real ICI collectives without needing the chips.

It also answers the round-3 overlap question (docs/SCALING.md §5) with
schedule evidence instead of argument: the optimized HLO shows XLA
COMBINES the per-batch psums (4 param groups + loss + absgrad) into ONE
fused all-reduce, emitted synchronously at the very end of the step —
there is no independent work left to hide it behind (the Adam update
consumes it immediately), which is the structural claim §5 made.

Usage (TPU/axon): JAX_PLATFORMS=axon PYTHONPATH=/root/.axon_site \
    python scripts/aot_multichip_compile.py [--topology v5e:2x2]
"""

import argparse
import re
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def collective_summary(hlo: str) -> dict:
    ops = {}
    for pat in ("all-reduce-start", "all-reduce-done", "all-reduce",
                "all-gather", "reduce-scatter", "collective-permute"):
        # count op definitions, not uses: lines like "%name = ... op(...)"
        n = len(re.findall(rf"= [^=]*\b{pat}\(", hlo))
        if pat == "all-reduce":
            n -= len(re.findall(r"= [^=]*\ball-reduce-(start|done)\(", hlo))
        if n:
            ops[pat] = n
    # fused tuple widths of plain all-reduces
    widths = [len(m.group(1).split("f32")) - 1 for m in
              re.finditer(r"= \(([^)]*)\) all-reduce\(", hlo)]
    if widths:
        ops["fused_allreduce_tuple_widths"] = widths
    return ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:2x2")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh

    from edgegaussians_tpu.config import FrameworkConfig
    from edgegaussians_tpu.parallel import train_dp, train_sharded, train_tp
    from edgegaussians_tpu.train import trainer

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=args.topology)
    devs = list(topo.devices)
    d = len(devs)
    print(f"topology {args.topology}: {d} devices")

    cfg = FrameworkConfig()
    cfg.model.max_num_gaussians = 4096
    cfg.model.tile_gaussian_capacity = 256
    cfg.model.tile_dense_capacity = 128
    W = H = 256
    nv = 2 * d

    r = np.random.default_rng(0)
    seeds = r.uniform(-0.5, 0.5, (512, 3)).astype(np.float32)
    seeds[:, 2] += 2.0
    ts = jax.eval_shape(lambda: trainer.init_train_state(seeds, cfg))
    img_s = jax.ShapeDtypeStruct((nv, H, W), jnp.float32)
    em_s = jax.ShapeDtypeStruct((nv, H, W), jnp.bool_)
    vm_s = jax.ShapeDtypeStruct((nv, 4, 4), jnp.float32)
    K_s = jax.ShapeDtypeStruct((nv, 3, 3), jnp.float32)
    ep_s = jax.ShapeDtypeStruct((), jnp.int32)
    shapes = (ts, ep_s, img_s, em_s, vm_s, K_s)

    results = {}

    def compile_and_summarize(name, fn):
        try:
            hlo = fn.lower(*shapes).compile().as_text()
            results[name] = collective_summary(hlo)
            print(f"{name}: COMPILED for {args.topology}; collectives: "
                  f"{results[name]}")
        except Exception as e:
            results[name] = f"FAIL {type(e).__name__}"
            print(f"{name}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}")

    # view-DP (d x 1) and hierarchical DP x tile-band (d/2 x 2)
    mesh_dp = Mesh(np.array(devs).reshape(d, 1), ("views", "tiles"))
    compile_and_summarize(
        "dp", train_dp.make_dp_train_step(cfg, W, H, "pallas", mesh_dp))
    if d >= 4:
        mesh_h = Mesh(np.array(devs).reshape(d // 2, 2),
                      ("views", "tiles"))
        compile_and_summarize(
            "dp_x_tiles",
            train_dp.make_dp_train_step(cfg, W, H, "pallas", mesh_h))
        # hierarchical DP x Gaussian-TP (d/2 x 2) — SCALING §4's
        # large-capacity recipe (train_dp.py composed-TP mode)
        mesh_vg = Mesh(np.array(devs).reshape(d // 2, 2),
                       ("views", "gauss"))
        compile_and_summarize(
            "dp_x_gauss",
            train_dp.make_dp_train_step(cfg, W, H, "pallas", mesh_vg))

    # tile-band epoch (exact per-view SGD semantics)
    mesh_t = Mesh(np.array(devs), ("tiles",))
    compile_and_summarize(
        "tile_band",
        train_sharded.make_sharded_epoch_fn(cfg, W, H, "pallas", mesh_t))

    # Gaussian-axis TP epoch
    mesh_g = Mesh(np.array(devs), ("gauss",))
    compile_and_summarize(
        "tp", train_tp.make_tp_epoch_fn(cfg, W, H, "pallas", mesh_g))

    ok = [k for k, v in results.items() if isinstance(v, dict)]
    print(f"\n{len(ok)}/{len(results)} strategies AOT-compiled for "
          f"{args.topology}: {ok}")


if __name__ == "__main__":
    main()
