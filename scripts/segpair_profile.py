"""Device-time trace of the v4 vs v5 pair-compositor render step.

Traces the ABC-fixture fwd+bwd step (the bench.py workload) under
jax.profiler for both pair-kernel variants and prints per-step top-op
tables via the self-contained xplane parser (scripts/xplane_top_ops.py).
This is the per-op evidence for the v5 rows of docs/KERNELS.md §7.

Usage (TPU): JAX_PLATFORMS=axon PYTHONPATH=/root/.axon_site \
                 python scripts/segpair_profile.py [--steps 20]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from xplane_top_ops import top_ops

FIXTURE = "/root/repo/bench_fixture/abc_00004926.npz"
TILES = dict(tile_size=16, capacity=768, max_tiles_per_gaussian=16,
             pair_budget=49152, occupancy_sort=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--top", type=int, default=14)
    ap.add_argument("--out", default="/tmp/segpair_trace")
    ap.add_argument("--variants", default="1,seg")
    args = ap.parse_args()

    import glob

    import jax
    import jax.numpy as jnp

    from edgegaussians_tpu.ops.rasterize import rasterize

    d = np.load(FIXTURE)
    means, quats, scales = (jnp.asarray(d["means"]), jnp.asarray(d["quats"]),
                            jnp.asarray(d["scales"]))
    opac = jnp.asarray(d["opacities"]).reshape(-1)
    viewmats, Ks = jnp.asarray(d["viewmats"]), jnp.asarray(d["Ks"])
    width, height = int(d["width"]), int(d["height"])
    backend = "pallas" if jax.default_backend() == "tpu" else "jax"
    target = jnp.zeros((height, width), jnp.float32)

    for name in args.variants.split(","):
        pk = {"0": False, "1": True}.get(name, name)

        def loss_fn(m, q, s, o, viewmat, K):
            out = rasterize(m, q, s, o, viewmat, K, width, height,
                            backend=backend, pair_kernel=pk, **TILES)
            return jnp.mean(jnp.abs(jnp.clip(out.image, 0, 1) - target))

        step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3)))
        for v in range(8):
            jax.block_until_ready(step(means, quats, scales, opac,
                                       viewmats[v], Ks[v]))
        out_dir = f"{args.out}_{name}"
        t0 = time.time()
        with jax.profiler.trace(out_dir):
            for i in range(args.steps):
                r = step(means, quats, scales, opac,
                         viewmats[i % 8], Ks[i % 8])
            jax.block_until_ready(r)
        dt = (time.time() - t0) / args.steps
        print(f"\n=== variant pair_kernel={name}: {dt * 1e3:.2f} ms/step "
              f"({width * height / dt / 1e6:.1f} Mpx/s wall) ===")
        pbs = sorted(glob.glob(os.path.join(
            out_dir, "**", "*.xplane.pb"), recursive=True))
        if not pbs:
            print("(no xplane.pb captured)")
            continue
        for pname, agg in top_ops(pbs[-1]):
            items = sorted(agg.items(), key=lambda kv: -kv[1][0])
            total = sum(ps for ps, _ in agg.values())
            print(f"{'ms/step':>9} {'%':>5} {'count':>7}  op")
            for opname, (ps, cnt) in items[:args.top]:
                ms = ps / 1e12 * 1e3 / args.steps
                print(f"{ms:9.3f} {100 * ps / max(total, 1):5.1f} "
                      f"{cnt:7d}  {opname[:90]}")
            print(f"total device time: "
                  f"{total / 1e12 * 1e3 / args.steps:.3f} ms/step")


if __name__ == "__main__":
    main()
