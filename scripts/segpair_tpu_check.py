"""Compiled-TPU parity + timing for the v5 segmented pair compositor.

Renders the ABC trained-scene fixture (bench_fixture/abc_00004926.npz)
through the v4 pair kernel and the v5 segmented kernel on the REAL chip,
comparing loss, parameter gradients, and absgrad, then times both
(interleaved A/B; remote-dispatch caveats in CLAUDE.md apply — epoch-level
A/B is the authoritative perf measurement).

Run: JAX_PLATFORMS=axon PYTHONPATH=/root/.axon_site \
         python scripts/segpair_tpu_check.py [--iters 30] [--skip-time]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from edgegaussians_tpu.ops.rasterize import rasterize

FIXTURE = "/root/repo/bench_fixture/abc_00004926.npz"
TILES = dict(tile_size=16, capacity=768, max_tiles_per_gaussian=16,
             pair_budget=49152, occupancy_sort=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--skip-time", action="store_true")
    args = ap.parse_args()

    d = np.load(FIXTURE)
    means = jnp.asarray(d["means"])
    quats = jnp.asarray(d["quats"])
    scales = jnp.asarray(d["scales"])
    opac = jnp.asarray(d["opacities"]).reshape(-1)
    viewmats = jnp.asarray(d["viewmats"])
    Ks = jnp.asarray(d["Ks"])
    width, height = int(d["width"]), int(d["height"])
    backend = "pallas" if jax.default_backend() == "tpu" else "jax"
    print(f"backend: {backend}; n={means.shape[0]}")
    target = jnp.zeros((height, width), jnp.float32)
    sink0 = jnp.zeros((means.shape[0], 2), jnp.float32)

    def make_step(pk):
        def loss_fn(m, q, s, o, sink, viewmat, K):
            out = rasterize(m, q, s, o, viewmat, K, width, height,
                            backend=backend, pair_kernel=pk,
                            absgrad_sink=sink, **TILES)
            return jnp.mean(jnp.abs(jnp.clip(out.image, 0, 1) - target))
        return jax.jit(jax.value_and_grad(loss_fn,
                                          argnums=(0, 1, 2, 3, 4)))

    steps = {"v4": make_step(True), "v5": make_step("seg")}
    res = {}
    for name, step in steps.items():
        t0 = time.time()
        out = jax.block_until_ready(step(means, quats, scales, opac,
                                         sink0, viewmats[0], Ks[0]))
        print(f"{name}: first call (compile) {time.time() - t0:.1f} s")
        res[name] = out

    l4, g4 = res["v4"]
    l5, g5 = res["v5"]
    print(f"loss v4={float(l4):.9f} v5={float(l5):.9f} "
          f"rel={abs(float(l4) - float(l5)) / max(abs(float(l4)), 1e-12):.2e}")
    names = ["means", "quats", "scales", "opac", "absgrad"]
    ok = True
    for a, b, nm in zip(g4, g5, names):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.maximum(np.abs(a), 1e-6)
        rel = np.max(np.abs(a - b) / denom)
        l2rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-12)
        print(f"grad {nm:8s}: max elementwise rel {rel:.2e}  "
              f"l2 rel {l2rel:.2e}")
        ok &= l2rel < 1e-4
    print("PARITY", "PASS" if ok else "FAIL")

    if args.skip_time:
        return
    nv = viewmats.shape[0]
    for name, step in steps.items():
        for v in range(min(nv, 8)):     # warm a few programs
            jax.block_until_ready(step(means, quats, scales, opac, sink0,
                                       viewmats[v], Ks[v]))
    for name, step in steps.items():
        t0 = time.time()
        for i in range(args.iters):
            out = step(means, quats, scales, opac, sink0,
                       viewmats[i % 8], Ks[i % 8])
        jax.block_until_ready(out)
        dt = (time.time() - t0) / args.iters
        print(f"{name}: {dt * 1e3:.2f} ms/step  "
              f"{width * height / dt / 1e6:.1f} Mpx/s")


if __name__ == "__main__":
    main()
