"""Per-stage timing of the rasterization hot path on the current device.

Times (jitted, steady-state) each pipeline stage of one fwd+bwd render on
the bench workload shape, so kernel work targets the real bottleneck.

Usage: python scripts/profile_stages.py [n_gaussians] [k1] [t2]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from edgegaussians_tpu.ops import tiles as tiles_mod
from edgegaussians_tpu.ops.composite import tile_render_two_level
from edgegaussians_tpu.ops.projection import project_gaussians
from edgegaussians_tpu.ops.rasterize import rasterize
from edgegaussians_tpu.ops.tiles import (bin_gaussians, pixel_basis,
                                         tile_origins)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
K1 = int(sys.argv[2]) if len(sys.argv) > 2 else 128
T2 = int(sys.argv[3]) if len(sys.argv) > 3 else 0
WIDTH = HEIGHT = 800
TILE = 16
CAP = 512
BACKEND = "pallas" if jax.default_backend() == "tpu" else "jax"


def timed(fn, *args, iters=20, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:42s} {dt:8.2f} ms")
    return out, dt


def main():
    r = np.random.default_rng(0)
    means = jnp.asarray(r.uniform(-0.5, 0.5, (N, 3)), jnp.float32) \
        + jnp.array([0, 0, 2.0])
    quats = jnp.asarray(r.normal(size=(N, 4)), jnp.float32)
    scales = jnp.asarray(
        np.exp(r.uniform(np.log(0.003), np.log(0.03), (N, 3))), jnp.float32)
    opac = jnp.asarray(r.uniform(0.2, 0.95, N), jnp.float32)
    f = 1111.0
    K = jnp.array([[f, 0, WIDTH / 2], [0, f, HEIGHT / 2], [0, 0, 1]],
                  jnp.float32)
    viewmat = jnp.eye(4, dtype=jnp.float32)
    target = jnp.zeros((HEIGHT, WIDTH), jnp.float32)
    t2 = T2 or max(tiles_mod.tile_grid(WIDTH, HEIGHT, TILE)[2] // 4, 8)

    print(f"device={jax.devices()[0]} N={N} K1={K1} t2={t2} cap={CAP} "
          f"backend={BACKEND}")

    # --- stage 1: projection fwd+bwd
    @jax.jit
    def proj_step(m, q, s, o):
        def lf(m, q, s, o):
            p = project_gaussians(m, q, s, o, viewmat, K, WIDTH, HEIGHT)
            return jnp.sum(p.means2d * 1e-3) + jnp.sum(p.conics) \
                + jnp.sum(p.opacities)
        return jax.value_and_grad(lf, argnums=(0, 1, 2, 3))(m, q, s, o)

    timed(proj_step, means, quats, scales, opac, label="projection fwd+bwd")

    # --- stage 2: binning (not differentiated)
    proj = jax.jit(lambda m, q, s, o: project_gaussians(
        m, q, s, o, viewmat, K, WIDTH, HEIGHT))(means, quats, scales, opac)
    proj = jax.block_until_ready(proj)

    @jax.jit
    def bin_step(p):
        return bin_gaussians(p, WIDTH, HEIGHT, TILE, CAP)

    bins, _ = timed(bin_step, proj, label="binning (sort+decode)")

    # --- stage 3: pack + permute + gather + features + composite fwd+bwd
    origins = tile_origins(WIDTH, HEIGHT, TILE)
    basis = pixel_basis(TILE)

    @jax.jit
    def composite_step(p, bins):
        packed = tiles_mod.pack_gaussian_render_data(p)
        packed_sorted = packed[bins.order]
        counts = jnp.minimum(bins.counts, bins.ranks.shape[1])
        sink = jnp.zeros((N, 2), jnp.float32)

        def lf(ps, sk):
            img = tile_render_two_level(ps, bins.ranks, counts, origins,
                                        basis, bins.order, sk, K1, t2,
                                        BACKEND)
            return jnp.mean(jnp.abs(img))

        return jax.value_and_grad(lf, argnums=(0, 1))(packed_sorted, sink)

    timed(composite_step, proj, bins,
          label="pack+gather+composite fwd+bwd")

    # --- full step
    def loss_fn(m, q, s, o):
        out = rasterize(m, q, s, o, viewmat, K, WIDTH, HEIGHT,
                        tile_size=TILE, capacity=CAP, dense_capacity=K1,
                        overflow_tiles=T2, backend=BACKEND)
        return jnp.mean(jnp.abs(jnp.clip(out.image, 0, 1) - target))

    step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3)))
    timed(step, means, quats, scales, opac, label="FULL fwd+bwd step")


if __name__ == "__main__":
    main()
