"""Benchmark: differentiable edge-splat rasterization throughput on TPU.

Measures the full training hot path — forward render + backward to all four
Gaussian parameter groups — on the ABC-NEF workload shape (800x800 px,
~20k Gaussians; BASELINE.md / configs/ABC_DexiNed.json) and prints ONE JSON
line.

``vs_baseline`` is measured against REF_PX_S = 15 Mpx/s, an estimate of the
reference gsplat CUDA pipeline's fwd+bwd throughput on its published
consumer-GPU environment (the repo itself commits no numbers — BASELINE.md).
"""

import json
import time

import numpy as np

REF_PX_S = 15e6
N_GAUSSIANS = 20000
WIDTH = HEIGHT = 800
TILE_SIZE = 16
CAPACITY = 512
DENSE_CAPACITY = 128
ITERS = 20


def main():
    import jax

    from edgegaussians_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from edgegaussians_tpu.ops.rasterize import rasterize

    backend = "pallas" if jax.default_backend() == "tpu" else "jax"

    r = np.random.default_rng(0)
    means = jnp.asarray(r.uniform(-0.5, 0.5, (N_GAUSSIANS, 3)),
                        jnp.float32) + jnp.array([0, 0, 2.0])
    quats = jnp.asarray(r.normal(size=(N_GAUSSIANS, 4)), jnp.float32)
    scales = jnp.asarray(
        np.exp(r.uniform(np.log(0.003), np.log(0.03), (N_GAUSSIANS, 3))),
        jnp.float32)
    opac = jnp.asarray(r.uniform(0.2, 0.95, N_GAUSSIANS), jnp.float32)
    f = 1111.0
    K = jnp.array([[f, 0, WIDTH / 2], [0, f, HEIGHT / 2], [0, 0, 1]],
                  jnp.float32)
    viewmat = jnp.eye(4, dtype=jnp.float32)
    target = jnp.zeros((HEIGHT, WIDTH), jnp.float32)

    def loss_fn(m, q, s, o):
        out = rasterize(m, q, s, o, viewmat, K, WIDTH, HEIGHT,
                        tile_size=TILE_SIZE, capacity=CAPACITY,
                        dense_capacity=DENSE_CAPACITY, backend=backend)
        return jnp.mean(jnp.abs(jnp.clip(out.image, 0, 1) - target))

    step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3)))
    out = step(means, quats, scales, opac)
    jax.block_until_ready(out)

    t0 = time.time()
    for _ in range(ITERS):
        out = step(means, quats, scales, opac)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / ITERS

    px_s = WIDTH * HEIGHT / dt
    print(json.dumps({
        "metric": "edge_splat_px_per_s_fwd_bwd",
        "value": round(px_s, 1),
        "unit": "px/s/chip",
        "vs_baseline": round(px_s / REF_PX_S, 3),
    }))


if __name__ == "__main__":
    main()
