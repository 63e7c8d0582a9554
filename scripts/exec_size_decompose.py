"""Decompose the epoch executable size into sub-program contributions.

Compiles pieces of the training hot path separately (ABC shapes) and
prints each serialized-executable size, so remote-upload wall-clock can
be attributed: scan body vs rasterizer vs binning sort vs kNN vs kernels.

Usage: python scripts/exec_size_decompose.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from edgegaussians_tpu.config import load_config
from edgegaussians_tpu.ops import tiles as tiles_mod
from edgegaussians_tpu.ops.knn import knn
from edgegaussians_tpu.ops.projection import project_gaussians
from edgegaussians_tpu.ops.rasterize import rasterize

N = 16384           # resolved ABC Gaussian capacity
W = H = 800
TILE = 16
CAP = 768           # tile_gaussian_capacity
DENSE = 128         # tile_dense_capacity (config default)
OVF = 256           # tile_overflow_tiles
M = 16              # max_tiles_per_gaussian
BACKEND = "pallas" if jax.default_backend() == "tpu" else "jax"


def exec_size(lowered, label):
    compiled = lowered.compile()
    size = None
    try:
        size = len(compiled.runtime_executable().serialize())
    except Exception:
        try:
            size = len(compiled._executable.xla_executable.serialize())
        except Exception:
            size = -1
    mem = compiled.memory_analysis()
    code = getattr(mem, "generated_code_size_in_bytes", -1) if mem else -1
    print(f"{label:46s} exec={size/1e6:8.1f} MB  code={code/1e6:8.1f} MB")
    return size


def main():
    cfg = load_config("configs/ABC_DexiNed.json")
    dense = cfg.model.tile_dense_capacity
    print(f"backend={BACKEND} N={N} cap={CAP} dense={dense} ovf={OVF} M={M}")

    r = np.random.default_rng(0)
    means = jnp.asarray(r.uniform(-0.5, 0.5, (N, 3)), jnp.float32) \
        + jnp.array([0, 0, 2.0])
    quats = jnp.asarray(r.normal(size=(N, 4)), jnp.float32)
    scales = jnp.asarray(
        np.exp(r.uniform(np.log(0.003), np.log(0.03), (N, 3))), jnp.float32)
    opac = jnp.asarray(r.uniform(0.2, 0.95, N), jnp.float32)
    f = 1111.0
    Km = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    viewmat = jnp.eye(4, dtype=jnp.float32)
    target = jnp.zeros((H, W), jnp.float32)

    # 1. rasterize fwd+bwd (ABC shapes)
    def loss_fn(m, q, s, o):
        out = rasterize(m, q, s, o, viewmat, Km, W, H, tile_size=TILE,
                        capacity=CAP, dense_capacity=dense,
                        overflow_tiles=OVF, max_tiles_per_gaussian=M,
                        backend=BACKEND)
        return jnp.mean(jnp.abs(jnp.clip(out.image, 0, 1) - target))

    step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3)))
    exec_size(step.lower(means, quats, scales, opac),
              "rasterize fwd+bwd")

    # 2. rasterize forward only
    fwd = jax.jit(loss_fn)
    exec_size(fwd.lower(means, quats, scales, opac), "rasterize fwd only")

    # 3. binning alone (sort + decode)
    proj = jax.jit(lambda m, q, s, o: project_gaussians(
        m, q, s, o, viewmat, Km, W, H))(means, quats, scales, opac)
    proj = jax.block_until_ready(proj)
    t2 = OVF
    bin_fn = jax.jit(lambda p: tiles_mod.bin_gaussians_two_level(
        p, W, H, TILE, dense, CAP - dense, t2, max_tiles_per_gaussian=M))
    exec_size(bin_fn.lower(proj), "two-level binning (sort+decode)")

    # 4. the pairs sort alone
    keys = jnp.zeros((N * M,), jnp.int32)
    exec_size(jax.jit(jax.lax.sort).lower(keys), f"lax.sort {N*M} int32")

    # 5. kNN (direction-loss top_k)
    alive = jnp.ones((N,), bool)
    knn_fn = jax.jit(lambda p: knn(p, 6, mask=alive))
    exec_size(knn_fn.lower(means), "knn top-6 (16k x 16k, lax.map)")

    # 6. projection fwd+bwd alone
    def ploss(m, q, s, o):
        p = project_gaussians(m, q, s, o, viewmat, Km, W, H)
        return jnp.sum(p.means2d * 1e-3) + jnp.sum(p.conics) + \
            jnp.sum(p.opacities)

    pstep = jax.jit(jax.value_and_grad(ploss, argnums=(0, 1, 2, 3)))
    exec_size(pstep.lower(means, quats, scales, opac), "projection fwd+bwd")


if __name__ == "__main__":
    main()
