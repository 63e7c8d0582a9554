"""Per-stage timing of the rasterization hot path on the current device.

Times (jitted, steady-state) each pipeline stage of one fwd+bwd render on
the bench workload shape, so kernel work targets the real bottleneck.

Usage: python scripts/profile_stages.py [n_gaussians] [k1] [t2]
       python scripts/profile_stages.py --fixture    # real ABC workload
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from edgegaussians_tpu.ops import tiles as tiles_mod
from edgegaussians_tpu.ops.composite import tile_render_two_level
from edgegaussians_tpu.ops.projection import project_gaussians
from edgegaussians_tpu.ops.rasterize import rasterize
from edgegaussians_tpu.ops.tiles import (bin_gaussians_two_level,
                                         build_tile_features, pixel_basis,
                                         tile_origins)

FIXTURE = "--fixture" in sys.argv
if FIXTURE:
    sys.argv.remove("--fixture")
N = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
K1 = int(sys.argv[2]) if len(sys.argv) > 2 else 128
T2 = int(sys.argv[3]) if len(sys.argv) > 3 else 0
WIDTH = HEIGHT = 800
TILE = 16
CAP = 512
M = 64
if FIXTURE:  # shipped ABC_DexiNed geometry on the trained bench fixture
    CAP, K1, T2, M = 768, 128, 128, 16
BACKEND = "pallas" if jax.default_backend() == "tpu" else "jax"


def timed(fn, *args, iters=20, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:44s} {dt:8.2f} ms")
    return out, dt


def main():
    global N
    r = np.random.default_rng(0)
    if FIXTURE:
        d = np.load(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench_fixture",
            "abc_00004926.npz"))
        means = jnp.asarray(d["means"])
        quats = jnp.asarray(d["quats"])
        scales = jnp.asarray(d["scales"])
        opac = jnp.asarray(d["opacities"]).reshape(-1)
        K = jnp.asarray(d["Ks"][0])
        viewmat = jnp.asarray(d["viewmats"][0])
        N = means.shape[0]
    else:
        means = jnp.asarray(r.uniform(-0.5, 0.5, (N, 3)), jnp.float32) \
            + jnp.array([0, 0, 2.0])
        quats = jnp.asarray(r.normal(size=(N, 4)), jnp.float32)
        scales = jnp.asarray(
            np.exp(r.uniform(np.log(0.003), np.log(0.03), (N, 3))),
            jnp.float32)
        opac = jnp.asarray(r.uniform(0.2, 0.95, N), jnp.float32)
        f = 1111.0
        K = jnp.array([[f, 0, WIDTH / 2], [0, f, HEIGHT / 2], [0, 0, 1]],
                      jnp.float32)
        viewmat = jnp.eye(4, dtype=jnp.float32)
    target = jnp.zeros((HEIGHT, WIDTH), jnp.float32)
    num_tiles = tiles_mod.tile_grid(WIDTH, HEIGHT, TILE)[2]
    t2 = T2 or max(num_tiles // 4, 8)
    k2 = CAP - K1
    print(f"device={jax.devices()[0]} N={N} K1={K1} k2={k2} t2={t2} "
          f"cap={CAP} M={M} backend={BACKEND}")

    # --- stage 1: projection fwd+bwd
    @jax.jit
    def proj_step(m, q, s, o):
        def lf(m, q, s, o):
            p = project_gaussians(m, q, s, o, viewmat, K, WIDTH, HEIGHT)
            return jnp.sum(p.means2d * 1e-3) + jnp.sum(p.conics) \
                + jnp.sum(p.opacities)
        return jax.value_and_grad(lf, argnums=(0, 1, 2, 3))(m, q, s, o)

    timed(proj_step, means, quats, scales, opac, label="projection fwd+bwd")

    # --- stage 2: binning pieces
    proj = jax.jit(lambda m, q, s, o: project_gaussians(
        m, q, s, o, viewmat, K, WIDTH, HEIGHT))(means, quats, scales, opac)
    proj = jax.block_until_ready(proj)

    sort_fn = jax.jit(lambda p: tiles_mod._sort_pairs(
        p, WIDTH, HEIGHT, TILE, M))
    (skeys, starts, counts, order, ntr), _ = timed(
        sort_fn, proj, label="binning: expand+sort+searchsorted")

    sort_only = jax.jit(lambda k: jax.lax.sort(k))
    keys_flat = jnp.asarray(
        r.integers(0, 2**30, N * M, dtype=np.int32))
    timed(sort_only, keys_flat, label="  lax.sort of N*M int32 alone")

    bin_fn = jax.jit(lambda p: bin_gaussians_two_level(
        p, WIDTH, HEIGHT, TILE, K1, k2, t2, max_tiles_per_gaussian=M))
    bins2, _ = timed(bin_fn, proj, label="binning TOTAL (incl. decode+topk)")
    print(f"    pairs={int(jnp.sum(counts))} "
          f"counts1_sum={int(jnp.sum(bins2.counts1))} "
          f"counts2_sum={int(jnp.sum(bins2.counts2))} trunc={int(ntr)}")

    # --- stage 3: gathers
    packed = tiles_mod.pack_gaussian_render_data(proj)
    packed_sorted = packed[bins2.order]
    gath_fn = jax.jit(lambda ps, b: (ps[b.ranks1], ps[b.ranks2]))
    (g1, g2), _ = timed(gath_fn, packed_sorted, bins2,
                        label="row gathers [T,k1]+[t2,k2]")

    origins = tile_origins(WIDTH, HEIGHT, TILE)
    basis = pixel_basis(TILE)

    # --- stage 4: composite kernels alone
    kk1 = jnp.arange(K1, dtype=jnp.int32)[None, :]
    validf1 = (kk1 < bins2.counts1[:, None]).astype(jnp.float32)
    feats1 = jax.jit(build_tile_features)(g1, origins, validf1)
    kk2 = jnp.arange(k2, dtype=jnp.int32)[None, :]
    validf2 = (kk2 < bins2.counts2[:, None]).astype(jnp.float32)
    feats2 = jax.jit(build_tile_features)(g2, origins[bins2.ovf_ids],
                                          validf2)
    if BACKEND == "pallas":
        from edgegaussians_tpu.ops import pallas_raster_v2 as v2

        fwd1 = jax.jit(lambda f, c: v2.composite_fwd_seg(f, c, basis))
        (img1, tout1), _ = timed(fwd1, feats1, bins2.counts1,
                                 label="pallas fwd L1 kernel")
        tin2 = tout1[bins2.ovf_ids]
        fwd2 = jax.jit(lambda f, c, t: v2.composite_fwd_seg(f, c, basis, t))
        (img2, _), _ = timed(fwd2, feats2, bins2.counts2, tin2,
                             label="pallas fwd L2 kernel")
        images = img1.at[bins2.ovf_ids].add(img2)
        g_up = jnp.ones_like(images)
        bwd1 = jax.jit(lambda f, c, g, tot: v2.composite_bwd_seg(
            f, c, basis, g, None, None, tot))
        timed(bwd1, feats1, bins2.counts1, g_up, images,
              label="pallas bwd L1 kernel")
        bwd2 = jax.jit(lambda f, c, g, t, pr, tot: v2.composite_bwd_seg(
            f, c, basis, g, t, pr, tot))
        timed(bwd2, feats2, bins2.counts2, g_up[bins2.ovf_ids], tin2,
              img1[bins2.ovf_ids], images[bins2.ovf_ids],
              label="pallas bwd L2 kernel")

    # --- stage 5: the fused backward scatter alone
    dg1 = g1 * 0.5
    dg2 = g2 * 0.5

    @jax.jit
    def scatter_step(dg1, dg2, b):
        c1 = jnp.abs(dg1[..., 3:5])
        c2 = jnp.abs(dg2[..., 3:5])
        rows = jnp.concatenate([
            jnp.concatenate([dg1, c1], axis=-1).reshape(-1, 10),
            jnp.concatenate([dg2, c2], axis=-1).reshape(-1, 10)], axis=0)
        idx = jnp.concatenate([b.ranks1.reshape(-1), b.ranks2.reshape(-1)])
        acc = jnp.zeros((N, 10), jnp.float32).at[idx].add(rows, mode="drop")
        return acc

    timed(scatter_step, dg1, dg2, bins2,
          label=f"backward scatter ({num_tiles*K1 + t2*k2} rows -> [N,10])")

    # --- stage 6: full composite fwd+bwd (incl. features, scatter)
    @jax.jit
    def composite_step(ps, b):
        sink = jnp.zeros((N, 2), jnp.float32)

        def lf(ps, sk):
            img = tile_render_two_level(ps, b, origins, basis, b.order, sk,
                                        BACKEND)
            return jnp.mean(jnp.abs(img))

        return jax.value_and_grad(lf, argnums=(0, 1))(ps, sink)

    timed(composite_step, packed_sorted, bins2,
          label="composite TOTAL fwd+bwd (feats+scatter)")

    # --- full step
    def loss_fn(m, q, s, o):
        out = rasterize(m, q, s, o, viewmat, K, WIDTH, HEIGHT,
                        tile_size=TILE, capacity=CAP, dense_capacity=K1,
                        overflow_tiles=T2, backend=BACKEND,
                        max_tiles_per_gaussian=M)
        return jnp.mean(jnp.abs(jnp.clip(out.image, 0, 1) - target))

    step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3)))
    timed(step, means, quats, scales, opac, label="FULL fwd+bwd step")


if __name__ == "__main__":
    main()
