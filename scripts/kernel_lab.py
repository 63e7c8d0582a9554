"""Kernel lab: measure Pallas compositing-kernel variants on bench shapes.

Feeds realistic two-level feats/counts (from the synthetic bench scene)
to isolated kernel variants so design changes are measured before being
promoted into pallas_raster_v2.

Usage: python scripts/kernel_lab.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from edgegaussians_tpu.ops import pallas_raster_v2 as v2
from edgegaussians_tpu.ops import tiles as tiles_mod
from edgegaussians_tpu.ops.projection import (
    ALPHA_CLAMP, ALPHA_THRESHOLD, TRANSMITTANCE_EPS)
from edgegaussians_tpu.ops.tiles import (bin_gaussians_two_level,
                                         build_tile_features, pixel_basis,
                                         tile_origins)

N = 20000
W = H = 800
TILE = 16
K1 = 128
K2 = 384
T2 = 625


def timed(fn, *args, iters=30, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:46s} {dt:8.3f} ms")
    return out


def bench_scene():
    from edgegaussians_tpu.ops.projection import project_gaussians
    r = np.random.default_rng(0)
    means = jnp.asarray(r.uniform(-0.5, 0.5, (N, 3)), jnp.float32) \
        + jnp.array([0, 0, 2.0])
    quats = jnp.asarray(r.normal(size=(N, 4)), jnp.float32)
    scales = jnp.asarray(
        np.exp(r.uniform(np.log(0.003), np.log(0.03), (N, 3))), jnp.float32)
    opac = jnp.asarray(r.uniform(0.2, 0.95, N), jnp.float32)
    f = 1111.0
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    viewmat = jnp.eye(4, dtype=jnp.float32)
    proj = jax.jit(lambda m, q, s, o: project_gaussians(
        m, q, s, o, viewmat, K, W, H))(means, quats, scales, opac)
    bins2 = jax.jit(lambda p: bin_gaussians_two_level(
        p, W, H, TILE, K1, K2, T2))(proj)
    packed = tiles_mod.pack_gaussian_render_data(proj)[bins2.order]
    origins = tile_origins(W, H, TILE)
    basis = pixel_basis(TILE)
    g1 = packed[bins2.ranks1]
    kk1 = jnp.arange(K1, dtype=jnp.int32)[None, :]
    validf1 = (kk1 < bins2.counts1[:, None]).astype(jnp.float32)
    feats1 = build_tile_features(g1, origins, validf1)
    return feats1, bins2.counts1, basis


def _cumprod_axis1(x, k):
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift = 1
    while shift < k:
        rolled = pltpu.roll(x, shift, axis=1)
        x = x * jnp.where(row >= shift, rolled, 1.0)
        shift *= 2
    return x


def _fwd_kernel_v3(feats_ref, basis_ref, tin_ref, out_ref, tout_ref, *,
                   chunk):
    basis = basis_ref[:]                          # [8,P]
    f = feats_ref[:]                              # [TB,8,K]
    tb, _, k = f.shape
    p = basis.shape[1]
    n_chunks = k // chunk

    t_carry = tin_ref[:]                          # [TB,P]
    img = jnp.zeros((tb, p), jnp.float32)
    for c in range(n_chunks):                     # static unroll, no cond
        fc = f[:, :, c * chunk:(c + 1) * chunk]   # [TB,8,C]
        logalpha = jax.lax.dot_general(
            fc, basis, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # [TB,C,P]
        logop = fc[:, 6, :][..., None]            # [TB,C,1]
        alpha = jnp.exp(logalpha)
        ok = (logalpha <= logop) & (alpha >= ALPHA_THRESHOLD)
        alpha = jnp.where(ok, jnp.minimum(alpha, ALPHA_CLAMP), 0.0)
        om = 1.0 - alpha
        inc = _cumprod_axis1(om, chunk)
        t_inc = t_carry[:, None, :] * inc
        keep = (t_inc >= TRANSMITTANCE_EPS).astype(jnp.float32)
        img += jnp.sum(alpha * (t_inc / om) * keep, axis=1)
        t_carry = t_inc[:, chunk - 1, :]
    out_ref[:] = img
    tout_ref[:] = t_carry


def fwd_v3(feats, basis, t_in=None, tile_block=16, chunk=128):
    t, k, _ = feats.shape
    p = basis.shape[1]
    feats_t = jnp.swapaxes(feats, 1, 2)
    pad = (-t) % tile_block
    if pad:
        feats_t = jnp.pad(feats_t, ((0, pad), (0, 0), (0, 0)))
    if t_in is None:
        t_in = jnp.ones((feats_t.shape[0], p), jnp.float32)
    tp = feats_t.shape[0]
    chunk = min(chunk, k)
    img, tout = pl.pallas_call(
        functools.partial(_fwd_kernel_v3, chunk=chunk),
        grid=(tp // tile_block,),
        in_specs=[
            pl.BlockSpec((tile_block, 8, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_block, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_block, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_block, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tp, p), jnp.float32),
            jax.ShapeDtypeStruct((tp, p), jnp.float32),
        ),
    )(feats_t, basis, t_in)
    return img[:t], tout[:t]


def main():
    feats1, counts1, basis = bench_scene()
    feats1 = jax.block_until_ready(feats1)
    print(f"L1 shape {feats1.shape}, occupied tiles "
          f"{int(jnp.sum(counts1 > 0))}/{counts1.shape[0]}, "
          f"mean count {float(jnp.mean(counts1)):.1f}")

    # V0: current production kernel
    f0 = jax.jit(lambda f, c: v2.composite_fwd_seg(f, c, basis)[0])
    timed(f0, feats1, counts1, label="V0 fwd current")

    b0 = jax.jit(lambda f, c, g: v2.composite_bwd_seg(
        f, c, basis, g, None, None, g * 0 + 1.0))
    g = jnp.ones((feats1.shape[0], basis.shape[1]), jnp.float32)
    timed(b0, feats1, counts1, g, label="V0 bwd current")


if __name__ == "__main__":
    main()
