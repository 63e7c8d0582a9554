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
    ALPHA_CLAMP, ALPHA_THRESHOLD, SIGMA_GUARD_EPS, TRANSMITTANCE_EPS)
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
            preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)   # [TB,C,P]
        logop = fc[:, 6, :][..., None]            # [TB,C,1]
        alpha = jnp.exp(logalpha)
        ok = (logalpha <= logop + SIGMA_GUARD_EPS) & (alpha >= ALPHA_THRESHOLD)
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


def _cumsum_axis1(x, k):
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift = 1
    while shift < k:
        rolled = pltpu.roll(x, shift, axis=1)
        x = x + jnp.where(row >= shift, rolled, 0.0)
        shift *= 2
    return x


def _chunk_alpha_v3(fc, basis):
    logalpha = jax.lax.dot_general(
        fc, basis, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)      # [TB,C,P]
    logop = fc[:, 6, :][..., None]
    alpha = jnp.exp(logalpha)
    ok = (logalpha <= logop + SIGMA_GUARD_EPS) & (alpha >= ALPHA_THRESHOLD)
    return jnp.where(ok, jnp.minimum(alpha, ALPHA_CLAMP), 0.0), ok


def _bwd_kernel_v3(feats_ref, basis_ref, g_ref, tin_ref, prior_ref,
                   total_ref, dfeats_ref, *, chunk):
    basis = basis_ref[:]
    f = feats_ref[:]
    tb, _, k = f.shape
    p = basis.shape[1]
    n_chunks = k // chunk
    g = g_ref[:]                                   # [TB,P]
    total = total_ref[:]                           # [TB,P]

    t_carry = tin_ref[:]
    csum = prior_ref[:]
    for c in range(n_chunks):                      # fused replay + grad
        fc = f[:, :, c * chunk:(c + 1) * chunk]
        alpha, ok = _chunk_alpha_v3(fc, basis)
        om = 1.0 - alpha
        t_inc = t_carry[:, None, :] * _cumprod_axis1(om, chunk)
        keep = (t_inc >= TRANSMITTANCE_EPS).astype(jnp.float32)
        t_prev = t_inc / om
        contrib = alpha * t_prev * keep
        c_inc = csum[:, None, :] + _cumsum_axis1(contrib, chunk)
        suffix = total[:, None, :] - c_inc
        dalpha = (t_prev - suffix / om) * keep * g[:, None, :]
        dla = jnp.where(ok & (alpha < ALPHA_CLAMP), alpha * dalpha, 0.0)
        dfc = jax.lax.dot_general(
            dla, basis, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)   # [TB,C,8]
        dfeats_ref[:, :, c * chunk:(c + 1) * chunk] = \
            jnp.swapaxes(dfc, 1, 2)
        t_carry = t_inc[:, chunk - 1, :]
        csum = c_inc[:, chunk - 1, :]


def bwd_v3(feats, basis, g, t_in=None, prior=None, total=None,
           tile_block=16, chunk=128):
    t, k, _ = feats.shape
    p = basis.shape[1]
    feats_t = jnp.swapaxes(feats, 1, 2)
    pad = (-t) % tile_block
    if pad:
        feats_t = jnp.pad(feats_t, ((0, pad), (0, 0), (0, 0)))
    tp = feats_t.shape[0]
    if t_in is None:
        t_in = jnp.ones((t, p), jnp.float32)
    if prior is None:
        prior = jnp.zeros((t, p), jnp.float32)
    def padp(x):
        return jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    chunk = min(chunk, k)
    pk = pl.BlockSpec((tile_block, p), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
    dfeats_t = pl.pallas_call(
        functools.partial(_bwd_kernel_v3, chunk=chunk),
        grid=(tp // tile_block,),
        in_specs=[
            pl.BlockSpec((tile_block, 8, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pk, pk, pk, pk,
        ],
        out_specs=pl.BlockSpec((tile_block, 8, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, 8, k), jnp.float32),
    )(feats_t, basis, padp(g), padp(t_in), padp(prior), padp(total))
    return jnp.swapaxes(dfeats_t[:t], 1, 2)


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

    # V3: tile-vectorized, no conds, static chunk unroll
    for tb in (8, 16, 32):
        f3 = jax.jit(functools.partial(fwd_v3, tile_block=tb))
        out3 = timed(f3, feats1, basis, label=f"V3 fwd vectorized tb={tb}")

    ref = f0(feats1, counts1)
    img3, _ = fwd_v3(feats1, basis)
    err = float(jnp.max(jnp.abs(ref - img3)))
    print(f"V3 vs V0 fwd max abs err: {err:.2e}")

    # V3 bwd
    for tb in (8, 16):
        b3 = jax.jit(functools.partial(bwd_v3, tile_block=tb))
        timed(b3, feats1, basis, g, None, None, ref,
              label=f"V3 bwd vectorized tb={tb}")
    d0 = b0(feats1, counts1, g)
    d3 = bwd_v3(feats1, basis, g, None, None, ref)
    err = float(jnp.max(jnp.abs(d0 - d3)))
    print(f"V3 vs V0 bwd max abs err: {err:.2e} "
          f"(scale {float(jnp.max(jnp.abs(d0))):.2e})")


if __name__ == "__main__":
    main()
