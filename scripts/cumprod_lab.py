"""Measure cumprod-scan variants inside the fwd compositing kernel.

The per-chunk front-to-back transmittance scan is a Hillis-Steele
cumulative product (log2(C) full-size pltpu.roll steps). Variants:

  v3       current: 7 rolls for C=128
  noscan   scan removed (WRONG results) -- lower bound / roll cost
  twolevel groups of 8: 3 full rolls + small group prefix + broadcast
  matmul   log-space cumsum via triangular MXU matmul + exp

Usage: python scripts/cumprod_lab.py
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

from edgegaussians_tpu.ops import tiles as tiles_mod
from edgegaussians_tpu.ops.projection import (
    ALPHA_CLAMP, ALPHA_THRESHOLD, SIGMA_GUARD_EPS, TRANSMITTANCE_EPS,
    project_gaussians)
from edgegaussians_tpu.ops.tiles import (bin_gaussians_two_level,
                                         build_tile_features, pixel_basis,
                                         tile_origins)

N = 20000
W = H = 800
TILE = 16
K1 = 128
K2 = 384
T2 = 625
TB = 16


def timed(fn, *args, iters=50, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:40s} {dt:8.3f} ms")
    return out, dt


def _scan_v3(om, k):
    row = jax.lax.broadcasted_iota(jnp.int32, om.shape, 1)
    x = om
    shift = 1
    while shift < k:
        rolled = pltpu.roll(x, shift, axis=1)
        x = x * jnp.where(row >= shift, rolled, 1.0)
        shift *= 2
    return x


def _scan_none(om, k):
    return om


def _scan_twolevel(om, k, g=8):
    # within-group inclusive cumprod: log2(g) full-size rolls
    row = jax.lax.broadcasted_iota(jnp.int32, om.shape, 1)
    x = om
    shift = 1
    while shift < g:
        rolled = pltpu.roll(x, shift, axis=1)
        x = x * jnp.where(row % g >= shift, rolled, 1.0)
        shift *= 2
    # group prefix: last element of each group, cumprod along groups.
    # group tails propagated with masked rolls (no strided gather: Mosaic
    # only supports 2-D gathers) — keep everything [TB, C, P] shaped.
    tb, c, p = om.shape
    ng = c // g
    # gp[i] = x[group_end(i)] for i anywhere: broadcast each group's tail
    # backward over its group with log2(g) masked rolls from the END.
    # Simpler: compute exclusive group prefix IN PLACE by continuing the
    # Hillis-Steele with stride g over the full array, using only
    # group-tail-aligned sources.
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    # y = x where position is a group tail, else 1; then cumprod of group
    # tails across groups at stride g.
    is_tail = (row % g) == (g - 1)
    y = jnp.where(is_tail, x, 1.0)
    shift = g
    while shift < c:
        rolled = pltpu.roll(y, shift, axis=1)
        y = y * jnp.where(row >= shift, rolled, 1.0)
        shift *= 2
    # y at group tail t now holds prod of tails up to and incl. t.
    # exclusive prefix for each element = y at previous group's tail:
    prev = pltpu.roll(y, g, axis=1)
    gp_excl = jnp.where(row >= g, prev, 1.0)
    # within a group every element needs the SAME gp_excl (that of its
    # group head); roll keeps tail alignment, so mask-select per offset:
    # position i needs value at tail(i) - g = i - (i%g) - 1 ... instead
    # propagate the head value forward with log2(g) masked rolls.
    z = jnp.where((row % g) == 0, gp_excl, 1.0)
    shift = 1
    while shift < g:
        rolled = pltpu.roll(z, shift, axis=1)
        z = z * jnp.where(row % g >= shift, rolled, 1.0)
        shift *= 2
    return x * z


def _scan_matmul(om, k):
    tb, c, p = om.shape
    log_om = jnp.log(jnp.maximum(om, 1e-30))
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    tril = (row >= col).astype(jnp.float32)               # [C,C]
    csum = jax.lax.dot_general(
        log_om, tril, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)              # [TB,P,C]? check
    csum = jnp.swapaxes(csum, 1, 2)
    return jnp.exp(csum)


SCANS = {"v3": _scan_v3, "noscan": _scan_none,
         "twolevel": _scan_twolevel, "matmul": _scan_matmul}


def _fwd_kernel(feats_ref, basis_ref, tin_ref, out_ref, tout_ref, *,
                chunk, scan):
    basis = basis_ref[:]
    f = feats_ref[:]
    tb, _, k = f.shape
    p = basis.shape[1]
    scan_fn = SCANS[scan]

    t_carry = tin_ref[:]
    img = jnp.zeros((tb, p), jnp.float32)
    for c in range(k // chunk):
        fc = f[:, :, c * chunk:(c + 1) * chunk]
        logalpha = jax.lax.dot_general(
            fc, basis, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        logop = fc[:, 6, :][..., None]
        alpha = jnp.exp(logalpha)
        ok = (logalpha <= logop + SIGMA_GUARD_EPS) & \
            (alpha >= ALPHA_THRESHOLD)
        alpha = jnp.where(ok, jnp.minimum(alpha, ALPHA_CLAMP), 0.0)
        om = 1.0 - alpha
        inc = scan_fn(om, chunk)
        t_inc = t_carry[:, None, :] * inc
        keep = (t_inc >= TRANSMITTANCE_EPS).astype(jnp.float32)
        img += jnp.sum(alpha * (t_inc / om) * keep, axis=1)
        t_carry = t_inc[:, chunk - 1, :]
    out_ref[:] = img
    tout_ref[:] = t_carry


def fwd(feats, basis, scan, chunk=128):
    t, k, _ = feats.shape
    p = basis.shape[1]
    feats_t = jnp.swapaxes(feats, 1, 2)
    pad = (-t) % TB
    if pad:
        feats_t = jnp.pad(feats_t, ((0, pad), (0, 0), (0, 0)))
    t_in = jnp.ones((feats_t.shape[0], p), jnp.float32)
    tp = feats_t.shape[0]
    chunk = min(chunk, k)
    img, tout = pl.pallas_call(
        functools.partial(_fwd_kernel, chunk=chunk, scan=scan),
        grid=(tp // TB,),
        in_specs=[
            pl.BlockSpec((TB, 8, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TB, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tp, p), jnp.float32),
            jax.ShapeDtypeStruct((tp, p), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(feats_t, basis, t_in)
    return img[:t], tout[:t]


def main():
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

    proj = jax.jit(lambda: project_gaussians(
        means, quats, scales, opac, viewmat, Km, W, H))()
    bins2 = jax.jit(lambda: bin_gaussians_two_level(
        proj, W, H, TILE, K1, K2, T2))()
    bins2 = jax.block_until_ready(bins2)
    packed = tiles_mod.pack_gaussian_render_data(proj)
    packed_sorted = packed[bins2.order]
    g1 = packed_sorted[bins2.ranks1]
    kk1 = jnp.arange(K1, dtype=jnp.int32)[None, :]
    validf1 = (kk1 < bins2.counts1[:, None]).astype(jnp.float32)
    origins = tile_origins(W, H, TILE)
    basis = pixel_basis(TILE)
    feats1 = jax.jit(build_tile_features)(g1, origins, validf1)
    feats1 = jax.block_until_ready(feats1)

    ref = None
    for name in ("v3", "noscan", "matmul"):
        fn = jax.jit(functools.partial(fwd, scan=name))
        (img, _), _ = timed(fn, feats1, basis, label=f"fwd L1 scan={name}")
        if name == "v3":
            ref = img
        elif name != "noscan":
            err = float(jnp.max(jnp.abs(img - ref)))
            print(f"   max err vs v3: {err:.2e}")


if __name__ == "__main__":
    main()
