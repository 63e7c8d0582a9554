"""Chunked-K Pallas compositing kernels (production path, v2).

The v1 kernels (pallas_raster.py) process all K capacity slots of every
tile; their cost is VPU-bound (exp/select/scan over the full [K, P] alpha
matrix). Real edge-map scenes are sparse — most tiles hold far fewer than K
Gaussians — so v2 walks K in chunks of 128 with per-chunk predication:

- chunks beyond the tile's true occupancy (``counts``) are skipped,
- compositing stops once the carried transmittance saturates below 1e-4 on
  every pixel (the classic front-to-back early exit, per tile-chunk),
- compositing runs in product space (cumulative-product Hillis-Steele scan)
  saving the log/exp round trip of v1.

The backward kernel replays the forward chunk walk, stashing the per-chunk
entry transmittance and contribution prefix in a tiny [NCHUNK, P] scratch,
then computes d feats chunk-by-chunk with the same predication.

Semantics are identical to v1 (and to the oracle): the per-contribution
skip rules, the 0.999 alpha clamp, and the 1e-4 transmittance cutoff behave
the same; only the arithmetic parenthesization differs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from edgegaussians_tpu.ops.projection import (
    ALPHA_CLAMP, ALPHA_THRESHOLD, TRANSMITTANCE_EPS)

import os

# tiles per grid program / K-slots per predicated step (env-tunable for
# hardware sweeps; defaults chosen on v5e)
TILE_BLOCK = int(os.environ.get("EG_TILE_BLOCK", "16"))
CHUNK = int(os.environ.get("EG_CHUNK", "128"))


def _logop_selector() -> jnp.ndarray:
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    return (row == 6).astype(jnp.float32)


def _cumprod_axis0(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inclusive cumulative product along axis 0 (Hillis-Steele rolls)."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    shift = 1
    while shift < k:
        rolled = pltpu.roll(x, shift, axis=0)
        x = x * jnp.where(row >= shift, rolled, 1.0)
        shift *= 2
    return x


def _chunk_alpha(f8k_chunk, basis):
    """[8,CHUNK] features -> masked alpha [CHUNK,P] + ok mask."""
    logalpha = jax.lax.dot_general(
        f8k_chunk, basis, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [CHUNK,P]
    logop = jax.lax.dot_general(
        f8k_chunk, _logop_selector(), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [CHUNK,1]
    alpha = jnp.exp(logalpha)
    ok = (logalpha <= logop) & (alpha >= ALPHA_THRESHOLD)
    alpha = jnp.where(ok, jnp.minimum(alpha, ALPHA_CLAMP), 0.0)
    return alpha, ok


def _fwd_kernel(counts_ref, feats_ref, basis_ref, tin_ref, out_ref,
                tout_ref, *, chunk):
    CHUNK = chunk
    basis = basis_ref[:]
    p = basis.shape[1]
    k = feats_ref.shape[2]
    n_chunks = k // CHUNK

    for i in range(feats_ref.shape[0]):
        count = counts_ref[i, 0]
        needed = (count + CHUNK - 1) // CHUNK

        def chunk_step(c, carry):
            img, t_carry = carry

            def work(args):
                img, t_carry = args
                f8k = feats_ref[i, :, pl.ds(c * CHUNK, CHUNK)]
                alpha, _ = _chunk_alpha(f8k, basis)
                om = 1.0 - alpha
                t_inc = t_carry * _cumprod_axis0(om, CHUNK)    # [CHUNK,P]
                keep = (t_inc >= TRANSMITTANCE_EPS).astype(jnp.float32)
                t_prev = t_inc / om
                img = img + jnp.sum(alpha * t_prev * keep, axis=0,
                                    keepdims=True)
                return img, t_inc[CHUNK - 1 : CHUNK, :]

            do = (c < needed) & (jnp.max(t_carry) >= TRANSMITTANCE_EPS)
            return jax.lax.cond(do, work, lambda a: a, (img, t_carry))

        img0 = jnp.zeros((1, p), jnp.float32)
        t0 = tin_ref[i][None, :]
        img, t_fin = jax.lax.fori_loop(0, n_chunks, chunk_step, (img0, t0))
        out_ref[i] = img[0]
        tout_ref[i] = t_fin[0]


def _bwd_kernel(counts_ref, feats_ref, basis_ref, g_ref, tin_ref,
                prior_ref, total_ref, dfeats_ref, tcarry_scr, csum_scr,
                *, chunk):
    CHUNK = chunk
    basis = basis_ref[:]
    p = basis.shape[1]
    k = feats_ref.shape[2]
    n_chunks = k // CHUNK

    for i in range(feats_ref.shape[0]):
        count = counts_ref[i, 0]
        needed = (count + CHUNK - 1) // CHUNK

        # pass A: replay forward, stash per-chunk entry state. The running
        # contribution sum starts at `prior` (contributions of earlier
        # capacity segments) so the suffix term below is global.
        def replay(c, carry):
            csum, t_carry = carry
            tcarry_scr[c] = t_carry[0]
            csum_scr[c] = csum[0]

            def work(args):
                csum, t_carry = args
                f8k = feats_ref[i, :, pl.ds(c * CHUNK, CHUNK)]
                alpha, _ = _chunk_alpha(f8k, basis)
                om = 1.0 - alpha
                t_inc = t_carry * _cumprod_axis0(om, CHUNK)
                keep = (t_inc >= TRANSMITTANCE_EPS).astype(jnp.float32)
                contrib = alpha * (t_inc / om) * keep
                csum = csum + jnp.sum(contrib, axis=0, keepdims=True)
                return csum, t_inc[CHUNK - 1 : CHUNK, :]

            do = (c < needed) & (jnp.max(t_carry) >= TRANSMITTANCE_EPS)
            return jax.lax.cond(do, work, lambda a: a, (csum, t_carry))

        csum0 = prior_ref[i][None, :]
        t0 = tin_ref[i][None, :]
        jax.lax.fori_loop(0, n_chunks, replay, (csum0, t0))
        # suffix gradients use the GLOBAL total (all segments), not the
        # replayed local sum
        total = total_ref[i][None, :]

        # pass B: per-chunk gradients using the stashed entry state
        g = g_ref[i][None, :]                                  # [1,P]

        dfeats_ref[i] = jnp.zeros((8, k), jnp.float32)

        def grad_chunk(c, carry):
            def work(carry):
                t_carry = tcarry_scr[c][None, :]
                csum_in = csum_scr[c][None, :]
                f8k = feats_ref[i, :, pl.ds(c * CHUNK, CHUNK)]
                alpha, ok = _chunk_alpha(f8k, basis)
                om = 1.0 - alpha
                t_inc = t_carry * _cumprod_axis0(om, CHUNK)
                keep = (t_inc >= TRANSMITTANCE_EPS).astype(jnp.float32)
                t_prev = t_inc / om
                contrib = alpha * t_prev * keep
                c_inc = csum_in + _cumsum_axis0(contrib, CHUNK)
                suffix = total - c_inc                         # sum j>k
                dalpha = (t_prev - suffix / om) * keep * g
                dla = jnp.where(ok & (alpha < ALPHA_CLAMP),
                                alpha * dalpha, 0.0)
                dfeats_ref[i, :, pl.ds(c * CHUNK, CHUNK)] = \
                    jax.lax.dot_general(
                        basis, dla, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)    # [8,CHUNK]
                return carry

            do = (c < needed) & (jnp.max(tcarry_scr[c]) >= TRANSMITTANCE_EPS)
            return jax.lax.cond(do, work, lambda a: a, carry)

        jax.lax.fori_loop(0, n_chunks, grad_chunk, 0)


def _cumsum_axis0(x: jnp.ndarray, k: int) -> jnp.ndarray:
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    shift = 1
    while shift < k:
        rolled = pltpu.roll(x, shift, axis=0)
        x = x + jnp.where(row >= shift, rolled, 0.0)
        shift *= 2
    return x


def _pad_tiles(x, tb, value=0):
    pad = (-x.shape[0]) % tb
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                    constant_values=value)
    return x


def _auto_interpret() -> bool:
    return jax.default_backend() != "tpu"


def composite_fwd(feats, counts, basis, interpret: bool | None = None):
    """[T,K,8] feats + [T] counts -> [T,P] tile intensities."""
    img, _ = composite_fwd_seg(feats, counts, basis, None, interpret)
    return img


def composite_fwd_seg(feats, counts, basis, t_in=None,
                      interpret: bool | None = None):
    """Segment forward: carried transmittance in -> (intensities, t_out).

    ``t_in=None`` starts fresh (transmittance 1). Segments compose:
    a capacity range [0,K1) rendered with t_in=1 then [K1,K) rendered with
    the returned t_out yields exactly the single-pass result.
    """
    interpret = _auto_interpret() if interpret is None else interpret
    if t_in is None:
        t_in = jnp.ones((feats.shape[0], basis.shape[1]), jnp.float32)
    return _composite_fwd(feats, counts, basis, t_in, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _composite_fwd(feats, counts, basis, t_in, interpret: bool = False):
    t, k, _ = feats.shape
    p = basis.shape[1]
    tb = TILE_BLOCK
    chunk = min(CHUNK, k)
    assert k % chunk == 0, f"capacity {k} must be a multiple of {chunk}"
    feats_t = _pad_tiles(jnp.swapaxes(feats, 1, 2), tb)        # [Tp,8,K]
    counts_p = _pad_tiles(counts.astype(jnp.int32)[:, None], tb)
    tin_p = _pad_tiles(t_in, tb)
    tp = feats_t.shape[0]

    img, tout = pl.pallas_call(
        functools.partial(_fwd_kernel, chunk=chunk),
        grid=(tp // tb,),
        in_specs=[
            pl.BlockSpec((tb, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, 8, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tp, p), jnp.float32),
            jax.ShapeDtypeStruct((tp, p), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * k * 9 * p + 14 * tp * k * p,
            bytes_accessed=tp * k * 8 * 4 + tp * p * 4,
            transcendentals=tp * k * p),
        interpret=interpret,
    )(counts_p, feats_t, basis, tin_p)
    return img[:t], tout[:t]


def composite_bwd(feats, counts, basis, g, interpret: bool | None = None):
    """VJP wrt feats: upstream [T,P] -> d feats [T,K,8]."""
    img, _ = composite_fwd_seg(feats, counts, basis, None, interpret)
    return composite_bwd_seg(feats, counts, basis, g, None, None, img,
                             interpret)


def composite_bwd_seg(feats, counts, basis, g, t_in, prior, total,
                      interpret: bool | None = None):
    """Segment VJP wrt feats.

    ``t_in``: carried transmittance entering the segment (None -> 1);
    ``prior``: contribution sum of earlier segments (None -> 0);
    ``total``: GLOBAL per-tile contribution sum across all segments — the
    suffix term of d alpha then accounts for later segments automatically.
    """
    interpret = _auto_interpret() if interpret is None else interpret
    t, _, _ = feats.shape
    p = basis.shape[1]
    if t_in is None:
        t_in = jnp.ones((t, p), jnp.float32)
    if prior is None:
        prior = jnp.zeros((t, p), jnp.float32)
    return _composite_bwd(feats, counts, basis, g, t_in, prior, total,
                          interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _composite_bwd(feats, counts, basis, g, t_in, prior, total,
                   interpret: bool = False):
    t, k, _ = feats.shape
    p = basis.shape[1]
    tb = TILE_BLOCK
    chunk = min(CHUNK, k)
    assert k % chunk == 0
    n_chunks = k // chunk
    feats_t = _pad_tiles(jnp.swapaxes(feats, 1, 2), tb)
    counts_p = _pad_tiles(counts.astype(jnp.int32)[:, None], tb)
    g_p = _pad_tiles(g, tb)
    tin_p = _pad_tiles(t_in, tb)
    prior_p = _pad_tiles(prior, tb)
    total_p = _pad_tiles(total, tb)
    tp = feats_t.shape[0]

    pk_spec = pl.BlockSpec((tb, p), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    dfeats_t = pl.pallas_call(
        functools.partial(_bwd_kernel, chunk=chunk),
        grid=(tp // tb,),
        in_specs=[
            pl.BlockSpec((tb, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, 8, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pk_spec, pk_spec, pk_spec, pk_spec,
        ],
        out_specs=pl.BlockSpec((tb, 8, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, 8, k), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_chunks, p), jnp.float32),
            pltpu.VMEM((n_chunks, p), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * tp * k * 9 * p + 28 * tp * k * p,
            bytes_accessed=2 * tp * k * 8 * 4 + tp * p * 4,
            transcendentals=2 * tp * k * p),
        interpret=interpret,
    )(counts_p, feats_t, basis, g_p, tin_p, prior_p, total_p)
    return jnp.swapaxes(dfeats_t[:t], 1, 2)
