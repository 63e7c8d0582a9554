"""Tile-vectorized chunked Pallas compositing kernels (production path).

Third-generation kernel design (v1 = pallas_raster.py log-space scan over
full capacity; v2 = per-tile chunk loop with per-tile predication). Profiling
the per-tile-loop kernels on v5e showed the grid/loop/cond machinery — one
``lax.cond`` plus a cross-lane ``max`` per (tile, chunk), ops on [1, P]
rows — costing ~2x the actual VPU math, so v3 vectorizes across the tile
block:

- each grid step processes TILE_BLOCK tiles as whole [TB, C, P] arrays:
  one MXU matmul evaluates log-alpha for every (slot, pixel) in the block,
  and the front-to-back transmittance scan is a Hillis-Steele cumulative
  product along the slot axis (7 rolls for C=128),
- capacity is walked in chunks of CHUNK slots with BLOCK-level predication:
  a chunk is skipped when no tile in the block has that many Gaussians
  (``counts``) or every pixel's carried transmittance has saturated below
  TRANSMITTANCE_EPS — per-block instead of per-tile, trading a little
  wasted VPU work inside mixed blocks for far less control overhead,
- the backward walks chunks in the same forward order carrying the entry
  transmittance and contribution prefix, so it needs no replay pass and no
  scratch: the suffix term uses the caller-provided per-tile total.

All alpha-evaluation matmuls run at Precision.HIGHEST: log-alpha terms
reach O(100), and the MXU's default-precision (bfloat16) multiplies would
inject O(0.1-1) noise into the exponent — catastrophic for parity with the
f32 oracle and for the sigma >= 0 skip rule (see SIGMA_GUARD_EPS).

Semantics are identical to the jax-backend oracle (composite.py): same skip
rules, 0.999 alpha clamp, and 1e-4 transmittance cutoff; only arithmetic
parenthesization differs.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from edgegaussians_tpu.ops import vma
from edgegaussians_tpu.ops.projection import (
    ALPHA_CLAMP, ALPHA_THRESHOLD, SIGMA_GUARD_EPS, TRANSMITTANCE_EPS)

# tiles per grid program / K-slots per predicated chunk (env-tunable for
# hardware sweeps; defaults chosen on v5e)
TILE_BLOCK = int(os.environ.get("EG_TILE_BLOCK", "16"))
CHUNK = int(os.environ.get("EG_CHUNK", "128"))


def _cumprod_slots(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inclusive cumulative product along axis 1 (Hillis-Steele rolls)."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift = 1
    while shift < k:
        rolled = pltpu.roll(x, shift, axis=1)
        x = x * jnp.where(row >= shift, rolled, 1.0)
        shift *= 2
    return x


def _cumsum_slots(x: jnp.ndarray, k: int) -> jnp.ndarray:
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift = 1
    while shift < k:
        rolled = pltpu.roll(x, shift, axis=1)
        x = x + jnp.where(row >= shift, rolled, 0.0)
        shift *= 2
    return x


def _chunk_alpha(fc, basis):
    """[TB,8,C] feature slice -> masked alpha [TB,C,P] + ok mask."""
    logalpha = jax.lax.dot_general(
        fc, basis, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)       # [TB,C,P]
    logop = fc[:, 6, :][..., None]                 # [TB,C,1]
    alpha = jnp.exp(logalpha)
    ok = (logalpha <= logop + SIGMA_GUARD_EPS) & (alpha >= ALPHA_THRESHOLD)
    alpha = jnp.where(ok, jnp.minimum(alpha, ALPHA_CLAMP), 0.0)
    return alpha, ok


def _block_max_count(counts_ref, tb: int):
    maxc = counts_ref[0, 0]
    for i in range(1, tb):
        maxc = jnp.maximum(maxc, counts_ref[i, 0])
    return maxc


def _fwd_kernel(counts_ref, feats_ref, basis_ref, tin_ref, out_ref,
                tout_ref, *, chunk):
    basis = basis_ref[:]                           # [8,P]
    tb, _, k = feats_ref.shape
    p = basis.shape[1]
    n_chunks = k // chunk
    maxc = _block_max_count(counts_ref, tb)

    def work(c, args):
        img, t_carry = args
        fc = feats_ref[:, :, pl.ds(c * chunk, chunk)]
        alpha, _ = _chunk_alpha(fc, basis)
        om = 1.0 - alpha
        t_inc = t_carry[:, None, :] * _cumprod_slots(om, chunk)
        keep = (t_inc >= TRANSMITTANCE_EPS).astype(jnp.float32)
        img = img + jnp.sum(alpha * (t_inc / om) * keep, axis=1)
        return img, t_inc[:, chunk - 1, :]

    t_carry = tin_ref[:]                           # [TB,P]
    # under a strict-vma shard_map the ref loads are device-varying; fresh
    # zeros and loop counters must be promoted to match or the loop-carry /
    # dynamic_slice vma checks reject the kernel (ops/vma.py)
    img = vma.match_vma(jnp.zeros((tb, p), jnp.float32), t_carry)
    c0 = vma.match_vma(jnp.int32(0), t_carry)
    if n_chunks == 1:
        do = (maxc > 0) & (jnp.max(t_carry) >= TRANSMITTANCE_EPS)
        img, t_carry = jax.lax.cond(do, work, lambda _, a: a, c0,
                                    (img, t_carry))
    else:
        # chunk walk as a while_loop whose condition IS the block-level
        # predication (occupancy bound + transmittance saturation): the
        # body appears once in the generated code — static unrolling
        # replicated the large chunk body per chunk and per cond branch,
        # megabytes per kernel, dominating remote-compile/upload time.
        needed = (maxc + chunk - 1) // chunk

        def cond_fn(state):
            c, _, t_carry = state
            return (c < needed) & \
                (jnp.max(t_carry) >= TRANSMITTANCE_EPS)

        def body(state):
            c, img, t_carry = state
            img, t_carry = work(c, (img, t_carry))
            return c + 1, img, t_carry

        _, img, t_carry = jax.lax.while_loop(
            cond_fn, body, (c0, img, t_carry))
    out_ref[:] = img
    tout_ref[:] = t_carry


def _bwd_kernel(counts_ref, feats_ref, basis_ref, gt2_ref, tin_ref,
                dfeats_ref, *, chunk):
    basis = basis_ref[:]
    tb, _, k = feats_ref.shape
    n_chunks = k // chunk
    maxc = _block_max_count(counts_ref, tb)
    # pre-folded cotangent g*(1-total): with all-ones colors the
    # contribution prefix telescopes to 1 - t_inc (keep is a prefix
    # property of the monotone transmittance), so
    # dL/dalpha = g (1 - total) / om for every kept slot — no
    # contribution cumsum, no prior-segment carry, no t_prev division
    # (the v5.2 algebra of pallas_segpair.py, applied to the chunked
    # dense kernel)
    gt2 = gt2_ref[:]                               # [TB,P]

    def work(c, t_carry):
        fc = feats_ref[:, :, pl.ds(c * chunk, chunk)]
        alpha, ok = _chunk_alpha(fc, basis)
        om = 1.0 - alpha
        t_inc = t_carry[:, None, :] * _cumprod_slots(om, chunk)
        keep = (t_inc >= TRANSMITTANCE_EPS).astype(jnp.float32)
        dalpha = gt2[:, None, :] / om * keep
        dla = jnp.where(ok & (alpha < ALPHA_CLAMP),
                        alpha * dalpha, 0.0)
        dfc = jax.lax.dot_general(
            dla, basis, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)   # [TB,C,8]
        return t_inc[:, chunk - 1, :], jnp.swapaxes(dfc, 1, 2)

    t_carry = tin_ref[:]
    # vma promotion of fresh values: see _fwd_kernel
    zchunk = vma.match_vma(jnp.zeros((tb, 8, chunk), jnp.float32), t_carry)
    c0 = vma.match_vma(jnp.int32(0), t_carry)
    if n_chunks == 1:
        do = (maxc > 0) & (jnp.max(t_carry) >= TRANSMITTANCE_EPS)

        def run(c, args):
            t_carry, df = work(c, args[0])
            return t_carry, df

        def skip(c, args):
            return args[0], zchunk

        _, dfc_t = jax.lax.cond(
            do, run, skip, c0, (t_carry, zchunk))
        dfeats_ref[:] = dfc_t
    else:
        # while_loop with predication as the loop condition: see
        # _fwd_kernel. Chunks the loop never reaches must still be zeroed.
        dfeats_ref[:] = vma.match_vma(
            jnp.zeros((tb, 8, k), jnp.float32), t_carry)
        needed = (maxc + chunk - 1) // chunk

        def cond_fn(state):
            c, t_carry = state
            return (c < needed) & \
                (jnp.max(t_carry) >= TRANSMITTANCE_EPS)

        def body(state):
            c, t_carry = state
            t_carry, dfc_t = work(c, t_carry)
            dfeats_ref[:, :, pl.ds(c * chunk, chunk)] = dfc_t
            return c + 1, t_carry

        jax.lax.while_loop(cond_fn, body, (c0, t_carry))


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
            vma.out_struct((tp, p), jnp.float32, feats_t, counts_p, tin_p),
            vma.out_struct((tp, p), jnp.float32, feats_t, counts_p, tin_p),
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
    ``prior``: UNUSED since the v5.2 algebra (kept for call-site
    compatibility — the contribution prefix telescopes to 1 - t_inc, so
    earlier segments are encoded in ``t_in`` already);
    ``total``: GLOBAL per-tile contribution sum across all segments — the
    suffix term of d alpha then accounts for later segments automatically
    via the pre-folded g*(1-total) cotangent.
    """
    del prior
    interpret = _auto_interpret() if interpret is None else interpret
    t, _, _ = feats.shape
    p = basis.shape[1]
    if t_in is None:
        t_in = jnp.ones((t, p), jnp.float32)
    return _composite_bwd(feats, counts, basis, g, t_in, total, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _composite_bwd(feats, counts, basis, g, t_in, total,
                   interpret: bool = False):
    t, k, _ = feats.shape
    p = basis.shape[1]
    tb = TILE_BLOCK
    chunk = min(CHUNK, k)
    assert k % chunk == 0
    feats_t = _pad_tiles(jnp.swapaxes(feats, 1, 2), tb)
    counts_p = _pad_tiles(counts.astype(jnp.int32)[:, None], tb)
    gt2_p = _pad_tiles(g * (1.0 - total), tb)
    tin_p = _pad_tiles(t_in, tb)
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
            pk_spec, pk_spec,
        ],
        out_specs=pl.BlockSpec((tb, 8, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=vma.out_struct((tp, 8, k), jnp.float32, feats_t,
                                 counts_p, gt2_p, tin_p),
        cost_estimate=pl.CostEstimate(
            flops=4 * tp * k * 9 * p + 20 * tp * k * p,
            bytes_accessed=2 * tp * k * 8 * 4 + tp * p * 4,
            transcendentals=tp * k * p),
        interpret=interpret,
    )(counts_p, feats_t, basis, gt2_p, tin_p)
    return jnp.swapaxes(dfeats_t[:t], 1, 2)
