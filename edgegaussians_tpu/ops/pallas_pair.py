"""Pair-domain DMA compositor (4th-generation kernel design).

The v3 kernels (pallas_raster_v2.py) consume a DENSE [T, K, 8] feature
frame that XLA materializes with a ~2 ms, 402k-row scatter — the single
most expensive op of the round-3 hardware trace (docs/SCALING.md §5.1),
~35% of the whole fwd+bwd step, almost all of it spent landing rows into
a feature-major frame layout one element at a time (the scatter fuses
with the compositor's [.,8] -> [8,.] relayout). This module removes the
frame — and the scatter — entirely by keeping the compositor in the
*sorted-pair domain*:

- binning re-sorts the budget-B pair prefix into occupancy-frame order
  with per-block brick-alignment pads (ops/tiles.py:
  bin_pairs_frame_order), so every tile's pairs are one contiguous
  depth-ordered run, a block of TB frame rows spans one contiguous
  128-pair-brick-aligned window, and blocks are occupancy-homogeneous,
- the XLA side gathers the B pair rows, builds their matmul features
  (elementwise over B real rows instead of T*K mostly-empty slots), and
  relayouts them to [NB, 8, 128] feature-major bricks — a PAIR-domain
  relayout (~1.5 MB), 8x smaller than the frame relayout it replaces,
- the forward kernel DMAs each block's brick window (static size,
  over-read into the next block is harmless) HBM -> VMEM once per grid
  step, aligns each tile's run phase with two dynamic lane rolls + a
  select (runs are NOT 128-aligned; only blocks are), and then walks
  capacity chunks exactly like v3: [TB,8,128] MXU log-alpha matmul,
  Hillis-Steele transmittance scan, block-level predication,
- the backward kernel rematerializes alphas the same way and
  accumulates gradient bricks in VMEM (contributions outside a run are
  exactly zero via the run penalty, so overlapping chunk windows add
  zeros), then writes the window back with one DMA; later blocks
  overwrite earlier blocks' overhang (the grid is sequential and each
  write is waited), so the downstream [B,10] -> [N,10] rank reduction
  needs no frame gather at all — gradients come back already in pair
  order,
- per-tile capacity is single-level: every tile composites
  min(count, cap) pairs — strictly MORE complete than the two-level
  k1/t2/k2 truncation it replaces, and the t_in/t_out segment hand-off
  machinery disappears.

Mosaic constraints that shaped this design (probed on v5e, 2026-08-21):
narrow [R, 8] f32 arrays tile as (1,128) and cannot be dynamically
sliced in ANY memory space; lane-dim dynamic slices need 128-multiple
offsets; but [NB, 8, 128] brick windows slice cleanly on the major dim,
``pltpu.roll`` takes traced shifts, and in-kernel [C,8]<->[8,C]
transposes lower fine.

Numerics follow the v3 rules (KERNELS.md §3): alpha matmuls at
Precision.HIGHEST, the sigma >= 0 guard with SIGMA_GUARD_EPS slack, the
gsplat clamp/skip/cutoff constants. Parity vs the per-pixel oracle and
the dense path is pinned in tests/test_pallas_pair.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from edgegaussians_tpu.ops import vma
from edgegaussians_tpu.ops.projection import (
    ALPHA_CLAMP, ALPHA_THRESHOLD, SIGMA_GUARD_EPS, TRANSMITTANCE_EPS)
from edgegaussians_tpu.ops.pallas_raster_v2 import (
    TILE_BLOCK, _cumprod_slots, _cumsum_slots, _pad_tiles, _auto_interpret)
from edgegaussians_tpu.ops.tiles import PairBins, cdiv, step_over_pairs

BRICK = 128          # pairs per brick == chunk size of the walk


def pair_block_tiles() -> int:
    """Tiles per kernel block — the ``block_tiles`` to pass to
    tiles.bin_pairs_frame_order."""
    return TILE_BLOCK


def build_pair_features(src8: jnp.ndarray, ox: jnp.ndarray,
                        oy: jnp.ndarray) -> jnp.ndarray:
    """[B,8] packed rows + per-pair tile origins -> [B,8] matmul features.

    Same G-row layout as tiles.build_tile_features (slot 6 carries the
    log-opacity for the sigma guard), but per PAIR instead of per frame
    slot. Validity masking is not needed here: garbage rows (brick pads,
    budget drops) are masked by the kernel's run-length penalty.
    """
    a, b, c = src8[:, 0], src8[:, 1], src8[:, 2]
    mx = src8[:, 3] - ox
    my = src8[:, 4] - oy
    lo = src8[:, 5]
    amx_bmy = a * mx + b * my
    bmx_cmy = b * mx + c * my
    const = -0.5 * (amx_bmy * mx + bmx_cmy * my) + lo
    z = jnp.zeros_like(a)
    return jnp.stack([-0.5 * a, -b, -0.5 * c, amx_bmy, bmx_cmy, const,
                      lo, z], axis=-1)


def _block_scalars(ref, b, tb):
    vals = [ref[b * tb + i] for i in range(tb)]
    mx = vals[0]
    for i in range(1, tb):
        mx = jnp.maximum(mx, vals[i])
    return vals, mx


def _run_penalty(cnts, c, chunk, tb):
    """[tb,chunk,1] f32 additive log-alpha penalty: 0 inside each tile's
    run, -1e30 beyond — built from 2-D pieces because Mosaic supports
    neither i1 minor-dim insertion nor [tb]->[tb,1,1] vector reshapes."""
    slot2 = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    return jnp.stack([jnp.where(slot2 < cnts[i], 0.0, -1e30)
                      for i in range(tb)])


def _lane_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (8, BRICK), 1)


def _gather_fc(scratch, j0s, phs, c, tb):
    """[tb,8,128] feature slice: tile i's chunk-c pairs assembled from
    two adjacent bricks of the DMA'd window, phase-aligned with dynamic
    lane rolls."""
    lane = _lane_iota()
    parts = []
    for i in range(tb):
        b0 = scratch[j0s[i] + c]
        b1 = scratch[j0s[i] + c + 1]
        r0 = pltpu.roll(b0, -phs[i], axis=1)
        r1 = pltpu.roll(b1, -phs[i], axis=1)
        parts.append(jnp.where(lane < BRICK - phs[i], r0, r1))
    return jnp.stack(parts)


def _chunk_alpha(fc, basis, pen):
    """Masked alpha [tb,C,P] from a [tb,8,C] feature slice (v3 math,
    penalty-masked)."""
    logalpha = jax.lax.dot_general(
        fc, basis, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)          # [tb,C,P]
    logop = fc[:, 6, :][..., None]                    # [tb,C,1]
    logalpha = logalpha + pen
    ok = logalpha <= logop + SIGMA_GUARD_EPS
    alpha = jnp.exp(jnp.where(ok, logalpha, -1e30))
    ok = ok & (alpha >= ALPHA_THRESHOLD)
    alpha = jnp.where(ok, jnp.minimum(alpha, ALPHA_CLAMP), 0.0)
    return alpha, ok


def _fwd_kernel(sbb_ref, sfp_ref, counts_ref, bricks_hbm, basis_ref,
                out_ref, scratch, sem, *, winb, tb):
    b = pl.program_id(0)

    def win_dma(idx):
        return pltpu.make_async_copy(
            bricks_hbm.at[pl.ds(sbb_ref[idx], winb)], scratch, sem)

    # cross-grid-step prefetch: each step STARTS the next block's window
    # DMA after its walk (the scratch is dead by then), so the copy flies
    # through the out-block write + step transition; step 0 fetches its
    # own. The wait below matches whichever start targeted this block.
    @pl.when(b == 0)
    def _():
        win_dma(0).start()
    basis = basis_ref[:]                              # [8,P]
    p = basis.shape[1]
    cnts, maxc = _block_scalars(counts_ref, b, tb)
    sb_pair = sbb_ref[b] * BRICK
    j0s, phs = [], []
    for i in range(tb):
        rel = sfp_ref[b * tb + i] - sb_pair
        j0s.append(rel // BRICK)
        phs.append(rel % BRICK)
    win_dma(b).wait()

    img0 = jnp.zeros((tb, p), jnp.float32)
    t0 = jnp.ones((tb, p), jnp.float32)
    needed = (maxc + BRICK - 1) // BRICK

    def cond_fn(state):
        c, _, t_carry = state
        return (c < needed) & (jnp.max(t_carry) >= TRANSMITTANCE_EPS)

    def body(state):
        c, img, t_carry = state
        fc = _gather_fc(scratch, j0s, phs, c, tb)
        pen = _run_penalty(cnts, c, BRICK, tb)
        alpha, _ = _chunk_alpha(fc, basis, pen)
        om = 1.0 - alpha
        t_inc = t_carry[:, None, :] * _cumprod_slots(om, BRICK)
        keep = (t_inc >= TRANSMITTANCE_EPS).astype(jnp.float32)
        img = img + jnp.sum(alpha * (t_inc / om) * keep, axis=1)
        return c + 1, img, t_inc[:, BRICK - 1, :]

    _, img, _ = jax.lax.while_loop(cond_fn, body,
                                   (jnp.int32(0), img0, t0))

    @pl.when(b + 1 < pl.num_programs(0))
    def _():
        win_dma(b + 1).start()
    out_ref[:] = img


def _bwd_kernel(sbb_ref, sfp_ref, counts_ref, bricks_hbm, basis_ref,
                g_ref, total_ref, dout_hbm, scratch, dwin, sem, dsem,
                *, winb, tb):
    b = pl.program_id(0)

    def win_dma(idx):
        return pltpu.make_async_copy(
            bricks_hbm.at[pl.ds(sbb_ref[idx], winb)], scratch, sem)

    def out_dma(idx):
        return pltpu.make_async_copy(
            dwin, dout_hbm.at[pl.ds(sbb_ref[idx], winb)], dsem)

    # cross-grid-step read prefetch (see _fwd_kernel)
    @pl.when(b == 0)
    def _():
        win_dma(0).start()
    basis = basis_ref[:]
    cnts, maxc = _block_scalars(counts_ref, b, tb)
    sb_pair = sbb_ref[b] * BRICK
    j0s, phs = [], []
    for i in range(tb):
        rel = sfp_ref[b * tb + i] - sb_pair
        j0s.append(rel // BRICK)
        phs.append(rel % BRICK)
    g = g_ref[:]                                      # [tb,P]
    total = total_ref[:]                              # [tb,P]
    # the previous block's window write must complete before dwin is
    # reused AND before this block's write starts (overlapping overhang
    # regions rely on program-order completion)
    @pl.when(b > 0)
    def _():
        out_dma(b - 1).wait()
    win_dma(b).wait()

    dwin[:] = jnp.zeros_like(dwin)
    needed = (maxc + BRICK - 1) // BRICK
    lane = _lane_iota()

    def cond_fn(state):
        c, _, t_carry = state
        return (c < needed) & (jnp.max(t_carry) >= TRANSMITTANCE_EPS)

    def body(state):
        c, csum, t_carry = state
        fc = _gather_fc(scratch, j0s, phs, c, tb)
        pen = _run_penalty(cnts, c, BRICK, tb)
        alpha, ok = _chunk_alpha(fc, basis, pen)
        om = 1.0 - alpha
        t_inc = t_carry[:, None, :] * _cumprod_slots(om, BRICK)
        keep = (t_inc >= TRANSMITTANCE_EPS).astype(jnp.float32)
        t_prev = t_inc / om
        contrib = alpha * t_prev * keep
        c_inc = csum[:, None, :] + _cumsum_slots(contrib, BRICK)
        suffix = total[:, None, :] - c_inc
        dalpha = (t_prev - suffix / om) * keep * g[:, None, :]
        dla = jnp.where(ok & (alpha < ALPHA_CLAMP), alpha * dalpha, 0.0)
        dfc = jax.lax.dot_general(
            dla, basis, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)      # [tb,C,8]
        dfc = jnp.swapaxes(dfc, 1, 2)                 # [tb,8,C]
        # un-rotate each tile's chunk back to brick phase and ACCUMULATE:
        # dla is exactly zero outside the run (penalty-masked), so
        # overlapping chunk windows contribute zeros — plain adds, no
        # write masks needed
        for i in range(tb):
            rolled = pltpu.roll(dfc[i], phs[i], axis=1)
            hi = jnp.where(lane >= phs[i], rolled, 0.0)
            lo = jnp.where(lane < phs[i], rolled, 0.0)
            j = j0s[i] + c
            dwin[j] = dwin[j] + hi
            dwin[j + 1] = dwin[j + 1] + lo
        return c + 1, c_inc[:, BRICK - 1, :], t_inc[:, BRICK - 1, :]

    jax.lax.while_loop(
        cond_fn, body,
        (jnp.int32(0), jnp.zeros((tb, basis.shape[1]), jnp.float32),
         jnp.ones((tb, basis.shape[1]), jnp.float32)))

    # start this block's window store and prefetch the next read; the
    # store is WAITED at the start of the next grid step (before dwin
    # reuse and before the next overlapping store), or here on the last
    # block. Later blocks overwrite this block's overhang (sequential,
    # ordered by those waits); garbage rows past s_f[T] are masked by
    # the caller via pair_valid.
    out_dma(b).start()
    nblocks = pl.num_programs(0)

    @pl.when(b + 1 < nblocks)
    def _():
        win_dma(b + 1).start()

    @pl.when(b + 1 == nblocks)
    def _():
        out_dma(b).wait()


def _winb(cap: int, tb: int) -> int:
    # max brick index touched: run offset within the block
    # (<= (tb-1)*cap pairs) + walked chunks (<= cap) + boundary brick
    return (tb * cap) // BRICK + 2


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def _pair_fwd(bricks, sbb, sfp, counts_f, basis, cap: int,
              interpret: bool):
    tb = TILE_BLOCK
    winb = _winb(cap, tb)
    G = sbb.shape[0]
    p = basis.shape[1]
    img = pl.pallas_call(
        functools.partial(_fwd_kernel, winb=winb, tb=tb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(G,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((8, p), lambda b, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tb, p), lambda b, *_: (b, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((winb, 8, BRICK), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=vma.out_struct((G * tb, p), jnp.float32, bricks, sbb,
                                 sfp, counts_f),
        cost_estimate=pl.CostEstimate(
            flops=2 * G * tb * cap * 9 * p + 14 * G * tb * cap * p,
            bytes_accessed=G * winb * 8 * BRICK * 4 + G * tb * p * 4,
            transcendentals=G * tb * cap * p),
        interpret=interpret,
    )(sbb, sfp, counts_f, bricks, basis)
    return img


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def _pair_bwd(bricks, sbb, sfp, counts_f, basis, g, total, cap: int,
              interpret: bool):
    tb = TILE_BLOCK
    winb = _winb(cap, tb)
    G = sbb.shape[0]
    p = basis.shape[1]
    dbricks = pl.pallas_call(
        functools.partial(_bwd_kernel, winb=winb, tb=tb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(G,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((8, p), lambda b, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, p), lambda b, *_: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, p), lambda b, *_: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((winb, 8, BRICK), jnp.float32),
                pltpu.VMEM((winb, 8, BRICK), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=vma.out_struct(bricks.shape, jnp.float32, bricks, sbb,
                                 sfp, counts_f, g, total),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=4 * G * tb * cap * 9 * p + 28 * G * tb * cap * p,
            bytes_accessed=2 * G * winb * 8 * BRICK * 4 + G * tb * p * 4,
            transcendentals=G * tb * cap * p),
        interpret=interpret,
    )(sbb, sfp, counts_f, bricks, basis, g, total)
    return dbricks


def _prep(packed_sorted, pbins: PairBins, origins, cap: int):
    """XLA-side shared prep: pair features -> bricks + block tables."""
    tb = TILE_BLOCK
    Bp = pbins.pair_ranks.shape[0]
    T = pbins.counts_f.shape[0]
    winb = _winb(cap, tb)

    src = packed_sorted[pbins.pair_ranks]             # [Bp,8] row gather
    org = origins[pbins.perm]                         # [T,2] frame order
    ox = step_over_pairs(pbins.s_f, org[:, 0], Bp)
    oy = step_over_pairs(pbins.s_f, org[:, 1], Bp)
    feats = build_pair_features(src, ox, oy)          # [Bp,8]

    # pair-domain brick relayout (+ window over-read margin)
    nb = cdiv(Bp, BRICK) + winb
    feats_pad = jnp.pad(feats, ((0, nb * BRICK - Bp), (0, 0)))
    bricks = feats_pad.reshape(nb, BRICK, 8).transpose(0, 2, 1)

    Tp = cdiv(T, tb) * tb
    s_f_pad = jnp.pad(pbins.s_f, (0, Tp - T), mode="edge")   # [Tp+1]
    counts_pad = jnp.pad(pbins.counts_f, (0, Tp - T))
    sfp = s_f_pad[:-1]                                 # [Tp]
    sbb = sfp[::tb] // BRICK                           # [G] brick starts
    return src, ox, oy, bricks, sbb, sfp, counts_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def pair_render(packed_sorted, pbins: PairBins, origins, basis, sink,
                cap: int, interpret: bool | None = None):
    """Frame-ordered tile intensities [T,P] from sorted pair tables.

    Differentiable in ``packed_sorted`` (the depth-sorted [N,8] packed
    rows) and, through ``sink``'s cotangent, reports per-Gaussian
    accumulated |d means2d| (absgrad). The caller unpermutes the images
    via ``pbins.perm`` (ops/rasterize.py).
    """
    img, _ = _pair_fwd_impl(packed_sorted, pbins, origins, basis, cap,
                            interpret)
    return img


def _pair_fwd_impl(packed_sorted, pbins, origins, basis, cap, interpret):
    interpret = _auto_interpret() if interpret is None else interpret
    src, ox, oy, bricks, sbb, sfp, counts_pad = _prep(
        packed_sorted, pbins, origins, cap)
    T = pbins.counts_f.shape[0]
    img = _pair_fwd(bricks, sbb, sfp, counts_pad, basis, cap,
                    interpret)[:T]
    return img, (src, ox, oy, bricks, sbb, sfp, counts_pad, img)


def _pr_fwd(packed_sorted, pbins, origins, basis, sink, cap, interpret):
    img, res = _pair_fwd_impl(packed_sorted, pbins, origins, basis, cap,
                              interpret)
    return img, (packed_sorted.shape[0], pbins, basis, res)


def _pr_bwd(cap, interpret, saved, g):
    n, pbins, basis, res = saved
    (src, ox, oy, bricks, sbb, sfp, counts_pad, img) = res
    interpret = _auto_interpret() if interpret is None else interpret
    tb = TILE_BLOCK
    Bp = pbins.pair_ranks.shape[0]
    T = pbins.counts_f.shape[0]

    g_pad = _pad_tiles(g, tb)
    total_pad = _pad_tiles(img, tb)
    dbricks = _pair_bwd(bricks, sbb, sfp, counts_pad, basis, g_pad,
                        total_pad, cap, interpret)
    # bricks -> pair rows (pair-domain relayout), mask garbage
    dfeats = dbricks.transpose(0, 2, 1).reshape(-1, 8)[:Bp]
    dfeats = jnp.where(pbins.pair_valid[:, None], dfeats, 0.0)

    _, fvjp = jax.vjp(lambda s: build_pair_features(s, ox, oy), src)
    (dsrc,) = fvjp(dfeats)                            # [Bp,8]
    rows = jnp.concatenate([dsrc, jnp.abs(dsrc[:, 3:5])], axis=-1)
    idx = jnp.where(pbins.pair_valid, pbins.pair_ranks, n)
    from edgegaussians_tpu.ops.composite import _scatter_rows
    acc = _scatter_rows(idx, rows, n)
    dpacked = acc[:, :8]
    dsink = jnp.zeros((n, 2), dtype=dsrc.dtype).at[pbins.order].set(
        acc[:, 8:10], mode="drop", unique_indices=True)

    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    zero_bins = jax.tree.map(f0, pbins)
    return (dpacked, zero_bins, jnp.zeros((T, 2), jnp.float32),
            jnp.zeros_like(basis), dsink)


pair_render.defvjp(_pr_fwd, _pr_bwd)
