"""Segmented pair-dense compositor (5th-generation kernel design).

The v4 pair-domain kernels (ops/pallas_pair.py) removed the dense-frame
scatter but kept the v3 per-tile chunk walk: every tile in a TILE_BLOCK
pays whole 128-slot chunks regardless of its true occupancy. On real edge
scenes (median tile occupancy ~13 at the ABC shape) that predication
waste is ~10x — the measured fwd/bwd coefficients of 9/14 ns per budget
pair vs a ~1.3 ns/pair VPU ideal (docs/KERNELS.md §7) are almost entirely
chunk-rounding.

The v5 design makes the PAIR the unit of vector work: the grid walks
128-pair *bricks* where every lane is a real pair, so kernel cost is
proportional to the budget, not to tiles x chunks:

- pairs arrive in the same occupancy-frame order as v4
  (tiles.bin_pairs_frame_order) but with ``block_tiles=0`` — the
  per-block brick-alignment pads (~29% of the v4 pair stream at ABC
  shapes) are GONE, shrinking every pair-proportional XLA stage too,
- one brick = a [16, 128] feature block: rows 0-7 the matmul features,
  row 8 the pair's frame row, row 9 its depth slot within the run
  (both exact in f32). One [8,128] x [8,P] MXU product evaluates
  log-alpha for all 128 pairs at once — tile-local coordinates make the
  pixel basis tile-independent, so pairs of DIFFERENT tiles share the
  matmul,
- per-tile transmittance is a SEGMENTED Hillis-Steele scan along the
  pair axis (axis-0 ``pltpu.roll``; segment rule: shift s applies at a
  lane iff s <= its depth slot), with the open run's transmittance
  carried across bricks (the sequential order makes exactly one run
  open at a brick boundary),
- per-brick tile images are a one-hot segment-sum matmul
  ``M[row, lane] @ contrib[lane, px]`` onto the MXU,
- each grid step processes WSTEP bricks in a ``fori_loop`` (one
  brick/step paid ~1-2.5 us of per-step overhead against ~1 us of
  vector work — measured in round 4), accumulating their [WR, P]
  one-hot windows into a shared [SW, P] step buffer at 8-aligned
  dynamic offsets, then writes ONE [SW, P] window to HBM at the step's
  8-aligned base row (Mosaic requires provably 8-divisible dynamic
  sublane offsets — ``pl.multiple_of``; probed in
  scripts/segpair_mosaic_probe.py). An 8-row image carry block hands
  partially-accumulated rows to the next step, whose window rewrites
  them — later writes win, so every row's final value is complete
  (rows with earlier content always sit in the window's first 8-row
  group because contributions are monotone in frame row),
- the backward needs NO windowed output at all: each pair's gradient
  row lives in exactly one brick, so dbricks is a plain blocked output
  (the v4 backward's overlapping window write-backs disappear),
- the backward's suffix term is ALGEBRAIC, not scanned (round 5): with
  all-ones colors, contributions telescope within a run
  (contrib_l = t_prev_l - t_inc_l, and the keep cutoff is a prefix
  property since t is monotone), so the inclusive contribution prefix
  is exactly 1 - t_inc and
      dL/dalpha_l = (t_prev_l - suffix_l/om_l) g = g (1 - total) / om_l
  for every kept lane. The bwd therefore runs ONE segmented scan (the
  transmittance, needed only for the keep mask), no division, and its
  per-lane cotangent comes from one transposed one-hot product against
  a [WR, P] slice of a PRE-FOLDED g*(1-total) window — half the v5.1
  [WR, 2P] product and half the window DMA,
- the binning tables arrive SORT-FREE (tiles.bin_pairs_frame_order
  with block_tiles=0 computes them from the fused sort's outputs with
  [T]-sized arithmetic + one [B] row-gather — no re-key sort, no
  second searchsorted; ~0.6 ms/render at ABC shapes),
- kernel cost is proportional to REAL work, not the static budget
  (round 5): grid steps wholly past the last real pair skip their
  compute body (scalar-prefetched live-step count — the shipped
  budgets carry ~1.5x density headroom), and bricks wholly inside an
  already-saturated run skip exactly (whole-run flag + max(t) < eps;
  the stale sub-eps carry keeps every later lane's keep at 0).

Semantics are identical to v4: single-level capacity (the pair stream is
pre-filtered to slot < cap by binning), gsplat clamp/skip/cutoff rules,
alpha matmuls at Precision.HIGHEST (KERNELS.md §3). Compositing ORDER
within a tile is identical; only the f32 association of the
transmittance products differs (brick-boundary grouping), so parity vs
v4/dense is to f32 noise, pinned in tests/test_pallas_segpair.py.

Mosaic facts this design rests on (probed on v5e,
scripts/segpair_mosaic_probe.py): axis-0 static rolls on [128, P] f32
lower; (16,128)<->(128,16) transposes lower; in-kernel one-hot builds +
HIGHEST dot_generals lower; HBM dynamic row-offset DMA windows need
8-divisible offsets (pl.multiple_of) and then lower in both directions.
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
from edgegaussians_tpu.ops.pallas_raster_v2 import _auto_interpret
from edgegaussians_tpu.ops.pallas_pair import build_pair_features
from edgegaussians_tpu.ops.tiles import PairBins, cdiv, step_over_pairs

import os as _os

BRICK = int(_os.environ.get("EG_SEG_BRICK", "128"))
                # pairs per brick (= pair-axis scan width); env-overridable
                # for geometry sweeps
CARRY = 8       # image rows handed across steps (sublane tiling unit)
WR = BRICK + CARRY   # per-brick one-hot rows: 8-aligned base + max span
WSTEP = int(_os.environ.get("EG_SEG_WSTEP", "8"))
                # bricks per grid step — amortizes the ~1-2.5 us Mosaic
                # per-grid-step overhead that dominated the 1-brick/step
                # v5.0 kernels (measured: bwd 2.56 us/brick vs ~1 us of
                # vector work)
SW = CARRY + BRICK * WSTEP   # step image window rows (off_k + WR <= SW)


def _seg_alpha(fc, basis, logop):
    """[8,BRICK] features -> masked alpha [BRICK,P] (v3 numerics rules)."""
    logalpha = jax.lax.dot_general(
        fc, basis, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)          # [BRICK,P]
    ok = logalpha <= logop + SIGMA_GUARD_EPS
    alpha = jnp.exp(jnp.where(ok, logalpha, -1e30))
    ok = ok & (alpha >= ALPHA_THRESHOLD)
    alpha = jnp.where(ok, jnp.minimum(alpha, ALPHA_CLAMP), 0.0)
    return alpha, ok


def _seg_scan_variant():
    """Transmittance-scan implementation: 'hillis' = log2(BRICK)-pass
    segmented Hillis-Steele (SHIPS); 'two_level' = 3 full-width passes
    within 8-lane groups + a 4-pass scan of the 16 group summaries
    (extracted/broadcast via tiny one-hot matmuls). MEASURED NEGATIVE
    on v5e (round 5, 30-step device traces): fwd custom-call 0.538 vs
    0.313 ms, bwd 0.580 vs 0.383 — the three [16-or-128 x 128] one-hot
    matmuls and cascade fills cost more in-kernel than the four saved
    full-width roll passes (short-output matmuls leave the systolic
    array mostly idle and serialize against the VPU). Kept env-gated
    so the result is reproducible, not retried."""
    import os
    return os.environ.get("EG_SEG_SCAN", "hillis")


def _seg_scan(x, dcol, op, unit):
    """Segmented inclusive scan along axis 0 (pairs), multiplicative.

    Shift s applies at lane l iff l-s is in-brick AND in the same run
    (s <= depth slot dcol[l]); out-of-run positions contribute ``unit``.
    Runs opening before the brick accumulate from lane 0 — the caller
    folds the cross-brick carry in separately.
    """
    if _seg_scan_variant() == "two_level" and BRICK == 128:
        return _seg_scan_two_level(x, dcol, op, unit)
    srow = jax.lax.broadcasted_iota(jnp.int32, (BRICK, 1), 0)
    s = 1
    while s < BRICK:
        use = (srow >= s) & (dcol >= jnp.float32(s))
        x = op(x, jnp.where(use, pltpu.roll(x, s, axis=0), unit))
        s *= 2
    return x


def _seg_scan_two_level(x, dcol, op, unit):
    """Two-level segmented scan: within-8-group passes (s=1,2,4), then a
    4-pass segmented scan of the 16 group-end summaries, broadcast back.

    Level-B recurrence: the global value at a group's last lane is its
    within-group value times the previous group's global value iff its
    run extends past the group start (dcol >= 8); combining across s
    groups needs dcol >= 8s. The in-group condition (srow % 8 >= s)
    confines level A to groups; a lane multiplies the broadcast
    group-prefix iff its run extends before ITS group start
    (dcol >= (l % 8) + 1). Cross-brick runs carry huge dcol, making
    every condition true — identical semantics to the flat scan.
    """
    srow = jax.lax.broadcasted_iota(jnp.int32, (BRICK, 1), 0)
    sub = srow & 7                                    # lane offset in group
    for s in (1, 2, 4):
        use = (sub >= s) & (dcol >= jnp.float32(s))
        x = op(x, jnp.where(use, pltpu.roll(x, s, axis=0), unit))

    ng = BRICK // 8
    # group-end rows (lane 8j+7) extracted with a one-hot matmul
    gi = jax.lax.broadcasted_iota(jnp.int32, (ng, BRICK), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (ng, BRICK), 1)
    sel = (li == 8 * gi + 7).astype(jnp.float32)      # [ng,BRICK]
    gval = jax.lax.dot_general(
        sel, x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)          # [ng,P]
    gdc = jax.lax.dot_general(
        sel, dcol, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)          # [ng,1]
    grow = jax.lax.broadcasted_iota(jnp.int32, (ng, 1), 0)
    s = 1
    while s < ng:
        # conditions test the ORIGINAL run extents (like the flat scan)
        use = (grow >= s) & (gdc >= jnp.float32(8 * s))
        gval = op(gval, jnp.where(use, pltpu.roll(gval, s, axis=0), unit))
        s *= 2
    # exclusive group prefix: shift down one group, unit into group 0
    gprev = jnp.where(grow >= 1, pltpu.roll(gval, 1, axis=0), unit)
    # broadcast to lanes (rows 8j of a [BRICK,P] array via one-hot)
    exp = (li == 8 * gi).astype(jnp.float32)
    bcast = jax.lax.dot_general(
        exp, gprev, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)          # [BRICK,P] rows 8j
    # cascade-fill each group's 8 lanes from its base row
    for s in (1, 2, 4):
        moved = pltpu.roll(bcast, s, axis=0)
        bcast = jnp.where((sub >= s) & (sub < 2 * s), moved, bcast)
    # a lane multiplies its group prefix iff its run crosses the group
    # start (dcol >= lane offset + 1)
    crosses = dcol >= (sub.astype(jnp.float32) + 1.0)
    return op(x, jnp.where(crosses, bcast, unit))


def _onehot(rrow, base, rows):
    """[rows, BRICK] f32 one-hot: M[r, l] = (rrow[l] - base == r)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, BRICK), 0)
    return (ri.astype(jnp.float32) + base == rrow).astype(jnp.float32)


def _onehot_2pass():
    """One-hot matmul strategy. The 0/1 operand is EXACT in bf16, so a
    manual hi/lo split of the value operand gives a TWO-pass native-bf16
    MXU product with only the split's 2^-17 rounding (~7.5e-6 max rel
    err, matching Precision.HIGH in the probe —
    scripts/precision_probe.py; Mosaic cannot lower HIGH itself).
    EG_SEG_ONEHOT_PREC=highest restores the full-precision single dot
    for A/B."""
    import os
    return os.environ.get("EG_SEG_ONEHOT_PREC", "2pass") == "2pass"


def _onehot_dot(m, v, dims):
    """Exact-one-hot contraction ``dot_general(m, v, dims)`` where ``m``
    is 0/1: two bf16 passes (hi + lo) accumulating in f32, or one
    HIGHEST dot (env-gated, see :func:`_onehot_2pass`)."""
    if not _onehot_2pass():
        return jax.lax.dot_general(
            m, v, (dims, ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    mb = m.astype(jnp.bfloat16)
    vh = v.astype(jnp.bfloat16)
    vl = (v - vh.astype(jnp.float32)).astype(jnp.bfloat16)
    kw = dict(dimension_numbers=(dims, ((), ())),
              preferred_element_type=jnp.float32)
    return (jax.lax.dot_general(mb, vh, **kw)
            + jax.lax.dot_general(mb, vl, **kw))


def _seg_matmul(m, v):
    """One-hot segment contraction on the MXU ([A,BRICK] x [B?,..])."""
    return _onehot_dot(m, v, ((1,), (0,)))


def _brick_common(x, basis, cont_fr):
    """Shared per-brick eval: (alpha, ok, om, t_within, tmul_mask, dcol,
    rrow_raw). ``t_within``: segmented cumprod of (1-alpha) WITHOUT the
    cross-brick carry; ``cont`` flags lanes of the run continuing from
    the previous brick."""
    fc = x[0:8]                                       # [8,BRICK]
    xT = jnp.swapaxes(x, 0, 1)                        # [BRICK,16]
    logop = xT[:, 6:7]
    frcol = xT[:, 8:9]
    dcol = xT[:, 9:10]
    alpha, ok = _seg_alpha(fc, basis, logop)
    om = 1.0 - alpha
    t_within = _seg_scan(om, dcol, jax.lax.mul, 1.0)
    cont = frcol == cont_fr.astype(jnp.float32)       # [BRICK,1]
    return alpha, ok, om, t_within, cont, dcol, x[8:9, :]


def _fwd_kernel(nlive_ref, w0s_ref, cont_ref, skip_ref, ws0_ref, d8st_ref,
                brick_ref, basis_ref, out_hbm, stepbuf, carry8, tcar, sem,
                *, p):
    s = pl.program_id(0)

    def out_dma(idx):
        off = pl.multiple_of(ws0_ref[idx], CARRY)
        return pltpu.make_async_copy(stepbuf, out_hbm.at[pl.ds(off, SW)],
                                     sem)

    @pl.when(s == 0)
    def _():
        carry8[:] = jnp.zeros_like(carry8)
        tcar[:] = jnp.ones_like(tcar)

    # the previous step-window write must land before stepbuf is rebuilt
    # (windows overlap; sequential completion makes later-write-wins exact)
    @pl.when(s > 0)
    def _():
        out_dma(s - 1).wait()
    stepbuf[:] = jnp.zeros_like(stepbuf)
    # rows [ws0, ws0+8) may hold earlier steps' accumulation (rows above
    # the step's first tile cannot — contributions are monotone in row)
    stepbuf[0:CARRY] = carry8[:]

    basis = basis_ref[:]                              # [8,P]
    ws0 = ws0_ref[s]

    def body(k, t_row):
        def live(t_row):
            alpha, _, om, t_within, cont, _, rraw = _brick_common(
                brick_ref[k], basis, cont_ref[s * WSTEP + k])
            t_inc = t_within * jnp.where(cont, t_row, 1.0)
            keep = (t_inc >= TRANSMITTANCE_EPS).astype(jnp.float32)
            contrib = alpha * (t_inc / om) * keep     # [BRICK,P]
            w0b = w0s_ref[s * WSTEP + k]
            rrow = rraw - w0b.astype(jnp.float32)     # [1,BRICK]
            seg = _seg_matmul(_onehot(rrow, 0.0, WR), contrib)
            off = pl.multiple_of(w0b - ws0, CARRY)
            stepbuf[pl.ds(off, WR)] = stepbuf[pl.ds(off, WR)] + seg
            return t_inc[BRICK - 1:BRICK, :]

        # saturated-run skip: brick wholly inside the continuing run AND
        # carry saturated -> zero contributions; stale carry is exact
        # (see _prep's skippable derivation)
        skip = (skip_ref[s * WSTEP + k] > 0) & \
            (jnp.max(t_row) < TRANSMITTANCE_EPS)
        return jax.lax.cond(skip, lambda t: t, live, t_row)

    # budget tail: steps wholly past the last REAL pair (the budget's
    # density-growth headroom, ~1/3 of the stream at shipped configs)
    # skip the compute body — kernel cost is proportional to real
    # pairs, not the static budget. Their windows still flush (zeros +
    # the carried rows, which later windows would rewrite anyway).
    @pl.when(s < nlive_ref[0])
    def _():
        tcar[0:1, :] = jax.lax.fori_loop(0, WSTEP, body, tcar[0:1, :])
    # hand the next step ITS first-group rows [ws0', ws0'+8)
    d8 = pl.multiple_of(d8st_ref[s], CARRY)
    carry8[:] = stepbuf[pl.ds(d8, CARRY)]

    out_dma(s).start()

    @pl.when(s + 1 == pl.num_programs(0))
    def _():
        out_dma(s).wait()


def _bwd_kernel(nlive_ref, w0s_ref, cont_ref, skip_ref, ws0_ref,
                brick_ref, basis_ref, gt_hbm, dout_ref, gtwin, tcar, sem,
                *, p):
    s = pl.program_id(0)

    def gt_dma(idx):
        off = pl.multiple_of(ws0_ref[idx], CARRY)
        return pltpu.make_async_copy(gt_hbm.at[pl.ds(off, SW)], gtwin, sem)

    @pl.when(s == 0)
    def _():
        tcar[:] = jnp.ones_like(tcar)
        gt_dma(0).start()

    basis = basis_ref[:]
    ws0 = ws0_ref[s]
    gt_dma(s).wait()

    def body(k, t_row):
        def live(t_row):
            alpha, ok, om, t_within, cont, dcol, rraw = _brick_common(
                brick_ref[k], basis, cont_ref[s * WSTEP + k])
            t_inc = t_within * jnp.where(cont, t_row, 1.0)
            keep = (t_inc >= TRANSMITTANCE_EPS).astype(jnp.float32)

            w0b = w0s_ref[s * WSTEP + k]
            rrow = rraw - w0b.astype(jnp.float32)
            m = _onehot(rrow, 0.0, WR)                # [WR,BRICK]
            off = pl.multiple_of(w0b - ws0, CARRY)
            gtw = gtwin[pl.ds(off, WR)]               # [WR,P]
            # ONE transposed one-hot product gathers the per-lane
            # PRE-FOLDED cotangent g*(1-total); the suffix term is
            # algebraic (module docstring): dalpha_l = g (1 - total) /
            # om_l for kept lanes — no contribution scan, no division
            # by om for t_prev
            gt2_lane = _onehot_dot(m, gtw, ((0,), (0,)))  # [BRICK,P]

            dalpha = gt2_lane / om * keep
            dla = jnp.where(ok & (alpha < ALPHA_CLAMP), alpha * dalpha,
                            0.0)
            dfc = jax.lax.dot_general(
                dla, basis, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # [BRICK,8]
            dout_ref[k] = jnp.swapaxes(dfc, 0, 1)     # [8,BRICK]
            return t_inc[BRICK - 1:BRICK, :]

        def skip_fn(t_row):
            # saturated-run skip (see _fwd_kernel): every lane's dla
            # would be 0; the blocked output must still be written
            dout_ref[k] = jnp.zeros((8, BRICK), jnp.float32)
            return t_row

        skip = (skip_ref[s * WSTEP + k] > 0) & \
            (jnp.max(t_row) < TRANSMITTANCE_EPS)
        return jax.lax.cond(skip, skip_fn, live, t_row)

    # budget-tail steps skip compute (see _fwd_kernel); their dbricks
    # blocks stay unwritten — every pair there is invalid and the
    # caller masks dfeats rows by pair validity (_sp_bwd)
    @pl.when(s < nlive_ref[0])
    def _():
        tcar[0:1, :] = jax.lax.fori_loop(0, WSTEP, body, tcar[0:1, :])

    # prefetch the next step's cotangent window (gtwin consumed above)
    @pl.when(s + 1 < pl.num_programs(0))
    def _():
        gt_dma(s + 1).start()


@functools.partial(jax.jit, static_argnames=("tp", "interpret"))
def _seg_fwd(bricks, nlive, w0s, cont_frs, skippable, ws0, d8st, basis,
             tp: int, interpret: bool):
    nb = bricks.shape[0]
    ns = nb // WSTEP
    p = basis.shape[1]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, p=p),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(ns,),
            in_specs=[
                pl.BlockSpec((WSTEP, 16, BRICK), lambda s, *_: (s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, p), lambda s, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((SW, p), jnp.float32),
                pltpu.VMEM((CARRY, p), jnp.float32),
                pltpu.VMEM((CARRY, p), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=vma.out_struct((tp, p), jnp.float32, bricks, w0s,
                                 cont_frs, ws0, d8st),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * BRICK * p * (8 + WR + CARRY),
            bytes_accessed=nb * 16 * BRICK * 4 + ns * SW * p * 4,
            transcendentals=nb * BRICK * p),
        interpret=interpret,
    )(nlive, w0s, cont_frs, skippable, ws0, d8st, bricks, basis)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _seg_bwd(bricks, nlive, w0s, cont_frs, skippable, ws0, basis, gt,
             interpret: bool):
    nb = bricks.shape[0]
    ns = nb // WSTEP
    p = basis.shape[1]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, p=p),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(ns,),
            in_specs=[
                pl.BlockSpec((WSTEP, 16, BRICK), lambda s, *_: (s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, p), lambda s, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec((WSTEP, 8, BRICK),
                                   lambda s, *_: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((SW, p), jnp.float32),
                pltpu.VMEM((CARRY, p), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=vma.out_struct((nb, 8, BRICK), jnp.float32, bricks, w0s,
                                 cont_frs, ws0, gt),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * BRICK * p * (16 + WR + 8),
            bytes_accessed=nb * (16 + 8) * BRICK * 4 + ns * SW * p * 4,
            transcendentals=nb * BRICK * p),
        interpret=interpret,
    )(nlive, w0s, cont_frs, skippable, ws0, bricks, basis, gt)


def _prep(packed_sorted, pbins: PairBins, origins):
    """XLA-side prep: pair features + per-pair row/slot channels ->
    [nb,16,BRICK] bricks and the per-brick / per-step scalar tables."""
    B = pbins.pair_ranks.shape[0]
    T = pbins.counts_f.shape[0]
    nb = cdiv(B, BRICK * WSTEP) * WSTEP       # whole steps of WSTEP bricks
    Bp = nb * BRICK
    valid = pbins.pair_valid
    ranks = pbins.pair_ranks
    if Bp > B:
        valid = jnp.pad(valid, (0, Bp - B))
        ranks = jnp.pad(ranks, (0, Bp - B))

    src = packed_sorted[ranks]                        # [Bp,8] row gather
    org = origins[pbins.perm]                         # [T,2] frame order
    ox = step_over_pairs(pbins.s_f, org[:, 0], Bp)
    oy = step_over_pairs(pbins.s_f, org[:, 1], Bp)
    feats = build_pair_features(src, ox, oy)          # [Bp,8]
    # invalid pairs (budget tail / brick round-up): alpha underflows to
    # exactly 0 through the const slot, so no mask plumbing downstream
    feats = feats.at[:, 5].set(
        jnp.where(valid, feats[:, 5], jnp.float32(-1e30)))

    pp = jnp.arange(Bp, dtype=jnp.int32)
    fr = step_over_pairs(pbins.s_f, jnp.arange(T, dtype=jnp.int32), Bp,
                         jnp.int32)
    # garbage rows park at the FIRST EMPTY frame row (occupancy order puts
    # all zero-count rows last), keeping the row jump between consecutive
    # bricks <= BRICK so every within-step window offset stays < SW; their
    # zero contributions land on an empty row the caller masks anyway
    nnz = jnp.sum((pbins.counts_f > 0).astype(jnp.int32))
    fr = jnp.where(valid, fr, nnz)
    start = step_over_pairs(pbins.s_f, pbins.s_f[:-1], Bp, jnp.int32)
    dst = jnp.where(valid, pp - start, 0)

    feats16 = jnp.concatenate(
        [feats, fr[:, None].astype(jnp.float32),
         dst[:, None].astype(jnp.float32),
         jnp.zeros((Bp, 6), jnp.float32)], axis=1)
    bricks = feats16.reshape(nb, BRICK, 16).transpose(0, 2, 1)

    fr_rs = fr.reshape(nb, BRICK)
    fr_base = fr_rs[:, 0]
    w0s = (fr_base // CARRY) * CARRY                  # 8-aligned bases
    cont_frs = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), fr_rs[:-1, BRICK - 1]])
    # brick is WHOLLY inside the run continuing from the previous brick
    # (no run starts in-brick): combined with a saturated carry
    # (max t < TRANSMITTANCE_EPS) the kernels skip it exactly — every
    # lane's t_inc <= carry < eps forces keep=0, and the stale carry
    # stays < eps for any later lane of the same run, so propagating it
    # unchanged is exact (long busy runs saturate in ~10-30 pairs while
    # occupancy reaches 500-1000 at production density)
    skippable = ((fr_rs[:, 0] == cont_frs)
                 & (fr_rs[:, BRICK - 1] == cont_frs)).astype(jnp.int32)
    ws0 = w0s[::WSTEP]                                # [ns] step bases
    d8st = jnp.concatenate(
        [ws0[1:] - ws0[:-1], jnp.zeros((1,), jnp.int32)])
    tp = cdiv(T, CARRY) * CARRY + SW
    # grid steps holding at least one REAL pair: the kernels skip the
    # compute body past this (the budget's density-growth headroom)
    kept_total = pbins.s_f[-1]
    nlive = jnp.clip((kept_total + BRICK * WSTEP - 1) // (BRICK * WSTEP),
                     0, nb // WSTEP).astype(jnp.int32)[None]
    return (src, ox, oy, bricks, nlive, w0s, cont_frs, skippable, ws0,
            d8st, tp, valid)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def segpair_render(packed_sorted, pbins: PairBins, origins, basis, sink,
                   cap: int, interpret: bool | None = None):
    """Frame-ordered tile intensities [T,P] from sorted pair tables —
    pair-dense variant (module docstring). Same contract as
    ops.pallas_pair.pair_render: differentiable in ``packed_sorted``;
    ``sink``'s cotangent reports per-Gaussian accumulated |d means2d|
    (absgrad). ``cap`` only documents the binning-side per-tile slot
    filter (the pair stream is already capped); it is not re-applied."""
    img, _ = _seg_fwd_impl(packed_sorted, pbins, origins, basis,
                           interpret)
    return img


def _seg_fwd_impl(packed_sorted, pbins, origins, basis, interpret):
    interpret = _auto_interpret() if interpret is None else interpret
    (src, ox, oy, bricks, nlive, w0s, cont_frs, skippable, ws0, d8st,
     tp, valid) = _prep(packed_sorted, pbins, origins)
    T = pbins.counts_f.shape[0]
    raw = _seg_fwd(bricks, nlive, w0s, cont_frs, skippable, ws0, d8st,
                   basis, tp, interpret)
    # rows of empty tiles are never written (uninitialized HBM): mask by
    # true run length
    img = jnp.where(pbins.counts_f[:, None] > 0, raw[:T], 0.0)
    return img, (src, ox, oy, bricks, nlive, w0s, cont_frs, skippable,
                 ws0, img, valid)


def _sp_fwd(packed_sorted, pbins, origins, basis, sink, cap, interpret):
    img, res = _seg_fwd_impl(packed_sorted, pbins, origins, basis,
                             interpret)
    return img, (packed_sorted.shape[0], pbins, basis, res)


def _sp_bwd(cap, interpret, saved, g):
    n, pbins, basis, res = saved
    (src, ox, oy, bricks, nlive, w0s, cont_frs, skippable, ws0, img,
     valid) = res
    interpret = _auto_interpret() if interpret is None else interpret
    B = pbins.pair_ranks.shape[0]
    T = pbins.counts_f.shape[0]
    tp = cdiv(T, CARRY) * CARRY + SW
    p = basis.shape[1]

    # pre-fold the suffix algebra on the XLA side: per-row cotangent
    # g*(1-total) is all the kernel needs (dalpha = g(1-total)/om for
    # kept lanes) — one [T,P] elementwise op here halves the kernel's
    # window DMA and its one-hot gather product vs shipping g and total
    # as separate planes
    gt = jnp.zeros((tp, p), jnp.float32)
    gt = gt.at[:T].set(g * (1.0 - img))
    dbricks = _seg_bwd(bricks, nlive, w0s, cont_frs, skippable, ws0,
                       basis, gt, interpret)
    dfeats = dbricks.transpose(0, 2, 1).reshape(-1, 8)   # [Bp,8]
    dfeats = jnp.where(valid[:, None], dfeats, 0.0)

    Bp = bricks.shape[0] * BRICK
    _, fvjp = jax.vjp(lambda s: build_pair_features(s, ox, oy), src)
    (dsrc,) = fvjp(dfeats)                            # [Bp,8]
    rows = jnp.concatenate([dsrc, jnp.abs(dsrc[:, 3:5])], axis=-1)
    ranks = pbins.pair_ranks
    if Bp > B:
        ranks = jnp.pad(ranks, (0, Bp - B))
    idx = jnp.where(valid, ranks, n)
    from edgegaussians_tpu.ops.composite import _scatter_rows
    acc = _scatter_rows(idx, rows, n)
    dpacked = acc[:, :8]
    dsink = jnp.zeros((n, 2), dtype=dsrc.dtype).at[pbins.order].set(
        acc[:, 8:10], mode="drop", unique_indices=True)

    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    zero_bins = jax.tree.map(f0, pbins)
    return (dpacked, zero_bins, jnp.zeros((T, 2), jnp.float32),
            jnp.zeros_like(basis), dsink)


segpair_render.defvjp(_sp_fwd, _sp_bwd)
