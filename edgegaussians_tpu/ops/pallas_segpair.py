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
  carried across bricks in scratch (the sequential grid makes exactly
  one run open at a brick boundary),
- per-brick tile images are a one-hot segment-sum matmul
  ``M[row, lane] @ contrib[lane, px]`` onto the MXU; the window of
  [WR, P] image rows is DMA'd to HBM at the brick's 8-aligned base row
  (Mosaic requires provably 8-divisible dynamic row offsets —
  ``pl.multiple_of``; probed in scripts/segpair_mosaic_probe.py). An
  8-row image carry block hands partially-accumulated rows to the next
  brick, whose window rewrites them — later writes win, so every row's
  final value is complete,
- the backward needs NO windowed output at all: each pair's gradient
  row lives in exactly one brick, so dbricks is a plain blocked output
  (the v4 backward's overlapping window write-backs disappear). Its
  per-lane loss cotangent/total come from the transposed one-hot
  product against a [WR, 2P] g/total window DMA'd per brick.

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

BRICK = 128     # pairs per brick (= lane-roll scan width)
CARRY = 8       # image rows handed across bricks (sublane tiling unit)
WR = BRICK + CARRY   # output window rows: 8-aligned base + max row span


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


def _seg_scan(x, dcol, op, unit):
    """Segmented inclusive Hillis-Steele scan along axis 0 (pairs).

    Shift s applies at lane l iff l-s is in-brick AND in the same run
    (s <= depth slot dcol[l]); out-of-run positions contribute ``unit``.
    Runs opening before the brick accumulate from lane 0 — the caller
    folds the cross-brick carry in separately.
    """
    srow = jax.lax.broadcasted_iota(jnp.int32, (BRICK, 1), 0)
    s = 1
    while s < BRICK:
        use = (srow >= s) & (dcol >= jnp.float32(s))
        x = op(x, jnp.where(use, pltpu.roll(x, s, axis=0), unit))
        s *= 2
    return x


def _onehot(rrow, base, rows):
    """[rows, BRICK] f32 one-hot: M[r, l] = (rrow[l] - base == r)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, BRICK), 0)
    return (ri.astype(jnp.float32) + base == rrow).astype(jnp.float32)


def _seg_matmul(m, v):
    """One-hot segment contraction on the MXU ([A,BRICK] x [B?,..])."""
    return jax.lax.dot_general(
        m, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


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


def _fwd_kernel(w0s_ref, cont_ref, d8s_ref, brick_ref, basis_ref,
                out_hbm, seg, carry8, tcar, sem, *, p):
    b = pl.program_id(0)

    def seg_dma(idx):
        off = pl.multiple_of(w0s_ref[idx], CARRY)
        return pltpu.make_async_copy(seg, out_hbm.at[pl.ds(off, WR)], sem)

    @pl.when(b == 0)
    def _():
        carry8[:] = jnp.zeros_like(carry8)
        tcar[:] = jnp.ones_like(tcar)

    basis = basis_ref[:]                              # [8,P]
    alpha, _, om, t_within, cont, _, rraw = _brick_common(
        brick_ref[0], basis, cont_ref[b])
    t_inc = t_within * jnp.where(cont, tcar[0:1, :], 1.0)
    keep = (t_inc >= TRANSMITTANCE_EPS).astype(jnp.float32)
    contrib = alpha * (t_inc / om) * keep             # [BRICK,P]

    w0f = w0s_ref[b].astype(jnp.float32)
    rrow = rraw - w0f                                 # [1,BRICK] window rows
    segv = _seg_matmul(_onehot(rrow, 0.0, WR), contrib)
    # the previous window write must land before seg is rebuilt (windows
    # overlap; sequential completion is what makes later-write-wins exact)
    @pl.when(b > 0)
    def _():
        seg_dma(b - 1).wait()
    seg[:] = segv
    # rows [w0, w0+8) may hold earlier bricks' accumulation (rows above
    # the first lane's tile cannot — contributions are monotone in row)
    seg[0:CARRY] = seg[0:CARRY] + carry8[:]
    # hand the next brick ITS first-group rows [w0', w0'+8): this brick's
    # contributions there, plus the current value when the group doesn't
    # advance (d8 == 0)
    d8 = d8s_ref[b]
    new_c8 = _seg_matmul(_onehot(rrow, d8.astype(jnp.float32), CARRY),
                         contrib)
    carry8[:] = new_c8 + jnp.where(d8 == 0, carry8[:], 0.0)
    tcar[0:1, :] = t_inc[BRICK - 1:BRICK, :]

    seg_dma(b).start()

    @pl.when(b + 1 == pl.num_programs(0))
    def _():
        seg_dma(b).wait()


def _bwd_kernel(w0s_ref, cont_ref, brick_ref, basis_ref, gt_hbm,
                dout_ref, gtwin, tcar, ccar, sem, *, p):
    b = pl.program_id(0)

    def gt_dma(idx):
        off = pl.multiple_of(w0s_ref[idx], CARRY)
        return pltpu.make_async_copy(gt_hbm.at[pl.ds(off, WR)], gtwin, sem)

    @pl.when(b == 0)
    def _():
        tcar[:] = jnp.ones_like(tcar)
        ccar[:] = jnp.zeros_like(ccar)
        gt_dma(0).start()

    basis = basis_ref[:]
    alpha, ok, om, t_within, cont, dcol, rraw = _brick_common(
        brick_ref[0], basis, cont_ref[b])
    t_inc = t_within * jnp.where(cont, tcar[0:1, :], 1.0)
    keep = (t_inc >= TRANSMITTANCE_EPS).astype(jnp.float32)
    t_prev = t_inc / om
    contrib = alpha * t_prev * keep
    c_inc = _seg_scan(contrib, dcol, jax.lax.add, 0.0) \
        + jnp.where(cont, ccar[0:1, :], 0.0)

    rrow = rraw - w0s_ref[b].astype(jnp.float32)
    m = _onehot(rrow, 0.0, WR)                        # [WR,BRICK]
    gt_dma(b).wait()
    gw = gtwin[:, :p]
    tw = gtwin[:, p:]
    # transposed one-hot products: per-lane loss cotangent / tile total
    g_lane = jax.lax.dot_general(
        m, gw, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)          # [BRICK,P]
    total_lane = jax.lax.dot_general(
        m, tw, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    # prefetch the next brick's g/total window (gtwin consumed above)
    @pl.when(b + 1 < pl.num_programs(0))
    def _():
        gt_dma(b + 1).start()

    suffix = total_lane - c_inc
    dalpha = (t_prev - suffix / om) * keep * g_lane
    dla = jnp.where(ok & (alpha < ALPHA_CLAMP), alpha * dalpha, 0.0)
    dfc = jax.lax.dot_general(
        dla, basis, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)          # [BRICK,8]
    dout_ref[0] = jnp.swapaxes(dfc, 0, 1)             # [8,BRICK]

    tcar[0:1, :] = t_inc[BRICK - 1:BRICK, :]
    ccar[0:1, :] = c_inc[BRICK - 1:BRICK, :]


@functools.partial(jax.jit, static_argnames=("tp", "interpret"))
def _seg_fwd(bricks, w0s, cont_frs, d8s, basis, tp: int, interpret: bool):
    nb = bricks.shape[0]
    p = basis.shape[1]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, p=p),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 16, BRICK), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, p), lambda b, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((WR, p), jnp.float32),
                pltpu.VMEM((CARRY, p), jnp.float32),
                pltpu.VMEM((CARRY, p), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=vma.out_struct((tp, p), jnp.float32, bricks, w0s,
                                 cont_frs, d8s),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * BRICK * p * (8 + WR + CARRY),
            bytes_accessed=nb * (16 * BRICK + WR * p) * 4,
            transcendentals=nb * BRICK * p),
        interpret=interpret,
    )(w0s, cont_frs, d8s, bricks, basis)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _seg_bwd(bricks, w0s, cont_frs, basis, gt, interpret: bool):
    nb = bricks.shape[0]
    p = basis.shape[1]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, p=p),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 16, BRICK), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, p), lambda b, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec((1, 8, BRICK), lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((WR, 2 * p), jnp.float32),
                pltpu.VMEM((CARRY, p), jnp.float32),
                pltpu.VMEM((CARRY, p), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=vma.out_struct((nb, 8, BRICK), jnp.float32, bricks, w0s,
                                 cont_frs, gt),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * BRICK * p * (16 + 2 * WR + 8),
            bytes_accessed=nb * (16 * BRICK + 8 * BRICK + WR * 2 * p) * 4,
            transcendentals=nb * BRICK * p),
        interpret=interpret,
    )(w0s, cont_frs, bricks, basis, gt)


def _prep(packed_sorted, pbins: PairBins, origins):
    """XLA-side prep: pair features + per-pair row/slot channels ->
    [nb,16,BRICK] bricks and the per-brick scalar tables."""
    B = pbins.pair_ranks.shape[0]
    T = pbins.counts_f.shape[0]
    nb = cdiv(B, BRICK)
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
    fr = jnp.where(valid, fr, T)       # garbage rows park past the image
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
    d8s = jnp.concatenate(
        [w0s[1:] - w0s[:-1], jnp.zeros((1,), jnp.int32)])
    tp = cdiv(T, CARRY) * CARRY + WR
    return src, ox, oy, bricks, w0s, cont_frs, d8s, tp, valid


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
    (src, ox, oy, bricks, w0s, cont_frs, d8s, tp,
     valid) = _prep(packed_sorted, pbins, origins)
    T = pbins.counts_f.shape[0]
    raw = _seg_fwd(bricks, w0s, cont_frs, d8s, basis, tp, interpret)
    # rows of empty tiles are never written (uninitialized HBM): mask by
    # true run length
    img = jnp.where(pbins.counts_f[:, None] > 0, raw[:T], 0.0)
    return img, (src, ox, oy, bricks, w0s, cont_frs, img, valid)


def _sp_fwd(packed_sorted, pbins, origins, basis, sink, cap, interpret):
    img, res = _seg_fwd_impl(packed_sorted, pbins, origins, basis,
                             interpret)
    return img, (packed_sorted.shape[0], pbins, basis, res)


def _sp_bwd(cap, interpret, saved, g):
    n, pbins, basis, res = saved
    (src, ox, oy, bricks, w0s, cont_frs, img, valid) = res
    interpret = _auto_interpret() if interpret is None else interpret
    B = pbins.pair_ranks.shape[0]
    T = pbins.counts_f.shape[0]
    tp = cdiv(T, CARRY) * CARRY + WR
    p = basis.shape[1]

    gt = jnp.zeros((tp, 2 * p), jnp.float32)
    gt = gt.at[:T, :p].set(g).at[:T, p:].set(img)
    dbricks = _seg_bwd(bricks, w0s, cont_frs, basis, gt, interpret)
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
