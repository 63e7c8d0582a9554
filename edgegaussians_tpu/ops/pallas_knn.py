"""Pallas TPU kernel for exact brute-force kNN with zero HBM spill.

The XLA path (ops/knn.py) materializes the [chunk, N] squared-distance
matrix to HBM and reads it back through top_k — ~2·N²·4 bytes of traffic
(2.1 GB at the 16384-capacity ABC shape, ~3.5-4 ms measured on v5e). This
kernel streams key blocks through VMEM and never writes a distance to
HBM: per (query-block, key-block) it computes d² on the fly and folds the
block's k best into a running candidate set with an index-packed integer
min-reduce.

Selection trick: for non-negative f32, the IEEE bit pattern is
monotonic, so ``bitcast(d², int32)`` orders like d². Clearing the low 11
bits and packing the lane index there gives a single int32 whose
*min-reduce* yields both the smallest distance and its lane — one pass
per candidate instead of separate min + argmin passes. The low-bit
clearing perturbs the selection metric by ≤ 2⁻¹¹ relative, i.e. ties
among near-equidistant neighbors may break differently than exact sort
order — immaterial for the direction loss (the reference tolerates
sklearn tie order, edge_gs.py:135-151) — and the *returned* distances
are recomputed exactly for the selected indices.

Layout notes (Mosaic): points are carried as [3, N] so the large axis is
the 128-lane dimension (a [N, 3] VMEM block would pad 3 -> 128 lanes and
blow VMEM at 131k capacity); all reductions keep dims; candidate-list
updates use column-iota `where` blends (dynamic lane slicing must be
128-aligned, so no `.at[:, j]`).

Replaces: sklearn NearestNeighbors round trip (reference
edge_gs.py:135-151, SURVEY §2.1) on the training hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

IDX_BITS = 11                       # lane index bits packed into d2 low bits
KB = 1 << IDX_BITS                  # key-block size (2048)
BIG_F32 = 3.0e38
SENTINEL = 3.4e38                   # empty candidate slot


def _auto_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _knn_kernel(pts_ref, maskbig_ref, out_d_ref, out_i_ref, *,
                k: int, qb: int, n_pad: int, kp: int):
    """One query block [qb] against every key block [KB].

    pts_ref: [3, n_pad] f32; maskbig_ref: [1, n_pad] (0 alive / BIG dead).
    """
    qi = pl.program_id(0)
    q0 = qi * qb
    nb = n_pad // KB
    low_mask = jnp.int32(KB - 1)
    big_i32 = jnp.int32(0x7F800000)   # +inf bits > any packed finite d2

    # query coordinates as [qb, 1] columns (3 tiny transposes, once)
    qc = [jnp.transpose(pts_ref[c:c + 1, pl.ds(q0, qb)]) for c in range(3)]

    lane = jax.lax.broadcasted_iota(jnp.int32, (qb, KB), 1)
    qrow = q0 + jax.lax.broadcasted_iota(jnp.int32, (qb, KB), 0)
    colk = jax.lax.broadcasted_iota(jnp.int32, (qb, kp), 1)
    col2k = jax.lax.broadcasted_iota(jnp.int32, (qb, 2 * kp), 1)

    def block(b, carry):
        best_d, best_i = carry                        # [qb, kp] f32 / i32
        b0 = b * KB
        d2 = jnp.zeros((qb, KB), jnp.float32)
        for c in range(3):
            kc = pts_ref[c:c + 1, pl.ds(b0, KB)]      # [1, KB]
            diff = qc[c] - kc                         # [qb, KB]
            d2 = d2 + diff * diff
        d2 = d2 + maskbig_ref[:, pl.ds(b0, KB)]       # dead keys -> BIG
        gkey = b0 + lane
        d2 = jnp.where(gkey == qrow, jnp.float32(BIG_F32), d2)
        packed = jax.lax.bitcast_convert_type(d2, jnp.int32)
        packed = jax.lax.bitwise_or(
            jax.lax.bitwise_and(packed, ~low_mask), lane)

        # the block's k smallest via k index-packed min-reduces
        cd = jnp.full((qb, kp), SENTINEL, jnp.float32)
        ci = jnp.zeros((qb, kp), jnp.int32)
        for j in range(k):
            m = jnp.min(packed, axis=1, keepdims=True)     # [qb,1]
            sel_lane = jax.lax.bitwise_and(m, low_mask)
            dist = jax.lax.bitcast_convert_type(
                jax.lax.bitwise_and(m, ~low_mask), jnp.float32)
            cd = jnp.where(colk == j, dist, cd)
            ci = jnp.where(colk == j, b0 + sel_lane, ci)
            packed = jnp.where(lane == sel_lane, big_i32, packed)

        # merge into the running best: k selections over 2*kp lanes
        md = jnp.concatenate([best_d, cd], axis=1)    # [qb, 2kp]
        mi = jnp.concatenate([best_i, ci], axis=1)
        nd = jnp.full((qb, kp), SENTINEL, jnp.float32)
        ni = jnp.zeros((qb, kp), jnp.int32)
        for j in range(k):
            m = jnp.min(md, axis=1, keepdims=True)
            first = jnp.min(jnp.where(md == m, col2k, 2 * kp),
                            axis=1, keepdims=True)
            sel = col2k == first
            idx = jnp.max(jnp.where(sel, mi, 0), axis=1, keepdims=True)
            nd = jnp.where(colk == j, m, nd)
            ni = jnp.where(colk == j, idx, ni)
            md = jnp.where(sel, jnp.float32(SENTINEL), md)
        return nd, ni

    best_d0 = jnp.full((qb, kp), SENTINEL, jnp.float32)
    best_i0 = jnp.zeros((qb, kp), jnp.int32)
    best_d, best_i = jax.lax.fori_loop(0, nb, block, (best_d0, best_i0))
    out_d_ref[:] = best_d
    out_i_ref[:] = best_i


@functools.partial(jax.jit, static_argnames=("k", "qb", "interpret"))
def knn_pallas(points: jnp.ndarray,          # [N,3]
               k: int,
               mask: jnp.ndarray | None = None,
               qb: int = 256,
               interpret: bool | None = None):
    """Exact k nearest neighbors (self excluded) — ops.knn.knn contract.

    Returns (distances [N,k], indices [N,k]), neighbors ordered ascending
    by the 11-mantissa-bit-cleared packed selection metric — i.e.
    ascending up to ties within 2⁻¹¹ relative distance, where the exact
    recomputed distances returned may be slightly non-monotonic across
    slots. The selected SET matches exact kNN to the same tie window.
    Rows with fewer than k alive neighbors carry f32-max distances in the
    dry slots, like ops.knn.knn.
    """
    if interpret is None:
        interpret = _auto_interpret()
    n = points.shape[0]
    if k > 8:
        raise ValueError(f"knn_pallas supports k <= 8, got {k}")
    kp = 8
    pts = jnp.nan_to_num(points.astype(jnp.float32))
    if mask is None:
        mask = jnp.ones((n,), bool)

    n_pad = int(-(-n // KB) * KB)
    qb = min(qb, n_pad)
    pts_p = jnp.pad(pts, ((0, n_pad - n), (0, 0)))
    pts_t = jnp.transpose(pts_p)                             # [3, n_pad]
    valid = jnp.pad(mask, (0, n_pad - n))
    maskbig = jnp.where(valid, 0.0, jnp.float32(BIG_F32))[None, :]

    out_d, out_i = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, qb=qb, n_pad=n_pad, kp=kp),
        out_shape=(jax.ShapeDtypeStruct((n_pad, kp), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, kp), jnp.int32)),
        grid=(n_pad // qb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((qb, kp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((qb, kp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(pts_t, maskbig)

    idx = out_i[:n, :k]
    # exact distances for the selected indices (the packed metric cleared
    # 11 low bits)
    nbr = pts[jnp.clip(idx, 0, n - 1)]
    d = jnp.sqrt(jnp.maximum(
        jnp.sum((pts[:, None, :] - nbr) ** 2, axis=-1), 0.0))
    dry = out_d[:n, :k] >= jnp.float32(2.9e38)
    d = jnp.where(dry, jnp.float32(np.finfo(np.float32).max), d)
    return d, idx
