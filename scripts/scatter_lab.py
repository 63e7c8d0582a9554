"""Scatter lab: measure backward-scatter variants on bench shapes.

The fused dpacked+absgrad scatter is the most expensive single op in the
backward (RESULTS.md). XLA's scatter costs ~constant per ROW regardless of
row width, so the levers are row COUNT and memory layout. Variants:

  A  current: concat L1+L2 frames -> one .at[idx].add of T*k1+t2*k2 rows
  B  two separate scatters (L1, L2)
  C  8-col rows (no absgrad columns) -- column-width sensitivity
  D  16-col rows (pad 10 -> 16)      -- lane-alignment sensitivity
  E  L2 frame compacted via bin-time indices (valid slots only), then
     one scatter of T*k1 + P2cap rows
  F  both frames compacted to P1cap+P2cap rows
  G  sort(idx)+segment_sum instead of scatter

Usage: python scripts/scatter_lab.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from edgegaussians_tpu.ops import tiles as tiles_mod
from edgegaussians_tpu.ops.projection import project_gaussians
from edgegaussians_tpu.ops.tiles import bin_gaussians_two_level

N = 20000
W = H = 800
TILE = 16
K1 = 128
K2 = 384
T2 = 625
M = 64


def timed(fn, *args, iters=30, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:52s} {dt:8.3f} ms")
    return out, dt


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
        proj, W, H, TILE, K1, K2, T2, max_tiles_per_gaussian=M))()
    bins2 = jax.block_until_ready(bins2)
    T = bins2.ranks1.shape[0]
    print(f"T={T} K1={K1} t2={T2} K2={K2} rows={T*K1 + T2*K2} "
          f"counts1_sum={int(jnp.sum(bins2.counts1))} "
          f"counts2_sum={int(jnp.sum(bins2.counts2))}")

    dg1 = jnp.asarray(r.normal(size=(T, K1, 8)), jnp.float32)
    dg2 = jnp.asarray(r.normal(size=(T2, K2, 8)), jnp.float32)
    ranks1 = bins2.ranks1
    ranks2 = bins2.ranks2

    # --- A: current fused scatter
    @jax.jit
    def var_a(dg1, dg2):
        c1 = jnp.abs(dg1[..., 3:5])
        c2 = jnp.abs(dg2[..., 3:5])
        rows = jnp.concatenate([
            jnp.concatenate([dg1, c1], axis=-1).reshape(-1, 10),
            jnp.concatenate([dg2, c2], axis=-1).reshape(-1, 10)], axis=0)
        idx = jnp.concatenate([ranks1.reshape(-1), ranks2.reshape(-1)])
        return jnp.zeros((N, 10), jnp.float32).at[idx].add(rows, mode="drop")

    acc_a, _ = timed(var_a, dg1, dg2, label="A current fused 10-col scatter")

    # --- B: two scatters
    @jax.jit
    def var_b(dg1, dg2):
        c1 = jnp.abs(dg1[..., 3:5])
        c2 = jnp.abs(dg2[..., 3:5])
        a = jnp.zeros((N, 10), jnp.float32).at[ranks1.reshape(-1)].add(
            jnp.concatenate([dg1, c1], axis=-1).reshape(-1, 10), mode="drop")
        return a.at[ranks2.reshape(-1)].add(
            jnp.concatenate([dg2, c2], axis=-1).reshape(-1, 10), mode="drop")

    timed(var_b, dg1, dg2, label="B two separate scatters")

    # --- C: 8 columns
    @jax.jit
    def var_c(dg1, dg2):
        rows = jnp.concatenate([dg1.reshape(-1, 8), dg2.reshape(-1, 8)])
        idx = jnp.concatenate([ranks1.reshape(-1), ranks2.reshape(-1)])
        return jnp.zeros((N, 8), jnp.float32).at[idx].add(rows, mode="drop")

    timed(var_c, dg1, dg2, label="C 8-col scatter")

    # --- D: 16 columns
    @jax.jit
    def var_d(dg1, dg2):
        c1 = jnp.abs(dg1[..., 3:5])
        c2 = jnp.abs(dg2[..., 3:5])
        z1 = jnp.zeros(dg1.shape[:-1] + (6,), jnp.float32)
        z2 = jnp.zeros(dg2.shape[:-1] + (6,), jnp.float32)
        rows = jnp.concatenate([
            jnp.concatenate([dg1, c1, z1], axis=-1).reshape(-1, 16),
            jnp.concatenate([dg2, c2, z2], axis=-1).reshape(-1, 16)], axis=0)
        idx = jnp.concatenate([ranks1.reshape(-1), ranks2.reshape(-1)])
        return jnp.zeros((N, 16), jnp.float32).at[idx].add(rows, mode="drop")

    timed(var_d, dg1, dg2, label="D 16-col scatter")

    # --- E: compact L2 valid slots at bin time, scatter T*k1 + P2cap rows
    p2cap = 32768
    c2sum = jnp.cumsum(bins2.counts2)
    # comp_src[j] = flat index into [t2*K2] of the j-th valid overflow slot
    jj = jnp.arange(p2cap, dtype=jnp.int32)
    tile_of = jnp.searchsorted(c2sum, jj, side="right").astype(jnp.int32)
    tile_of = jnp.minimum(tile_of, T2 - 1)
    base = jnp.where(tile_of > 0, c2sum[jnp.maximum(tile_of - 1, 0)], 0)
    slot = jj - base
    comp_src = tile_of * K2 + slot
    comp_valid = jj < c2sum[-1]
    comp_src = jnp.where(comp_valid, comp_src, 0)
    idx2c = jnp.where(comp_valid, ranks2.reshape(-1)[comp_src],
                      jnp.int32(N))  # drop row

    @jax.jit
    def var_e(dg1, dg2):
        c1 = jnp.abs(dg1[..., 3:5])
        rows2 = dg2.reshape(-1, 8)[comp_src]
        c2 = jnp.abs(rows2[:, 3:5])
        rows = jnp.concatenate([
            jnp.concatenate([dg1, c1], axis=-1).reshape(-1, 10),
            jnp.concatenate([rows2, c2], axis=-1)], axis=0)
        idx = jnp.concatenate([ranks1.reshape(-1), idx2c])
        return jnp.zeros((N, 10), jnp.float32).at[idx].add(rows, mode="drop")

    acc_e, _ = timed(var_e, dg1, dg2,
                     label=f"E L2 compacted ({T*K1}+{p2cap} rows)")
    # correctness vs A on valid slots (invalid dg2 slots still scattered by
    # A but they are meant to be masked upstream; emulate by zeroing them)
    kk2 = jnp.arange(K2, dtype=jnp.int32)[None, :]
    v2 = (kk2 < bins2.counts2[:, None]).astype(jnp.float32)[..., None]
    acc_a_masked = var_a(dg1, dg2 * v2)
    acc_e_masked = var_e(dg1, dg2 * v2)
    err = jnp.max(jnp.abs(acc_a_masked - acc_e_masked))
    print(f"   E vs A (masked) max err: {err:.2e}")

    # --- F: both frames compacted
    p1cap = 262144
    c1sum = jnp.cumsum(bins2.counts1)
    jj1 = jnp.arange(p1cap, dtype=jnp.int32)
    tof1 = jnp.searchsorted(c1sum, jj1, side="right").astype(jnp.int32)
    tof1 = jnp.minimum(tof1, T - 1)
    base1 = jnp.where(tof1 > 0, c1sum[jnp.maximum(tof1 - 1, 0)], 0)
    comp_src1 = tof1 * K1 + (jj1 - base1)
    v1 = jj1 < c1sum[-1]
    comp_src1 = jnp.where(v1, comp_src1, 0)
    idx1c = jnp.where(v1, ranks1.reshape(-1)[comp_src1], jnp.int32(N))

    @jax.jit
    def var_f(dg1, dg2):
        rows1 = dg1.reshape(-1, 8)[comp_src1]
        rows2 = dg2.reshape(-1, 8)[comp_src]
        rows = jnp.concatenate([
            jnp.concatenate([rows1, jnp.abs(rows1[:, 3:5])], axis=-1),
            jnp.concatenate([rows2, jnp.abs(rows2[:, 3:5])], axis=-1)])
        idx = jnp.concatenate([idx1c, idx2c])
        return jnp.zeros((N, 10), jnp.float32).at[idx].add(rows, mode="drop")

    timed(var_f, dg1, dg2, label=f"F both compacted ({p1cap}+{p2cap} rows)")

    # --- G: sort + segment_sum
    @jax.jit
    def var_g(dg1, dg2):
        c1 = jnp.abs(dg1[..., 3:5])
        c2 = jnp.abs(dg2[..., 3:5])
        rows = jnp.concatenate([
            jnp.concatenate([dg1, c1], axis=-1).reshape(-1, 10),
            jnp.concatenate([dg2, c2], axis=-1).reshape(-1, 10)], axis=0)
        idx = jnp.concatenate([ranks1.reshape(-1), ranks2.reshape(-1)])
        sidx, perm = jax.lax.sort_key_val(idx, jnp.arange(idx.shape[0],
                                                          dtype=jnp.int32))
        srows = rows[perm]
        return jax.ops.segment_sum(srows, sidx, num_segments=N)

    timed(var_g, dg1, dg2, label="G sort+permute+segment_sum")


if __name__ == "__main__":
    main()
