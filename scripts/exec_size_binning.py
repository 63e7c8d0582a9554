"""Decompose the binning sub-program's executable size (ABC shapes).

Usage: python scripts/exec_size_binning.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from edgegaussians_tpu.ops import tiles as tiles_mod
from edgegaussians_tpu.ops.projection import project_gaussians

N = 16384
W = H = 800
TILE = 16
K1 = 128
K2 = 640
T2 = 256
M = 16


def exec_size(lowered, label):
    compiled = lowered.compile()
    try:
        size = len(compiled.runtime_executable().serialize())
    except Exception:
        size = -1
    print(f"{label:52s} exec={size/1e6:8.1f} MB")


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
    proj = jax.block_until_ready(proj)

    sp = jax.jit(lambda p: tiles_mod._sort_pairs(p, W, H, TILE, M))
    exec_size(sp.lower(proj), "_sort_pairs (expand+sort+searchsorted)")

    skeys, starts, counts, order, _ = sp(proj)
    skeys = jax.block_until_ready(skeys)

    ntx, nty, num_tiles = tiles_mod.tile_grid(W, H, TILE)
    boundaries = jnp.arange(num_tiles + 1, dtype=jnp.int32) << \
        tiles_mod.RANK_BITS
    ss = jax.jit(lambda k: jnp.searchsorted(k, boundaries))
    exec_size(ss.lower(skeys), "searchsorted T+1 boundaries")

    kk1 = jnp.arange(K1, dtype=jnp.int32)[None, :]
    dec = jax.jit(lambda sk, st: tiles_mod._decode_ranks(
        sk, st[:-1, None] + kk1, N))
    exec_size(dec.lower(skeys, starts), "decode ranks [T,128]")

    tk = jax.jit(lambda c: jax.lax.top_k(c, T2))
    exec_size(tk.lower(counts), "top_k(counts, 256)")

    full = jax.jit(lambda p: tiles_mod.bin_gaussians_two_level(
        p, W, H, TILE, K1, K2, T2, max_tiles_per_gaussian=M))
    exec_size(full.lower(proj), "bin_gaussians_two_level TOTAL")


if __name__ == "__main__":
    main()
