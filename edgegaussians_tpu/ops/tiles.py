"""Tile binning and screen-space feature construction.

The production rasterizer decomposes the image into ``ts x ts`` pixel tiles
(reference BLOCK_WIDTH=16 — edge_gs.py:233,260) and, per tile, composites a
fixed-capacity, depth-ordered list of intersecting Gaussians. On TPU the
variable-length per-tile lists of the CUDA design become static-shape
``[T, K]`` index arrays built with sort + prefix-sum + batched binary search —
no scatters, no dynamic shapes, fully jit-safe.

The pixel-evaluation is phrased as a matmul: for conic (a,b,c), center
(mx,my) in TILE-LOCAL pixel coordinates and log-opacity lo,

    log alpha(px,py) = G . [px^2, px*py, py^2, px, py, 1, 0, 0]

with G = [-a/2, -b, -c/2, a*mx+b*my, b*mx+c*my,
          -(a*mx^2 + 2b*mx*my + c*my^2)/2 + lo, 0, 0].

This maps the hot per-(Gaussian, pixel) evaluation onto the MXU as a
``[K,8] @ [8,P]`` product, and tile-local coordinates keep the quadratic
terms small so f32 loses no precision to cancellation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from edgegaussians_tpu.ops.projection import ProjectedGaussians

NUM_FEATURES = 8   # 6 used + 2 pad to an MXU-friendly lane count


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


class TileBins(NamedTuple):
    """Depth-ordered per-tile Gaussian lists (static shapes)."""
    indices: jnp.ndarray   # [T,K] int32 gaussian ids (depth-ascending; clipped)
    valid: jnp.ndarray     # [T,K] bool
    counts: jnp.ndarray    # [T] int32 true number of intersecting Gaussians


def tile_grid(width: int, height: int, tile_size: int):
    """(tiles_x, tiles_y, num_tiles)."""
    ntx, nty = cdiv(width, tile_size), cdiv(height, tile_size)
    return ntx, nty, ntx * nty


@functools.partial(jax.jit, static_argnames=(
    "width", "height", "tile_size", "capacity", "chunk"))
def bin_gaussians(proj: ProjectedGaussians, width: int, height: int,
                  tile_size: int, capacity: int, chunk: int = 256) -> TileBins:
    """Build depth-ordered fixed-capacity per-tile Gaussian lists.

    Matches the CUDA rasterizer's binning rule (square 3-sigma bounding box
    against the tile rectangle; tiles in [floor((m-r)/ts), ceil((m+r)/ts))),
    but as a dense tile x Gaussian membership test processed in tile chunks.
    Tiles whose membership exceeds ``capacity`` keep the nearest ``capacity``
    Gaussians (report via ``counts``).
    """
    n = proj.depths.shape[0]
    ntx, nty, num_tiles = tile_grid(width, height, tile_size)
    capacity = min(capacity, n) if n > 0 else capacity

    # global depth-ascending order, invalid entries last
    order = jnp.argsort(jnp.where(proj.valid, proj.depths, jnp.inf))
    m2d = proj.means2d[order]
    radii = proj.radii[order].astype(jnp.float32)
    valid = proj.valid[order]

    inv_ts = 1.0 / tile_size
    tx0 = jnp.floor((m2d[:, 0] - radii) * inv_ts).astype(jnp.int32)
    tx1 = jnp.ceil((m2d[:, 0] + radii) * inv_ts).astype(jnp.int32)
    ty0 = jnp.floor((m2d[:, 1] - radii) * inv_ts).astype(jnp.int32)
    ty1 = jnp.ceil((m2d[:, 1] + radii) * inv_ts).astype(jnp.int32)

    num_chunks = cdiv(num_tiles, chunk)
    padded_tiles = num_chunks * chunk
    tile_ids = jnp.arange(padded_tiles, dtype=jnp.int32).reshape(
        num_chunks, chunk)
    ks = jnp.arange(1, capacity + 1, dtype=jnp.int32)

    def chunk_fn(tids):
        tx = tids % ntx
        ty = tids // ntx
        member = (valid[None, :]
                  & (tx[:, None] >= tx0[None, :]) & (tx[:, None] < tx1[None, :])
                  & (ty[:, None] >= ty0[None, :]) & (ty[:, None] < ty1[None, :]))
        prefix = jnp.cumsum(member.astype(jnp.int32), axis=1)     # [C,N]
        counts = prefix[:, -1]
        # position of the k-th member = first index where the prefix reaches k
        pos = jax.vmap(lambda row: jnp.searchsorted(row, ks, side="left"))(
            prefix)                                               # [C,K]
        slot_valid = ks[None, :] <= counts[:, None]
        idx = order[jnp.clip(pos, 0, max(n - 1, 0))]
        return idx.astype(jnp.int32), slot_valid, counts

    idx, slot_valid, counts = jax.lax.map(chunk_fn, tile_ids)
    return TileBins(
        indices=idx.reshape(padded_tiles, capacity)[:num_tiles],
        valid=slot_valid.reshape(padded_tiles, capacity)[:num_tiles],
        counts=counts.reshape(padded_tiles)[:num_tiles])


def tile_origins(width: int, height: int, tile_size: int) -> jnp.ndarray:
    """[T,2] pixel coordinates of each tile's top-left corner."""
    ntx, nty, _ = tile_grid(width, height, tile_size)
    t = jnp.arange(ntx * nty, dtype=jnp.int32)
    return jnp.stack([(t % ntx) * tile_size, (t // ntx) * tile_size],
                     axis=-1).astype(jnp.float32)


def pixel_basis(tile_size: int) -> jnp.ndarray:
    """[NUM_FEATURES, P] per-pixel monomial basis in tile-local coordinates.

    Pixel centers at (col + 0.5, row + 0.5), row-major flattening.
    """
    r = jnp.arange(tile_size, dtype=jnp.float32)
    py, px = jnp.meshgrid(r + 0.5, r + 0.5, indexing="ij")
    px = px.reshape(-1)
    py = py.reshape(-1)
    zeros = jnp.zeros_like(px)
    return jnp.stack([px * px, px * py, py * py, px, py,
                      jnp.ones_like(px), zeros, zeros], axis=0)


def build_tile_features(means2d_g: jnp.ndarray,    # [T,K,2] gathered centers
                        conics_g: jnp.ndarray,     # [T,K,3]
                        logop_g: jnp.ndarray,      # [T,K] log effective opacity
                        origins: jnp.ndarray,      # [T,2]
                        validf: jnp.ndarray,       # [T,K] 0/1 slot validity
                        ) -> jnp.ndarray:
    """Per-(tile, Gaussian) matmul features G (see module docstring).

    Slot layout: [0..4] = quadratic/linear conic terms, [5] = constant term
    (center quadform + log opacity; forced to -1e30 for invalid slots so
    their alpha underflows to exactly 0 and no masking is needed downstream),
    [6] = log opacity against a zero basis row (extracted inside the
    compositor for the sigma>=0 numerical guard), [7] = padding.
    """
    mx = means2d_g[..., 0] - origins[:, None, 0]
    my = means2d_g[..., 1] - origins[:, None, 1]
    a = conics_g[..., 0]
    b = conics_g[..., 1]
    c = conics_g[..., 2]
    amx_bmy = a * mx + b * my
    bmx_cmy = b * mx + c * my
    const = -(0.5) * (amx_bmy * mx + bmx_cmy * my) + logop_g
    const = jnp.where(validf > 0, const, -1e30)
    zeros = jnp.zeros_like(mx)
    return jnp.stack([-0.5 * a, -b, -0.5 * c, amx_bmy, bmx_cmy, const,
                      logop_g, zeros], axis=-1)


def assemble_image(tile_images: jnp.ndarray, width: int, height: int,
                   tile_size: int) -> jnp.ndarray:
    """[T,P] tile pixels -> [H,W] image (cropping any right/bottom padding)."""
    ntx, nty, _ = tile_grid(width, height, tile_size)
    img = tile_images.reshape(nty, ntx, tile_size, tile_size)
    img = img.transpose(0, 2, 1, 3).reshape(nty * tile_size, ntx * tile_size)
    return img[:height, :width]
