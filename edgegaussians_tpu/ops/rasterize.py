"""Differentiable tile-based Gaussian rasterization (the L0 replacement).

TPU-native re-design of the external gsplat CUDA rasterizer the reference
depends on (call site: edgegaussians/models/edge_gs.py:250-268). One call
renders one camera's edge-intensity image and backpropagates to means /
quats / scales / opacities, with the gsplat 'antialiased' opacity
compensation and absgrad signal.

Pipeline (all static shapes, jit-safe):

    project (JAX, autodiff)  ->  bin (sort + prefix sums, stop-grad)
    -> gather per-tile data  ->  composite (custom VJP; Pallas or XLA)
    -> assemble [H, W]

Colors are implicitly all-ones (edge_gs.py:247): the rendered intensity is
the accumulated alpha, so 'rgb' and 'accumulation' outputs coincide.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from edgegaussians_tpu.ops import tiles as tiles_mod
from edgegaussians_tpu.ops.composite import (tile_render, tile_render_two_level)
from edgegaussians_tpu.ops.projection import project_gaussians
from edgegaussians_tpu.ops.tiles import (
    assemble_image, bin_gaussians, pixel_basis, tile_origins)


class RenderResult(NamedTuple):
    image: jnp.ndarray          # [H,W] edge intensity in [0,1+] (pre-clamp)
    tile_counts: jnp.ndarray    # [T] per-tile Gaussian counts (diagnostics)
    num_visible: jnp.ndarray    # scalar: Gaussians surviving projection
    num_truncated: jnp.ndarray  # scalar: Gaussians whose tile footprint
                                # exceeded max_tiles_per_gaussian
    num_pairs: jnp.ndarray = None
                                # scalar: true (tile, Gaussian) pair count;
                                # must stay <= pair_budget when that is set
                                # or renders truncate silently (None when
                                # the pair-prefix path is off)


def rasterize(
    means: jnp.ndarray,            # [N,3]
    quats: jnp.ndarray,            # [N,4] wxyz
    scales: jnp.ndarray,           # [N,3] linear
    opacities: jnp.ndarray,        # [N] linear
    viewmat: jnp.ndarray,          # [4,4]
    K: jnp.ndarray,                # [3,3]
    width: int,
    height: int,
    *,
    tile_size: int = 16,
    capacity: int = 512,
    max_tiles_per_gaussian: int = 64,
    dense_capacity: int = 0,     # 0 = single-level; else two-level K1
    overflow_tiles: int = 0,     # 0 = auto (T//4); budget of level-2 tiles
    pair_budget: int = 0,        # 0 = off; else sorted-pair-prefix frame
                                 # build + backward reduction (two-level
                                 # only; see KERNELS.md §5.2)
    backend: str = "jax",
    antialiased: bool = True,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    alive: Optional[jnp.ndarray] = None,
    absgrad_sink: Optional[jnp.ndarray] = None,   # [N,2] zeros
) -> RenderResult:
    """Render one view. Differentiable in means/quats/scales/opacities and,
    through ``absgrad_sink``'s cotangent, reports accumulated |d means2d|."""
    n = means.shape[0]
    proj = project_gaussians(
        means, quats, scales, opacities, viewmat, K, width, height,
        near_plane=near_plane, far_plane=far_plane,
        antialiased=antialiased, alive=alive)

    origins = tile_origins(width, height, tile_size)
    basis = pixel_basis(tile_size)
    if absgrad_sink is None:
        absgrad_sink = jnp.zeros((n, 2), dtype=jnp.float32)

    packed = tiles_mod.pack_gaussian_render_data(proj)    # [N,8]
    # Strict-vma note: under shard_map, ``absgrad_sink`` must be declared
    # varying (ops.vma.match_vma) by the caller BEFORE the function being
    # differentiated — a pvary inside the grad would transpose to a psum
    # and silently change absgrad semantics. See parallel/train_dp.py.
    num_tiles = tiles_mod.tile_grid(width, height, tile_size)[2]
    capacity = min(capacity, n) if n > 0 else capacity

    num_pairs = None
    if 0 < dense_capacity < capacity:
        # two-level: dense K1 everywhere + overflow budget of busy tiles
        t2 = overflow_tiles or max(num_tiles // 4, 8)
        t2 = min(t2, num_tiles)
        k1, k2 = dense_capacity, capacity - dense_capacity
        bins2 = tiles_mod.bin_gaussians_two_level(
            jax.lax.stop_gradient(proj), width, height, tile_size,
            k1, k2, t2, max_tiles_per_gaussian=max_tiles_per_gaussian,
            pair_budget=pair_budget)
        packed_sorted = packed[bins2.order]               # [N,8] cheap permute
        tile_imgs = tile_render_two_level(
            packed_sorted, bins2, origins, basis,
            bins2.order, absgrad_sink, backend, k1, k2)
        tile_counts = bins2.counts
        num_truncated = bins2.num_truncated
        num_pairs = bins2.num_pairs
    else:
        bins = bin_gaussians(jax.lax.stop_gradient(proj), width, height,
                             tile_size, capacity,
                             max_tiles_per_gaussian=max_tiles_per_gaussian)
        packed_sorted = packed[bins.order]
        counts = jnp.minimum(bins.counts, bins.ranks.shape[1])
        gathered = packed_sorted[bins.ranks]              # [T,Kc,8] row gather
        slot_validf = bins.valid.astype(jnp.float32)
        tile_imgs = tile_render(gathered, slot_validf, origins,
                                basis, bins.ranks, bins.order, absgrad_sink,
                                counts, backend)
        tile_counts = bins.counts
        num_truncated = bins.num_truncated
    image = assemble_image(tile_imgs, width, height, tile_size)
    return RenderResult(
        image=image,
        tile_counts=tile_counts,
        num_visible=jnp.sum(proj.valid.astype(jnp.int32)),
        num_truncated=num_truncated,
        num_pairs=num_pairs)
