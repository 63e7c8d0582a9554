"""Tile-band geometry + band-partial projection losses (shared).

One view's pixel/tile grid splits into horizontal bands of tile rows, one
band per device on a 'tiles' mesh axis. Each device renders ONLY its band
(ops/rasterize.py band mode) and computes a band-PARTIAL loss whose psum
over the axis is the exact full-image loss. Three strategies
(edge_gs.py:288-324) are covered with every denominator a *global*
quantity computable locally from the replicated edge mask, so no
collective appears inside the differentiated function — a psum there
would transpose into a second psum on the cotangent and inflate the
gradients by the axis size (the round-2 bug class, commit 26260cb).

Consumers: parallel/train_sharded.py (tile-band per-view SGD),
parallel/train_tp.py (Gaussian-axis TP, which also band-splits the
compositing), parallel/train_dp.py (hierarchical views x tiles
composition).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from edgegaussians_tpu.models import losses
from edgegaussians_tpu.ops.tiles import cdiv, tile_grid


def band_geometry(width: int, height: int, tile_size: int, n_shards: int):
    """(tile rows per shard, band pixel height, padded image height)."""
    _, nty, _ = tile_grid(width, height, tile_size)
    rows_per = cdiv(nty, n_shards)
    band_h = rows_per * tile_size
    return rows_per, band_h, band_h * n_shards


def band_inputs(gt, edge_mask, y0, band_h, pad_h, height, width):
    """Slice this device's band of the ground truth + edge mask.

    Returns (gt_b [band_h,W], em_b [band_h,W] f32, valid_b [band_h,W] f32
    masking rows past the true image height).
    """
    def pad_rows(img):
        return jnp.pad(img, ((0, pad_h - height), (0, 0)))

    gt_b = jax.lax.dynamic_slice_in_dim(pad_rows(gt), y0, band_h, axis=0)
    em_b = jax.lax.dynamic_slice_in_dim(
        pad_rows(edge_mask.astype(jnp.float32)), y0, band_h, axis=0)
    yy = (jnp.arange(band_h, dtype=jnp.int32) + y0)[:, None]
    valid_b = jnp.broadcast_to((yy < height).astype(jnp.float32),
                               (band_h, width))
    return gt_b, em_b, valid_b


def band_partial_loss(pred, gt_b, em_b, valid_b, edge_mask, strategy_idx,
                      bg_ratio, key, *, loss_type: str, height: int,
                      width: int, y0, band_h: int, pad_h: int):
    """Band-PARTIAL loss for the selected strategy; the global loss is the
    psum over bands, taken OUTSIDE the grad (see module docstring).

    - ``whole``: band sum of |pred-gt| (or squared) / (H*W).
    - ``bg_edge_ratio``: edge term band-partial over the global edge count;
      the reference's bug-faithful flat-index background sampler
      (SURVEY §6.5.2) needs the FULL image's order statistic, which every
      device computes locally from the replicated edge mask and the shared
      PRNG key, then slices to its band.
    - ``weighted``: inverse-frequency weights from global edge counts,
      locally computable.
    """
    hw = jnp.float32(height * width)
    adiff = jnp.abs(pred - gt_b) * valid_b

    def whole():
        if loss_type == "l2":
            return jnp.sum(((pred - gt_b) ** 2) * valid_b) / hw
        return jnp.sum(adiff) / hw

    def bg_edge_ratio():
        num_edge = jnp.sum(edge_mask)   # replicated full mask
        edge_cnt = jnp.maximum(num_edge.astype(jnp.float32), 1.0)
        edge_loss = jnp.sum(adiff * em_b) / edge_cnt
        num_bg_all = height * width - num_edge
        num_bg_sample = (bg_ratio * num_edge).astype(jnp.int32)
        flat = jnp.arange(height * width)
        scores = jax.random.uniform(key, (height * width,))
        scores = jnp.where(flat < num_bg_all, scores, 2.0)
        kth = losses._kth_smallest(scores, num_bg_sample)
        smask = ((scores <= kth) & (flat < num_bg_all)
                 & (num_bg_sample > 0)).reshape(height, width)
        denom = jnp.maximum(jnp.sum(smask.astype(jnp.float32)), 1.0)
        sm_b = jax.lax.dynamic_slice_in_dim(
            jnp.pad(smask.astype(jnp.float32),
                    ((0, pad_h - height), (0, 0))), y0, band_h, axis=0)
        return edge_loss + jnp.sum(adiff * sm_b) / denom

    def weighted():
        num_edge = jnp.sum(edge_mask).astype(jnp.float32)
        num_bg = hw - num_edge
        w_b = jnp.where(em_b > 0, num_bg / hw, num_edge / hw)
        return jnp.sum(w_b * adiff) / hw

    return jax.lax.switch(strategy_idx, [whole, bg_edge_ratio, weighted])
