"""Per-tile front-to-back alpha compositing with a custom VJP.

The differentiable boundary of the rasterizer: given gathered per-tile
Gaussian data, produce per-tile pixel intensities. Two interchangeable
backends:

- ``jax``: chunked, rematerialized pure-XLA implementation (CPU-testable,
  used as the parity oracle for the kernel),
- ``pallas``: fused TPU kernels (see pallas_raster.py) where the [K, P]
  alpha matrix lives only in VMEM.

The custom VJP additionally produces the *absgrad* signal driving
densification — the per-Gaussian sum over tiles of the absolute screen-space
position gradient (the reference reads gsplat's ``means2d.absgrad``:
edge_gs.py:607-613). It is exposed through a gradient *sink*: a zeros [N,2]
input whose cotangent the backward pass fills with the scatter-added
|d means2d| per tile — so ``jax.grad`` w.r.t. the sink yields absgrad with
no side channels.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from edgegaussians_tpu.ops.projection import (
    ALPHA_CLAMP, ALPHA_THRESHOLD, TRANSMITTANCE_EPS)
from edgegaussians_tpu.ops.tiles import build_tile_features

_LOG_TRANS_EPS = float(np.log(TRANSMITTANCE_EPS))


def _composite_tile(feats: jnp.ndarray,    # [K,8]
                    basis: jnp.ndarray,    # [8,P]
                    ) -> jnp.ndarray:      # [P]
    """One tile: matmul alpha evaluation + log-space compositing.

    Invalid slots arrive with a -1e30 constant feature (alpha underflows to
    0); slot 6 carries log opacity for the sigma >= 0 numerical guard.
    """
    logalpha = jnp.dot(feats, basis, preferred_element_type=jnp.float32)
    logop = feats[:, 6:7]
    alpha = jnp.exp(logalpha)
    # skip rules: sigma >= 0  <=>  logalpha <= log opacity; alpha >= 1/255
    ok = (logalpha <= logop) & (alpha >= ALPHA_THRESHOLD)
    alpha = jnp.where(ok, jnp.minimum(alpha, ALPHA_CLAMP), 0.0)

    log1m = jnp.log1p(-alpha)
    log_T_inc = jnp.cumsum(log1m, axis=0)
    keep = log_T_inc >= _LOG_TRANS_EPS          # monotone early-stop mask
    t_prev = jnp.exp(log_T_inc - log1m)
    return jnp.sum(alpha * t_prev * keep, axis=0)


def _composite_jax(feats, basis, chunk: int = 64):
    """Chunked lax.map over tiles; rematerialized so AD stores only inputs."""
    T = feats.shape[0]
    pad = (-T) % chunk
    if pad:
        feats = jnp.pad(feats, ((0, pad), (0, 0), (0, 0)))
    n_chunks = feats.shape[0] // chunk

    tile_fn = jax.checkpoint(jax.vmap(_composite_tile, in_axes=(0, None)))

    def chunk_fn(f):
        return tile_fn(f, basis)

    out = jax.lax.map(
        chunk_fn, feats.reshape(n_chunks, chunk, *feats.shape[1:]))
    return out.reshape(-1, basis.shape[1])[:T]


def _render_impl(gathered, slot_validf, origins, basis, counts,
                 backend: str):
    feats = build_tile_features(gathered, origins, slot_validf)
    if backend == "pallas":
        from edgegaussians_tpu.ops import pallas_raster_v2
        return pallas_raster_v2.composite_fwd(feats, counts, basis)
    if backend == "pallas_v1":
        from edgegaussians_tpu.ops import pallas_raster
        return pallas_raster.composite_fwd(feats, basis)
    return _composite_jax(feats, basis)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def tile_render(gathered, slot_validf, origins, basis, ranks, order, sink,
                counts=None, backend: str = "jax"):
    """Render all tiles: gathered per-tile Gaussians -> [T, P] intensities.

    Args:
      gathered:    [T,K,8] gathered packed rows (pack_gaussian_render_data,
                   depth-sorted frame; differentiable).
      slot_validf: [T,K]   float 0/1 bin-slot validity.
      origins:     [T,2]   tile origins (constant).
      basis:       [8,P]   tile-local pixel monomial basis (constant).
      ranks:       [T,K]   int32 depth ranks (for the absgrad scatter).
      order:       [N]     int32 rank -> Gaussian id permutation.
      sink:        [N,2]   zeros; its gradient receives the per-Gaussian
                   accumulated |d means2d| (absgrad).
      counts:      [T]     int32 true per-tile occupancy (drives the v2
                   kernel's chunk predication; None -> derive from validf).
      backend:     'jax' | 'pallas' (chunked v2) | 'pallas_v1'.
    """
    counts = _resolve_counts(counts, slot_validf)
    return _render_impl(gathered, slot_validf, origins, basis, counts,
                        backend)


def _resolve_counts(counts, slot_validf):
    if counts is None:
        return jnp.sum(slot_validf > 0, axis=1).astype(jnp.int32)
    return counts


def _tile_render_fwd(gathered, slot_validf, origins, basis, ranks, order,
                     sink, counts, backend):
    counts = _resolve_counts(counts, slot_validf)
    out = _render_impl(gathered, slot_validf, origins, basis, counts,
                       backend)
    return out, (gathered, slot_validf, origins, basis, ranks, order,
                 counts, sink.shape[0])


def _tile_render_bwd(backend, res, g):
    gathered, slot_validf, origins, basis, ranks, order, counts, n = res

    if backend in ("pallas", "pallas_v1"):
        feats = build_tile_features(gathered, origins, slot_validf)
        if backend == "pallas":
            from edgegaussians_tpu.ops import pallas_raster_v2
            dfeats = pallas_raster_v2.composite_bwd(feats, counts, basis, g)
        else:
            from edgegaussians_tpu.ops import pallas_raster
            dfeats = pallas_raster.composite_bwd(feats, basis, g)
        _, feat_vjp = jax.vjp(
            lambda ga: build_tile_features(ga, origins, slot_validf),
            gathered)
        (dgathered,) = feat_vjp(dfeats)
    else:
        _, vjp_fn = jax.vjp(
            lambda ga: _render_impl(ga, slot_validf, origins, basis,
                                    counts, backend),
            gathered)
        (dgathered,) = vjp_fn(g)

    # absgrad: per-Gaussian sum over tiles of |d means2d| (gsplat absgrad
    # semantics; consumed by duplicate_high_pos_gradients — edge_gs.py:544).
    # Columns 3:5 of the packed rows are the screen-space center. Accumulate
    # in the depth-sorted frame (ranks), then unpermute via order — both
    # scatters are cheap vs. decoding global ids per tile slot.
    contrib = jnp.abs(dgathered[..., 3:5]) * slot_validf[..., None]
    sorted_sink = jnp.zeros((n, 2), dtype=dgathered.dtype).at[
        ranks.reshape(-1)].add(contrib.reshape(-1, 2), mode="drop")
    dsink = jnp.zeros((n, 2), dtype=dgathered.dtype).at[order].add(
        sorted_sink, mode="drop")

    zero_ranks = np.zeros(ranks.shape, dtype=jax.dtypes.float0)
    zero_order = np.zeros(order.shape, dtype=jax.dtypes.float0)
    zero_counts = np.zeros(counts.shape, dtype=jax.dtypes.float0)
    return (dgathered, jnp.zeros_like(slot_validf),
            jnp.zeros_like(origins), jnp.zeros_like(basis), zero_ranks,
            zero_order, dsink, zero_counts)


tile_render.defvjp(_tile_render_fwd, _tile_render_bwd)
