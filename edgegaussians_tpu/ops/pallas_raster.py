"""Pallas TPU kernels for per-tile Gaussian compositing.

The fused production path of the rasterizer: the [K, P] per-tile alpha matrix
is produced by an MXU matmul (``[K,8] feats @ [8,P] pixel basis`` — see
ops/tiles.py for the monomial-feature factorization) and composited
front-to-back entirely in VMEM; only the [T,8,K] features and [T,P] tile
images touch HBM. This replaces the reference's external gsplat CUDA
forward/backward rasterization kernels (edge_gs.py:250-268).

Layout: features are staged to HBM transposed as [T, 8, K] so the Gaussian
axis K rides the 128-lane dimension (a [T,K,8] layout would waste 15/16 of
each lane-load on padding). The MXU contraction over the 8 feature rows
un-transposes for free.

The backward kernel rematerializes alphas from the features (no saved
per-pixel state) and returns d feats; gradient flow to Gaussian parameters
and the absgrad signal happen in the surrounding JAX code (ops/composite.py).

Cumulative transmittance is computed in log space with a Hillis-Steele scan
built from ``pltpu.roll`` (log2(K) vectorized steps along the sublane axis;
``lax.cumsum`` does not lower in Pallas TPU).
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

_LOG_TRANS_EPS = float(np.log(TRANSMITTANCE_EPS))

# Tiles processed per grid program (amortizes per-program overhead; must
# keep the second-to-last output block dim divisible by 8 for Mosaic).
TILE_BLOCK = 8

def _logop_selector() -> jnp.ndarray:
    """One-hot [8,1] selector extracting the log-opacity feature row (slot 6)
    as a [K,1] column via a second tiny MXU contraction. Built from iota
    in-kernel (Pallas forbids captured array constants)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    return (row == 6).astype(jnp.float32)


def _cumsum_axis0(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inclusive cumulative sum along axis 0 via Hillis-Steele roll steps."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    shift = 1
    while shift < k:
        rolled = pltpu.roll(x, shift, axis=0)
        x = x + jnp.where(row >= shift, rolled, 0.0)
        shift *= 2
    return x


def _alpha_terms(f8k, basis):
    """Shared forward evaluation: masked alphas and transmittances.

    f8k [8,K] (transposed features), basis [8,P] -> [K,P] terms.
    """
    k = f8k.shape[1]
    logalpha = jax.lax.dot_general(
        f8k, basis, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                       # [K,P]
    logop = jax.lax.dot_general(
        f8k, _logop_selector(), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                       # [K,1]
    alpha = jnp.exp(logalpha)
    # skip rules: sigma >= 0  <=>  logalpha <= log opacity; alpha >= 1/255.
    # Invalid slots carry a -1e30 constant feature, so alpha == 0 there.
    ok = (logalpha <= logop + SIGMA_GUARD_EPS) & (alpha >= ALPHA_THRESHOLD)
    alpha = jnp.where(ok, jnp.minimum(alpha, ALPHA_CLAMP), 0.0)

    log1m = jnp.log1p(-alpha)
    log_t_inc = _cumsum_axis0(log1m, k)
    keep = (log_t_inc >= _LOG_TRANS_EPS).astype(jnp.float32)
    t_prev = jnp.exp(log_t_inc - log1m)
    return alpha, ok, keep, t_prev


def _fwd_kernel(feats_ref, basis_ref, out_ref):
    basis = basis_ref[:]
    for i in range(feats_ref.shape[0]):
        alpha, _, keep, t_prev = _alpha_terms(feats_ref[i], basis)
        out_ref[i] = jnp.sum(alpha * t_prev * keep, axis=0)


def _bwd_kernel(feats_ref, basis_ref, g_ref, dfeats_ref):
    basis = basis_ref[:]
    k = feats_ref.shape[2]
    for i in range(feats_ref.shape[0]):
        alpha, ok, keep, t_prev = _alpha_terms(feats_ref[i], basis)
        contrib = alpha * t_prev * keep                       # [K,P]
        c_inc = _cumsum_axis0(contrib, k)
        total = c_inc[k - 1 : k, :]                           # [1,P]
        suffix = total - c_inc                                # sum over j>k
        g = g_ref[i][None, :]                                 # [1,P]
        # d out / d alpha_k = T_{k-1} - (sum_{j>k} a_j T_{j-1}) / (1 - a_k)
        dalpha = (t_prev - suffix / (1.0 - alpha)) * keep * g
        # chain through alpha = exp(logalpha); zero where masked or clamped
        dla = jnp.where(ok & (alpha < ALPHA_CLAMP), alpha * dalpha, 0.0)
        dfeats_ref[i] = jax.lax.dot_general(
            basis, dla, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)               # [8,K]


def _pad_tiles(x, tb):
    pad = (-x.shape[0]) % tb
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


def _auto_interpret() -> bool:
    """Interpret-mode fallback off-TPU (CPU tests exercise kernel logic)."""
    return jax.default_backend() != "tpu"


def composite_fwd(feats, basis, interpret: bool | None = None):
    """[T,K,8] feats -> [T,P] composited tile intensities."""
    return _composite_fwd(feats, basis,
                          _auto_interpret() if interpret is None else interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _composite_fwd(feats, basis, interpret: bool = False):
    t, k, _ = feats.shape
    p = basis.shape[1]
    tb = TILE_BLOCK
    feats_t = _pad_tiles(jnp.swapaxes(feats, 1, 2), tb)       # [Tp,8,K]
    tp = feats_t.shape[0]

    out = pl.pallas_call(
        _fwd_kernel,
        grid=(tp // tb,),
        in_specs=[
            pl.BlockSpec((tb, 8, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=vma.out_struct((tp, p), jnp.float32, feats_t),
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * k * 9 * p + 14 * tp * k * p,
            bytes_accessed=tp * k * 8 * 4 + tp * p * 4,
            transcendentals=3 * tp * k * p),
        interpret=interpret,
    )(feats_t, basis)
    return out[:t]


def composite_bwd(feats, basis, g, interpret: bool | None = None):
    """VJP wrt feats: upstream [T,P] -> d feats [T,K,8]."""
    return _composite_bwd(feats, basis, g,
                          _auto_interpret() if interpret is None else interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _composite_bwd(feats, basis, g, interpret: bool = False):
    t, k, _ = feats.shape
    p = basis.shape[1]
    tb = TILE_BLOCK
    feats_t = _pad_tiles(jnp.swapaxes(feats, 1, 2), tb)       # [Tp,8,K]
    g_p = _pad_tiles(g, tb)
    tp = feats_t.shape[0]

    dfeats_t = pl.pallas_call(
        _bwd_kernel,
        grid=(tp // tb,),
        in_specs=[
            pl.BlockSpec((tb, 8, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, 8, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=vma.out_struct((tp, 8, k), jnp.float32, feats_t, g_p),
        cost_estimate=pl.CostEstimate(
            flops=4 * tp * k * 9 * p + 24 * tp * k * p,
            bytes_accessed=2 * tp * k * 8 * 4 + tp * p * 4,
            transcendentals=3 * tp * k * p),
        interpret=interpret,
    )(feats_t, basis, g_p)
    return jnp.swapaxes(dfeats_t[:t], 1, 2)                    # [T,K,8]
