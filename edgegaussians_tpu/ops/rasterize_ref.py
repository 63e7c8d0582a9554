"""Per-pixel oracle rasterizer (pure JAX, O(N * pixels)).

Evaluates every Gaussian at every pixel with exact front-to-back alpha
compositing semantics. Used as the correctness oracle for the tile-based
production rasterizers (the reference plays the same role for gsplat-based
parity in BASELINE.md; call contract at edge_gs.py:250-268). Only suitable
for small scenes/tests.

Compositing semantics (gsplat / 3DGS):
- Gaussians composited in ascending camera-depth order,
- alpha = min(0.999, opac * exp(-sigma)), skipped if < 1/255 or sigma < 0,
- compositing stops before the Gaussian that would drop transmittance
  below 1e-4,
- colors are fixed all-ones for edge rendering (edge_gs.py:247), so the
  rendered intensity equals accumulated alpha.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from edgegaussians_tpu.ops.projection import (
    ALPHA_CLAMP, ALPHA_THRESHOLD, TRANSMITTANCE_EPS, ProjectedGaussians,
    project_gaussians)


def composite_depth_ordered(alphas: jnp.ndarray) -> jnp.ndarray:
    """Front-to-back composite along axis 0 with early-termination semantics.

    ``alphas``: [N, ...] per-Gaussian-per-pixel alpha, already depth-ordered
    and masked to 0 for skipped contributions. Returns accumulated intensity
    (= accumulated alpha for all-ones colors).
    """
    log_one_minus = jnp.log1p(-alphas)                        # <= 0
    log_T_inc = jnp.cumsum(log_one_minus, axis=0)             # inclusive
    log_T_prev = log_T_inc - log_one_minus                    # exclusive
    # stop BEFORE the contribution that drops T below the floor; log_T_inc is
    # monotone non-increasing so a simple threshold reproduces the 'done' flag
    keep = log_T_inc >= jnp.log(TRANSMITTANCE_EPS)
    contrib = alphas * jnp.exp(log_T_prev) * keep
    return jnp.sum(contrib, axis=0)


def evaluate_alphas(proj: ProjectedGaussians, px: jnp.ndarray,
                    py: jnp.ndarray) -> jnp.ndarray:
    """Alpha of each projected Gaussian at pixel centers (px, py) [P].

    Returns [N, P] with skip rules applied (alpha=0 where skipped).
    """
    dx = px[None, :] - proj.means2d[:, 0:1]                  # [N,P]
    dy = py[None, :] - proj.means2d[:, 1:2]
    a = proj.conics[:, 0:1]
    b = proj.conics[:, 1:2]
    c = proj.conics[:, 2:3]
    sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
    alpha = proj.opacities[:, None] * jnp.exp(-sigma)
    alpha = jnp.minimum(alpha, ALPHA_CLAMP)
    ok = (sigma >= 0) & (alpha >= ALPHA_THRESHOLD) & proj.valid[:, None]
    return jnp.where(ok, alpha, 0.0)


def rasterize_reference(
    means, quats, scales, opacities, viewmat, K, width, height,
    near_plane: float = 0.01, far_plane: float = 1e10,
    antialiased: bool = True, alive=None,
) -> jnp.ndarray:
    """Render one edge-intensity image [H, W] the brute-force way."""
    proj = project_gaussians(
        means, quats, scales, opacities, viewmat, K, width, height,
        near_plane=near_plane, far_plane=far_plane,
        antialiased=antialiased, alive=alive)

    # depth-ascending order; invalid entries pushed to the back
    order = jnp.argsort(jnp.where(proj.valid, proj.depths, jnp.inf))
    proj = ProjectedGaussians(*[v[order] for v in proj])

    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5)
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5)
    pyy, pxx = jnp.meshgrid(ys, xs, indexing="ij")
    px = pxx.reshape(-1)
    py = pyy.reshape(-1)

    alphas = evaluate_alphas(proj, px, py)                   # [N, H*W]
    image = composite_depth_ordered(alphas)                  # [H*W]
    return image.reshape(height, width)
