"""Per-group Adam with the reference's learning-rate schedules.

The reference trains four independent torch.optim.Adam instances — one per
parameter group — with a MultiStepLR schedule on means and 'zero until
start epoch, then constant' (CustomLRScheduler) on scales/quats/opacities
(reference: edgegaussians/utils/train_utils.py:15-65).

Implemented functionally with explicit moment buffers (NamedTuple) so the
density controller can zero clone rows directly, preserving the reference's
optimizer-state surgery semantics (edge_gs.py:384-457). Torch-Adam parity
details honored: moments update even while lr == 0 (CustomLRScheduler's
first stage), bias correction uses per-group step counts, defaults
beta=(0.9, 0.999), eps=1e-8.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from edgegaussians_tpu.config import OptimConfig, OptimGroupConfig
from edgegaussians_tpu.models.density import AdamMoments
from edgegaussians_tpu.models.gaussians import GaussianParams

GROUPS = ("means", "scales", "quats", "opacities")

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-8


class GroupCounts(NamedTuple):
    """Per-group Adam step counts (torch keeps one per optimizer)."""
    means: jnp.ndarray
    scales: jnp.ndarray
    quats: jnp.ndarray
    opacities: jnp.ndarray


class OptState(NamedTuple):
    moments: AdamMoments
    counts: GroupCounts


def init_opt_state(params: GaussianParams) -> OptState:
    def zeros_like_pair(p):
        return (jnp.zeros_like(p), jnp.zeros_like(p))
    zero = jnp.zeros((), dtype=jnp.int32)
    return OptState(
        moments=AdamMoments(
            means=zeros_like_pair(params.means),
            scales=zeros_like_pair(params.scales),
            quats=zeros_like_pair(params.quats),
            opacities=zeros_like_pair(params.opacities)),
        counts=GroupCounts(zero, zero, zero, zero))


def group_lr(cfg: OptimGroupConfig, epoch: jnp.ndarray) -> jnp.ndarray:
    """Learning rate of one group during ``epoch`` (traced scalar).

    'step': MultiStepLR — start_lr * gamma^(#milestones <= epoch)
    (train_utils.py:51). 'start_at': 0 before start_at_epoch, start_lr after
    (CustomLRScheduler, train_utils.py:15-25).
    """
    e = epoch.astype(jnp.float32)
    if cfg.type == "step":
        if not cfg.milestones:
            return jnp.asarray(cfg.start_lr, jnp.float32)
        ms = jnp.asarray(cfg.milestones, dtype=jnp.float32)
        n_passed = jnp.sum(ms <= e).astype(jnp.float32)
        return cfg.start_lr * jnp.power(cfg.gamma, n_passed)
    # 'start_at'
    return jnp.where(e < cfg.start_at_epoch, 0.0, cfg.start_lr)


def all_lrs(cfg: OptimConfig, epoch: jnp.ndarray):
    return {
        "means": group_lr(cfg.means, epoch),
        "scales": group_lr(cfg.scales, epoch),
        "quats": group_lr(cfg.quats, epoch),
        "opacities": group_lr(cfg.opacities, epoch),
    }


def _adam_step(param, grad, mu, nu, count, lr):
    count = count + 1
    mu = ADAM_B1 * mu + (1.0 - ADAM_B1) * grad
    nu = ADAM_B2 * nu + (1.0 - ADAM_B2) * grad * grad
    cf = count.astype(jnp.float32)
    mu_hat = mu / (1.0 - jnp.power(ADAM_B1, cf))
    nu_hat = nu / (1.0 - jnp.power(ADAM_B2, cf))
    new_param = param - lr * mu_hat / (jnp.sqrt(nu_hat) + ADAM_EPS)
    return new_param, mu, nu, count


def apply_updates(params: GaussianParams, grads: GaussianParams,
                  opt: OptState, lrs, groups: Tuple[str, ...] = GROUPS
                  ) -> Tuple[GaussianParams, OptState]:
    """One Adam step on the selected groups (others untouched — the
    reference's partial opt.step() for direction/ratio losses,
    train_gaussians.py:116-119)."""
    new_params = {}
    new_moments = {}
    new_counts = {}
    for g in GROUPS:
        p = getattr(params, g)
        if g in groups:
            mu, nu = getattr(opt.moments, g)
            cnt = getattr(opt.counts, g)
            p2, mu2, nu2, cnt2 = _adam_step(
                p, getattr(grads, g), mu, nu, cnt, lrs[g])
            new_params[g] = p2
            new_moments[g] = (mu2, nu2)
            new_counts[g] = cnt2
        else:
            new_params[g] = p
            new_moments[g] = getattr(opt.moments, g)
            new_counts[g] = getattr(opt.counts, g)
    return (GaussianParams(**new_params),
            OptState(AdamMoments(**new_moments), GroupCounts(**new_counts)))


def annealed(value_start: float, value_end: float, mode: str,
             step: jnp.ndarray, max_steps: int) -> jnp.ndarray:
    """constant/linear annealing (train_utils.py:28-45)."""
    if mode == "constant":
        return jnp.asarray(value_start, jnp.float32)
    if mode == "linear":
        return value_start + (value_end - value_start) * (
            step.astype(jnp.float32) / max_steps)
    raise ValueError(f"Unsupported annealing mode: {mode}")
