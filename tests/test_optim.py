"""Optimizer parity vs. torch.optim.Adam + the reference's schedulers.

The reference trains with four torch Adam instances and two scheduler types
(train_utils.py:15-65); this validates our functional re-implementation
reproduces torch's trajectories bit-for-bit-ish (f32 tolerance), including
the 'moments update while lr=0' first-stage behavior.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from edgegaussians_tpu.config import OptimGroupConfig
from edgegaussians_tpu.train import optim

torch = pytest.importorskip("torch")


def _run_torch(param0, grads, lr_for_epoch, steps_per_epoch):
    p = torch.nn.Parameter(torch.tensor(param0))
    opt = torch.optim.Adam([p], lr=1.0)   # lr injected per epoch below
    traj = []
    step = 0
    for epoch, lr in enumerate(lr_for_epoch):
        for g in opt.param_groups:
            g["lr"] = lr
        for _ in range(steps_per_epoch):
            opt.zero_grad()
            p.grad = torch.tensor(grads[step])
            opt.step()
            step += 1
        traj.append(p.detach().numpy().copy())
    return np.stack(traj)


def _run_ours(param0, grads, cfg, num_epochs, steps_per_epoch):
    p = jnp.asarray(param0)
    mu = jnp.zeros_like(p)
    nu = jnp.zeros_like(p)
    cnt = jnp.zeros((), jnp.int32)
    traj = []
    step = 0
    for epoch in range(num_epochs):
        lr = optim.group_lr(cfg, jnp.int32(epoch))
        for _ in range(steps_per_epoch):
            p, mu, nu, cnt = optim._adam_step(
                p, jnp.asarray(grads[step]), mu, nu, cnt, lr)
            step += 1
        traj.append(np.asarray(p))
    return np.stack(traj)


def test_adam_multistep_lr_matches_torch(rng):
    cfg = OptimGroupConfig(type="step", start_lr=2e-3,
                           milestones=[2, 4], gamma=0.5)
    num_epochs, spe = 6, 3
    param0 = rng.normal(size=(8,)).astype(np.float32)
    grads = rng.normal(size=(num_epochs * spe, 8)).astype(np.float32)

    # torch MultiStepLR: lr decays after `milestone` scheduler.step() calls;
    # our group_lr(epoch) must equal torch's lr during that epoch
    lrs = []
    dummy = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.Adam([dummy], lr=cfg.start_lr)
    sched = torch.optim.lr_scheduler.MultiStepLR(
        topt, milestones=cfg.milestones, gamma=cfg.gamma)
    for _ in range(num_epochs):
        lrs.append(topt.param_groups[0]["lr"])
        dummy.grad = torch.zeros(1)
        topt.step()
        sched.step()

    for e in range(num_epochs):
        ours = float(optim.group_lr(cfg, jnp.int32(e)))
        assert np.isclose(ours, lrs[e]), (e, ours, lrs[e])

    ref = _run_torch(param0, grads, lrs, spe)
    got = _run_ours(param0, grads, cfg, num_epochs, spe)
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-5)


def test_adam_start_at_matches_torch(rng):
    """lr=0 first stage still updates moments (CustomLRScheduler parity)."""
    cfg = OptimGroupConfig(type="start_at", start_lr=1e-2, start_at_epoch=2)
    num_epochs, spe = 5, 2
    param0 = rng.normal(size=(4,)).astype(np.float32)
    grads = rng.normal(size=(num_epochs * spe, 4)).astype(np.float32)

    lrs = [0.0 if e < cfg.start_at_epoch else cfg.start_lr
           for e in range(num_epochs)]
    ref = _run_torch(param0, grads, lrs, spe)
    got = _run_ours(param0, grads, cfg, num_epochs, spe)
    # params frozen during the zero-lr stage
    np.testing.assert_allclose(got[0], param0, atol=0)
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-5)
    # the post-stage trajectory differs from a fresh-Adam one because the
    # moments were warmed during the zero-lr stage — verify we did warm them
    got_fresh = _run_ours(param0, grads[cfg.start_at_epoch * spe:],
                          OptimGroupConfig(type="start_at",
                                           start_lr=1e-2, start_at_epoch=0),
                          num_epochs - cfg.start_at_epoch, spe)
    assert not np.allclose(got[-1], got_fresh[-1])


def test_annealed():
    assert float(optim.annealed(1.0, 5.0, "constant", jnp.int32(3), 10)) == 1.0
    assert np.isclose(
        float(optim.annealed(1.0, 5.0, "linear", jnp.int32(5), 10)), 3.0)
