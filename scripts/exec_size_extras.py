"""Decompose the epoch program's non-rasterizer code size (ABC shapes).

Usage: python scripts/exec_size_extras.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from edgegaussians_tpu.models import losses
from edgegaussians_tpu.models.gaussians import GaussianParams
from edgegaussians_tpu.train import optim
from edgegaussians_tpu.config import load_config

N = 16384
W = H = 800


def exec_size(lowered, label):
    compiled = lowered.compile()
    try:
        size = len(compiled.runtime_executable().serialize())
    except Exception:
        size = -1
    print(f"{label:52s} exec={size/1e6:8.1f} MB")


def main():
    cfg = load_config("configs/ABC_DexiNed.json")
    r = np.random.default_rng(0)
    pred = jnp.zeros((H, W), jnp.float32)
    gt = jnp.zeros((H, W), jnp.float32)
    edge_mask = jnp.zeros((H, W), bool)
    key = jax.random.PRNGKey(0)

    bg = jax.jit(lambda p, k: jax.grad(
        lambda p: losses.projection_loss_bg_edge_ratio(
            p, gt, edge_mask, jnp.float32(1.0), k))(p))
    exec_size(bg.lower(pred, key), "bg_edge_ratio loss grad (incl. RNG)")

    rng_only = jax.jit(lambda k: jax.random.uniform(k, (H * W,)))
    exec_size(rng_only.lower(key), "threefry uniform 640k")

    wl = jax.jit(lambda p: jax.grad(
        lambda p: losses.projection_loss_weighted(
            p, gt, losses.compute_weight_mask(edge_mask)))(p))
    exec_size(wl.lower(pred), "weighted loss grad")

    params = GaussianParams(
        means=jnp.zeros((N, 3)), scales=jnp.zeros((N, 3)),
        quats=jnp.zeros((N, 4)), opacities=jnp.zeros((N, 1)))
    opt = optim.init_opt_state(params)
    lrs = optim.all_lrs(cfg.training.optim, jnp.int32(0))
    grads = params

    au = jax.jit(lambda p, g, o: optim.apply_updates(p, g, o, lrs))
    exec_size(au.lower(params, grads, opt), "apply_updates (4-group Adam)")

    alive = jnp.ones((N,), bool)
    means = jnp.asarray(r.normal(size=(N, 3)), jnp.float32)

    def dir_equiv(p):
        # trainer semantics: nn indices are computed OUTSIDE the grad
        nn_idx = losses.update_nearest_neighbors(
            jax.lax.stop_gradient(p.means), alive, 5, "enforce_full")
        return losses.direction_loss(p.means, jnp.exp(p.scales), p.quats,
                                     nn_idx, alive, 5, "enforce_full")

    db = jax.jit(lambda p: jax.grad(dir_equiv)(p))
    exec_size(db.lower(params._replace(means=means)),
              "direction branch (knn fwd + loss grad)")

    rb = jax.jit(lambda p: jax.grad(
        lambda p: losses.ratio_loss(jnp.exp(p.scales), alive))(p))
    exec_size(rb.lower(params), "ratio loss grad")


if __name__ == "__main__":
    main()
