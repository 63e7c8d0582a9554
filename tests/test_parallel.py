"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Validates that the sharded paths produce the same numbers as single-device
computation — the distributed test strategy SURVEY §4 prescribes
(fake-cluster CPU meshes instead of real pods).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgegaussians_tpu.config import FrameworkConfig
from edgegaussians_tpu.models import losses
from edgegaussians_tpu.models.gaussians import render_view
from edgegaussians_tpu.parallel import mesh as mesh_mod
from edgegaussians_tpu.parallel import train_dp
from edgegaussians_tpu.train import trainer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _setup(num_views=8, width=64, height=64, n_seed=64):
    r = np.random.default_rng(0)
    seeds = r.uniform(-0.5, 0.5, (n_seed, 3)).astype(np.float32)
    seeds[:, 2] += 2.0
    images = jnp.asarray(r.random((num_views, height, width)), jnp.float32)
    edge_masks = images > 0.5
    f = 60.0
    Ks = jnp.tile(jnp.array([[[f, 0, width / 2], [0, f, height / 2],
                              [0, 0, 1]]], jnp.float32), (num_views, 1, 1))
    viewmats = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None],
                        (num_views, 1, 1))
    cfg = FrameworkConfig()
    cfg.model.max_num_gaussians = 128
    cfg.model.tile_gaussian_capacity = 64
    ts = trainer.init_train_state(seeds, cfg)
    return cfg, ts, images, edge_masks, viewmats, Ks, width, height


def test_dp_step_matches_single_device_grads():
    cfg, ts, images, edge_masks, viewmats, Ks, W, H = _setup()
    mesh = mesh_mod.make_mesh(view_axis=4, tile_axis=2)
    dp_step = train_dp.make_dp_train_step(cfg, W, H, "jax", mesh)
    with mesh:
        ts2, loss, _ = dp_step(ts, jnp.int32(0), images, edge_masks,
                               viewmats, Ks)

    # single-device reference: mean whole-L1 loss over all views
    def ref_loss(params):
        total = 0.0
        for v in range(images.shape[0]):
            out = render_view(params, ts.gaussians.alive, viewmats[v],
                              Ks[v], W, H, capacity=64, backend="jax")
            total += losses.projection_loss_whole(
                jnp.clip(out.image, 0, 1), images[v])
        return total / images.shape[0]

    ref = float(ref_loss(ts.gaussians.params))
    assert np.isclose(float(loss), ref, rtol=1e-5), (float(loss), ref)
    # params must have moved
    assert not np.allclose(np.array(ts2.gaussians.params.means),
                           np.array(ts.gaussians.params.means))


def test_dp_grads_equal_sequential_grads():
    cfg, ts, images, edge_masks, viewmats, Ks, W, H = _setup(num_views=4)
    mesh = mesh_mod.make_mesh(view_axis=4, tile_axis=1)
    dp_step = train_dp.make_dp_train_step(cfg, W, H, "jax", mesh)
    with mesh:
        ts_dp, _, _ = dp_step(ts, jnp.int32(0), images, edge_masks,
                              viewmats, Ks)

    def full_loss(params):
        total = 0.0
        for v in range(images.shape[0]):
            out = render_view(params, ts.gaussians.alive, viewmats[v],
                              Ks[v], W, H, capacity=64, backend="jax")
            total += losses.projection_loss_whole(
                jnp.clip(out.image, 0, 1), images[v])
        return total / images.shape[0]

    grads = jax.grad(full_loss)(ts.gaussians.params)
    # recompute the Adam step manually on the single-device grads
    from edgegaussians_tpu.train import optim
    lrs = optim.all_lrs(cfg.training.optim, jnp.int32(0))
    params_ref, _ = optim.apply_updates(ts.gaussians.params, grads,
                                        ts.opt, lrs)
    # Adam divides by sqrt(nu): near-zero second moments amplify f32
    # reduction-order differences between psum and the sequential sum
    np.testing.assert_allclose(np.array(ts_dp.gaussians.params.means),
                               np.array(params_ref.means),
                               atol=3e-4, rtol=1e-3)


def test_tile_sharded_render_matches_single_device():
    cfg, ts, images, edge_masks, viewmats, Ks, W, H = _setup()
    mesh = mesh_mod.make_mesh(view_axis=2, tile_axis=4)
    tile_fn = train_dp.make_tile_sharded_render(cfg, W, H, "jax", mesh)
    with mesh:
        loss_sh, grads_sh, gsink_sh = tile_fn(
            ts.gaussians.params, ts.gaussians.alive, viewmats[0], Ks[0],
            images[0])

    def ref(params, sink):
        out = render_view(params, ts.gaussians.alive, viewmats[0], Ks[0],
                          W, H, capacity=64, backend="jax",
                          absgrad_sink=sink)
        return jnp.mean(jnp.abs(jnp.clip(out.image, 0, 1) - images[0]))

    sink0 = jnp.zeros((ts.gaussians.capacity, 2))
    loss_ref, (grads_ref, gsink_ref) = jax.value_and_grad(
        ref, argnums=(0, 1))(ts.gaussians.params, sink0)

    assert np.isclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    for g_s, g_r, name in zip(grads_sh, grads_ref,
                              ["means", "scales", "quats", "opacities"]):
        # per-tile partial sums reduce in a different order than the
        # single-device mean -> f32 noise on near-zero entries
        np.testing.assert_allclose(np.array(g_s), np.array(g_r),
                                   atol=5e-4, rtol=1e-2,
                                   err_msg=f"tile-sharded grads {name}")
    np.testing.assert_allclose(np.array(gsink_sh), np.array(gsink_ref),
                               atol=5e-4, rtol=1e-2)


def test_tileize_roundtrip():
    img = jnp.asarray(np.random.default_rng(0).random((44, 60)), jnp.float32)
    tiles, valid = train_dp.tileize_image(img, 60, 44, 16)
    from edgegaussians_tpu.ops.tiles import assemble_image
    back = assemble_image(tiles, 60, 44, 16)
    np.testing.assert_allclose(np.array(back), np.array(img))
    assert float(valid.sum()) == 44 * 60


def test_dp_raw_grads_match_sequential_exactly():
    """Direct (pre-Adam) gradient equivalence: psum'd DP grads must equal
    the sequential per-view grad SUM with ratio ~1 on every significant
    entry. Guards against the replicated-input auto-psum overcount (grads
    w.r.t. unvarying params inside shard_map arrive cross-device-summed,
    so the explicit psum would multiply by the axis size — a 4x error on
    a 4-way mesh that Adam's scale invariance hid in round 1)."""
    cfg, ts, images, edge_masks, viewmats, Ks, W, H = _setup()
    mesh = mesh_mod.make_mesh(view_axis=4, tile_axis=2)
    dp_step = train_dp.make_dp_train_step(cfg, W, H, "jax", mesh)
    with mesh:
        g, l, a, _ = dp_step.sharded_grads(
            ts.gaussians.params, ts.gaussians.alive, images, edge_masks,
            viewmats, Ks, jax.random.PRNGKey(0), jnp.int32(0),
            jnp.float32(1.0), jnp.float32(1.0))

    def seq(params):
        total = 0.0
        for v in range(images.shape[0]):
            out = render_view(params, ts.gaussians.alive, viewmats[v],
                              Ks[v], W, H, capacity=64, backend="jax")
            total += losses.projection_loss_whole(
                jnp.clip(out.image, 0, 1), images[v])
        return total

    g_ref = jax.grad(seq)(ts.gaussians.params)
    assert np.isclose(float(l), float(seq(ts.gaussians.params)), rtol=1e-5)
    for name in ("means", "scales", "quats", "opacities"):
        got = np.array(getattr(g, name))
        ref = np.array(getattr(g_ref, name))
        big = np.abs(ref) > 1e-4
        if big.any():
            ratios = got[big] / ref[big]
            # guards a scale error of the mesh-axis size (4x); f32
            # reduction-order noise stays ~1e-3
            np.testing.assert_allclose(ratios, 1.0, rtol=1e-2,
                                       err_msg=f"dp grad scale {name}")


def test_tile_sharded_grads_scale_exact():
    """Same guard for the tile-sharded path: grads on significant entries
    must match the single-device render at ratio ~1 (was 4x pre-fix)."""
    cfg, ts, images, edge_masks, viewmats, Ks, W, H = _setup()
    mesh = mesh_mod.make_mesh(view_axis=2, tile_axis=4)
    tile_fn = train_dp.make_tile_sharded_render(cfg, W, H, "jax", mesh)
    with mesh:
        loss_sh, g_sh, gsink_sh = tile_fn(
            ts.gaussians.params, ts.gaussians.alive, viewmats[0], Ks[0],
            images[0])

    def ref(params, sink):
        out = render_view(params, ts.gaussians.alive, viewmats[0], Ks[0],
                          W, H, capacity=64, backend="jax",
                          absgrad_sink=sink)
        return jnp.mean(jnp.abs(jnp.clip(out.image, 0, 1) - images[0]))

    sink0 = jnp.zeros((ts.gaussians.capacity, 2))
    _, (g_ref, gsink_ref) = jax.value_and_grad(
        ref, argnums=(0, 1))(ts.gaussians.params, sink0)
    for name in ("means", "scales", "quats", "opacities"):
        got = np.array(getattr(g_sh, name))
        refv = np.array(getattr(g_ref, name))
        big = np.abs(refv) > 1e-4
        if big.any():
            np.testing.assert_allclose(got[big] / refv[big], 1.0,
                                       rtol=1e-2,
                                       err_msg=f"tile grad scale {name}")
    bigs = np.abs(np.array(gsink_ref)) > 1e-7
    if bigs.any():
        np.testing.assert_allclose(
            np.array(gsink_sh)[bigs] / np.array(gsink_ref)[bigs], 1.0,
            rtol=1e-3)
