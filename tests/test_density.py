"""Density-control semantics (reference: edge_gs.py:383-613)."""

import jax
import jax.numpy as jnp
import numpy as np

from edgegaussians_tpu.config import ModelConfig
from edgegaussians_tpu.models import density
from edgegaussians_tpu.models.gaussians import init_state
from edgegaussians_tpu.train.optim import init_opt_state


def _make(n=8, cap=32, config=None):
    cfg = config or ModelConfig(init_scales_val=0.01, init_opacity_val=0.3)
    pts = np.linspace(0, 1, n * 3).reshape(n, 3).astype(np.float32)
    gs = init_state(pts, cfg, capacity=cap)
    opt = init_opt_state(gs.params)
    return gs, opt, cfg


def test_init_state_basic():
    gs, _, cfg = _make()
    assert gs.capacity == 32
    assert int(gs.num_alive()) == 8
    np.testing.assert_allclose(
        np.exp(np.array(gs.params.scales[0])), cfg.init_scales_val, rtol=1e-5)
    op = 1 / (1 + np.exp(-np.array(gs.params.opacities[0, 0])))
    np.testing.assert_allclose(op, cfg.init_opacity_val, rtol=1e-5)


def test_cull_low_opacity_absolute():
    gs, opt, cfg = _make()
    cfg.cull_opacity_type = "absolute"
    cfg.cull_opacity_value = 0.1     # init opacity is 0.3 -> rows 4..7 survive
    # drop opacity of rows 0..3 below threshold
    new_op = gs.params.opacities.at[:4].set(-5.0)   # sigmoid ~ 0.007
    gs = gs._replace(params=gs.params._replace(opacities=new_op))
    gs2, _ = density.cull_low_opacity(gs, opt.moments, cfg)
    alive = np.array(gs2.alive)
    assert alive[:4].sum() == 0 and alive[4:8].sum() == 4


def test_cull_reset_opacities_clamps_logits():
    """Bug-faithful: cull clamps remaining opacity LOGITS to reset value
    (edge_gs.py:425-429)."""
    gs, opt, cfg = _make()
    gs = gs._replace(params=gs.params._replace(
        opacities=gs.params.opacities.at[:].set(3.0)))
    gs2, _ = density.cull(gs, opt.moments,
                          jnp.zeros((gs.capacity,), bool), cfg)
    assert float(jnp.max(gs2.params.opacities)) <= cfg.reset_opacity_value


def test_duplicate_scatters_into_free_slots():
    gs, opt, cfg = _make(n=4, cap=16)
    cfg.dup_factor = 3
    key = jax.random.PRNGKey(0)
    dup_mask = jnp.zeros((16,), bool).at[1].set(True).at[3].set(True)
    gs2, moments = density._duplicate(gs, opt.moments, dup_mask,
                                      cfg.dup_factor,
                                      cfg.init_dup_rand_noise_scale, key)
    # 2 selected * (3-1) copies = 4 clones -> 8 alive
    assert int(gs2.num_alive()) == 8
    # clones carry source scales/quats/opacities exactly
    clone_rows = np.where(np.array(gs2.alive) & ~np.array(gs.alive))[0]
    for r in clone_rows:
        src_candidates = [1, 3]
        assert any(np.allclose(np.array(gs2.params.scales[r]),
                               np.array(gs.params.scales[s]))
                   for s in src_candidates)
    # clone means are noisy copies (noise scale 0.05)
    for r in clone_rows:
        d = min(np.linalg.norm(np.array(gs2.params.means[r])
                               - np.array(gs.params.means[s]))
                for s in [1, 3])
        assert 0 < d < 0.5


def test_duplicate_respects_capacity():
    gs, opt, cfg = _make(n=8, cap=10)
    key = jax.random.PRNGKey(0)
    gs2, _ = density._duplicate(gs, opt.moments, gs.alive, 3, 0.01, key)
    assert int(gs2.num_alive()) == 10   # clamped at capacity, no overflow


def test_duplicate_zeroes_clone_moments():
    gs, opt, cfg = _make(n=4, cap=16)
    # fill moments with ones
    moments = jax.tree.map(lambda x: jnp.ones_like(x), opt.moments)
    key = jax.random.PRNGKey(0)
    dup_mask = jnp.zeros((16,), bool).at[0].set(True)
    gs2, m2 = density._duplicate(gs, moments, dup_mask, 2, 0.01, key)
    clone = int(np.where(np.array(gs2.alive) & ~np.array(gs.alive))[0][0])
    assert float(m2.means[0][clone].sum()) == 0.0    # clone zeroed
    assert float(m2.means[0][0].sum()) != 0.0        # source kept


def test_duplicate_high_pos_gradients_absolute():
    gs, opt, cfg = _make(n=8, cap=32)
    cfg.dup_threshold_type = "absolute"
    cfg.dup_threshold_value = 0.5
    cfg.dup_factor = 2
    absgrads = jnp.zeros((32,)).at[:8].set(
        jnp.array([0.0, 0.1, 0.2, 0.3, 0.4, 0.8, 0.9, 1.0]))
    gs = gs._replace(absgrads=absgrads, absgrad_count=jnp.float32(1.0))
    gs2, _ = density.duplicate_high_pos_gradients(gs, opt.moments, cfg,
                                                  jax.random.PRNGKey(0))
    # normalized grads > 0.5 -> rows 5,6,7 -> 3 clones
    assert int(gs2.num_alive()) == 11
    assert float(jnp.sum(gs2.absgrads)) == 0.0       # reset after dup


def test_duplicate_high_pos_gradients_top_fraction():
    gs, opt, cfg = _make(n=8, cap=32)
    cfg.dup_threshold_type = "top_fraction"
    cfg.dup_threshold_value = 0.25          # top quarter of 8 alive -> 2
    cfg.dup_factor = 2
    absgrads = jnp.zeros((32,)).at[:8].set(
        jnp.array([0.0, 0.1, 0.2, 0.3, 0.4, 0.8, 0.9, 1.0]))
    gs = gs._replace(absgrads=absgrads, absgrad_count=jnp.float32(1.0))
    gs2, _ = density.duplicate_high_pos_gradients(gs, opt.moments, cfg,
                                                  jax.random.PRNGKey(0))
    # strictly above the 0.75-quantile ('lower') -> rows 6,7 -> 2 clones
    assert int(gs2.num_alive()) == 10
    # count stays 2 under a uniform shift of the grads (no knife edge on
    # the normalized scale, unlike 'absolute')
    gs3 = gs._replace(absgrads=absgrads + 0.3, absgrad_count=jnp.float32(1.0))
    gs4, _ = density.duplicate_high_pos_gradients(gs3, opt.moments, cfg,
                                                  jax.random.PRNGKey(0))
    assert int(gs4.num_alive()) == 10


def test_masked_quantile_matches_numpy():
    vals = jnp.array([5.0, 1.0, 3.0, 2.0, 4.0, 99.0])
    mask = jnp.array([True, True, True, True, True, False])
    got = float(density.masked_quantile(vals, mask, 0.5))
    assert np.isclose(got, 3.0)
    got_lower = float(density.masked_quantile(vals, mask, 0.6,
                                              method="lower"))
    assert np.isclose(got_lower, np.quantile([5, 1, 3, 2, 4], 0.6,
                                             method="lower"))


def test_cull_not_projecting():
    cfg = ModelConfig(cull_gaussians_not_projecting_threshold=0.5)
    pts = np.array([[0.0, 0.0, 2.0], [5.0, 5.0, 2.0]], np.float32)
    gs = init_state(pts, cfg, capacity=8)
    opt = init_opt_state(gs.params)
    # one camera at origin looking +z; 16x16 image, edge only at center
    K = jnp.array([[[8.0, 0, 8], [0, 8.0, 8], [0, 0, 1]]])
    vm = jnp.eye(4)[None]
    edge = jnp.zeros((1, 16, 16), bool).at[0, 8, 8].set(True)
    gs2, _ = density.cull_not_projecting(gs, opt.moments, cfg, vm, K, edge)
    alive = np.array(gs2.alive)
    assert alive[0]          # projects to (8,8) which is an edge pixel
    assert not alive[1]      # projects off-image


def test_wayward_mask_flags_outlier():
    cfg = ModelConfig(cull_wayward_method="mean_distance",
                      cull_wayward_threshold_type="absolute",
                      cull_wayward_threshold_value=1.0,
                      cull_wayward_num_neighbors=3)
    pts = np.random.default_rng(0).normal(size=(16, 3)).astype(np.float32) * 0.1
    pts[7] = [50.0, 50.0, 50.0]
    gs = init_state(pts, cfg, capacity=32)
    mask = np.array(density.wayward_mask(gs, cfg))
    assert mask[7]
    assert mask[:7].sum() == 0


def test_cull_wayward_noop_by_default():
    """Reference never applies the wayward cull (SURVEY §6.5.1)."""
    gs, opt, cfg = _make()
    gs2, _ = density.cull_wayward(gs, opt.moments, cfg)
    np.testing.assert_array_equal(np.array(gs2.alive), np.array(gs.alive))
