"""Pallas kernel parity vs. the pure-XLA compositor (interpret mode on CPU).

The same tests run compiled on a real TPU via bench/parity scripts; here the
kernels execute through the Pallas interpreter so CI without TPUs still
covers the kernel math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgegaussians_tpu.ops import pallas_raster
from edgegaussians_tpu.ops.composite import _composite_jax
from edgegaussians_tpu.ops.rasterize import rasterize
from edgegaussians_tpu.ops.rasterize_ref import rasterize_reference
from edgegaussians_tpu.ops.tiles import pixel_basis


def _random_feats(rng, t=8, k=64, valid_frac=0.8):
    """Synthetic per-tile features resembling real projected Gaussians."""
    a = rng.uniform(0.05, 0.8, (t, k))
    c = rng.uniform(0.05, 0.8, (t, k))
    b = rng.uniform(-0.1, 0.1, (t, k)) * jnp.sqrt(a * c)
    mx = rng.uniform(-4.0, 20.0, (t, k))
    my = rng.uniform(-4.0, 20.0, (t, k))
    logop = jnp.log(rng.uniform(0.05, 0.95, (t, k)))
    validf = (rng.uniform(0, 1, (t, k)) < valid_frac).astype(jnp.float32)

    amx_bmy = a * mx + b * my
    bmx_cmy = b * mx + c * my
    const = -0.5 * (amx_bmy * mx + bmx_cmy * my) + logop
    const = jnp.where(validf > 0, const, -1e30)
    feats = jnp.stack([-0.5 * a, -b, -0.5 * c, amx_bmy, bmx_cmy, const,
                       logop, jnp.zeros_like(a)], axis=-1)
    return jnp.asarray(feats, jnp.float32)


@pytest.fixture
def np_rng():
    r = np.random.default_rng(7)

    class R:
        def uniform(self, lo, hi, shape):
            return jnp.asarray(r.uniform(lo, hi, shape), jnp.float32)
    return R()


def test_pallas_fwd_matches_jax(np_rng):
    feats = _random_feats(np_rng)
    basis = pixel_basis(16)
    ref = _composite_jax(feats, basis)
    out = pallas_raster.composite_fwd(feats, basis, interpret=True)
    np.testing.assert_allclose(np.array(out), np.array(ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_bwd_matches_jax_vjp(np_rng):
    feats = _random_feats(np_rng)
    basis = pixel_basis(16)
    g = np_rng.uniform(-1.0, 1.0, (feats.shape[0], basis.shape[1]))

    _, vjp = jax.vjp(lambda f: _composite_jax(f, basis), feats)
    (dref,) = vjp(g)
    dout = pallas_raster.composite_bwd(feats, basis, g, interpret=True)
    np.testing.assert_allclose(np.array(dout), np.array(dref),
                               atol=2e-5, rtol=1e-4)


def test_rasterize_pallas_backend_end_to_end(test_scene):
    means, quats, scales, opac, viewmat, K = map(jnp.array, test_scene)
    W, H = 64, 48
    ref = rasterize_reference(means, quats, scales, opac, viewmat, K, W, H)
    out = rasterize(means, quats, scales, opac, viewmat, K, W, H,
                    capacity=64, backend="pallas").image
    np.testing.assert_allclose(np.array(out), np.array(ref),
                               atol=2e-5, rtol=1e-4)


def test_rasterize_pallas_gradients(test_scene):
    means, quats, scales, opac, viewmat, K = map(jnp.array, test_scene)
    W, H = 64, 48

    def loss(backend):
        def f(m, q, s, o):
            img = rasterize(m, q, s, o, viewmat, K, W, H,
                            capacity=64, backend=backend).image
            return jnp.mean(jnp.abs(img - 0.25))
        return f

    g_p = jax.grad(loss("pallas"), argnums=(0, 1, 2, 3))(
        means, quats, scales, opac)
    g_j = jax.grad(loss("jax"), argnums=(0, 1, 2, 3))(
        means, quats, scales, opac)
    for gp, gj, name in zip(g_p, g_j, ["means", "quats", "scales", "opac"]):
        np.testing.assert_allclose(
            np.array(gp), np.array(gj), atol=5e-5, rtol=5e-3,
            err_msg=f"pallas/jax gradient mismatch for {name}")


# ---- v2 chunked kernels ----------------------------------------------------

def test_pallas_v2_fwd_matches_jax(np_rng):
    from edgegaussians_tpu.ops import pallas_raster_v2
    feats = _random_feats(np_rng, t=8, k=256)
    counts = jnp.asarray(np.array([0, 3, 64, 128, 130, 200, 256, 256]),
                         jnp.int32)
    # zero out invalid slots beyond counts (mirrors real binning output)
    kk = jnp.arange(256)[None, :]
    validf = (kk < counts[:, None]).astype(jnp.float32)
    feats = feats.at[..., 5].set(
        jnp.where(validf > 0, feats[..., 5], -1e30))
    basis = pixel_basis(16)
    ref = _composite_jax(feats, basis)
    out = pallas_raster_v2.composite_fwd(feats, counts, basis,
                                         interpret=True)
    np.testing.assert_allclose(np.array(out), np.array(ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_v2_bwd_matches_jax(np_rng):
    from edgegaussians_tpu.ops import pallas_raster_v2
    feats = _random_feats(np_rng, t=8, k=256)
    counts = jnp.asarray(np.array([0, 3, 64, 128, 130, 200, 256, 256]),
                         jnp.int32)
    kk = jnp.arange(256)[None, :]
    validf = (kk < counts[:, None]).astype(jnp.float32)
    feats = feats.at[..., 5].set(
        jnp.where(validf > 0, feats[..., 5], -1e30))
    basis = pixel_basis(16)
    g = np_rng.uniform(-1.0, 1.0, (feats.shape[0], basis.shape[1]))

    _, vjp = jax.vjp(lambda f: _composite_jax(f, basis), feats)
    (dref,) = vjp(g)
    dout = pallas_raster_v2.composite_bwd(feats, counts, basis, g,
                                          interpret=True)
    # invalid slots produce zero grads in both paths; product-space vs
    # log-space arithmetic flips a handful of knife-edge 1e-4 keep
    # decisions, hence the slightly looser tolerance
    np.testing.assert_allclose(np.array(dout), np.array(dref),
                               atol=3e-4, rtol=2e-3)


def test_rasterize_v2_backend_end_to_end(test_scene):
    means, quats, scales, opac, viewmat, K = map(jnp.array, test_scene)
    W, H = 64, 48
    ref = rasterize_reference(means, quats, scales, opac, viewmat, K, W, H)
    out = rasterize(means, quats, scales, opac, viewmat, K, W, H,
                    capacity=64, backend="pallas").image
    np.testing.assert_allclose(np.array(out), np.array(ref),
                               atol=2e-5, rtol=1e-4)


def test_rasterize_v2_gradients(test_scene):
    means, quats, scales, opac, viewmat, K = map(jnp.array, test_scene)
    W, H = 64, 48

    def loss(backend):
        def f(m, q, s, o):
            img = rasterize(m, q, s, o, viewmat, K, W, H,
                            capacity=64, backend=backend).image
            return jnp.mean(jnp.abs(img - 0.25))
        return f

    g_p = jax.grad(loss("pallas"), argnums=(0, 1, 2, 3))(
        means, quats, scales, opac)
    g_j = jax.grad(loss("jax"), argnums=(0, 1, 2, 3))(
        means, quats, scales, opac)
    for gp, gj, name in zip(g_p, g_j, ["means", "quats", "scales", "opac"]):
        np.testing.assert_allclose(
            np.array(gp), np.array(gj), atol=5e-5, rtol=5e-3,
            err_msg=f"v2 gradient mismatch for {name}")


def test_two_level_pallas_matches_jax(test_scene):
    from edgegaussians_tpu.ops.rasterize import rasterize as rz
    means, quats, scales, opac, viewmat, K = map(jnp.array, test_scene)
    W, H = 64, 48
    kwargs = dict(tile_size=16, capacity=64, dense_capacity=16,
                  overflow_tiles=12)

    img_j = rz(means, quats, scales, opac, viewmat, K, W, H,
               backend="jax", **kwargs).image
    img_p = rz(means, quats, scales, opac, viewmat, K, W, H,
               backend="pallas", **kwargs).image
    np.testing.assert_allclose(np.array(img_p), np.array(img_j),
                               atol=2e-5, rtol=1e-4)

    def loss(backend):
        def f(m, q, s, o):
            img = rz(m, q, s, o, viewmat, K, W, H, backend=backend,
                     **kwargs).image
            return jnp.mean(jnp.abs(img - 0.25))
        return f

    g_p = jax.grad(loss("pallas"), argnums=(0, 1, 2, 3))(
        means, quats, scales, opac)
    g_j = jax.grad(loss("jax"), argnums=(0, 1, 2, 3))(
        means, quats, scales, opac)
    for gp, gj, name in zip(g_p, g_j, ["means", "quats", "scales", "opac"]):
        np.testing.assert_allclose(
            np.array(gp), np.array(gj), atol=1e-4, rtol=1e-2,
            err_msg=f"two-level pallas gradient mismatch for {name}")
