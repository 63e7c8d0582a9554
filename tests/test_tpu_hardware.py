"""Compiled-TPU parity tests (skipped off-TPU).

The CPU suite runs Pallas kernels in interpreter mode, which cannot catch
compiled-only numerics: MXU default-precision (bfloat16) matmuls and
accumulation-order-sensitive comparisons. Both bit this project once
(see pallas_raster_v2.py module docstring: Precision.HIGHEST and
SIGMA_GUARD_EPS), so this file re-checks kernel-vs-oracle agreement on
real hardware whenever the suite runs there:

    EG_TPU_TESTS=1 JAX_PLATFORMS=<tpu platform> python -m pytest \
        tests/test_tpu_hardware.py -q --no-header -p no:cacheprovider

tests/conftest.py pins JAX_PLATFORMS=cpu for the regular suite, so these
activate only when EG_TPU_TESTS is set (the env override wins before
conftest runs — see conftest guard).
"""

import os

import numpy as np
import pytest

if not os.environ.get("EG_TPU_TESTS"):
    pytest.skip("EG_TPU_TESTS not set (CPU suite runs interpret mode)",
                allow_module_level=True)

import jax
import jax.numpy as jnp

if jax.default_backend() not in ("tpu",):
    pytest.skip("no TPU backend", allow_module_level=True)

from edgegaussians_tpu.ops.rasterize import rasterize


def _scene(n=20000, seed=0):
    r = np.random.default_rng(seed)
    means = jnp.asarray(r.uniform(-0.5, 0.5, (n, 3)), jnp.float32) \
        + jnp.array([0, 0, 2.0])
    quats = jnp.asarray(r.normal(size=(n, 4)), jnp.float32)
    scales = jnp.asarray(
        np.exp(r.uniform(np.log(0.003), np.log(0.03), (n, 3))), jnp.float32)
    opac = jnp.asarray(r.uniform(0.2, 0.95, n), jnp.float32)
    f = 1111.0
    K = jnp.array([[f, 0, 400.0], [0, f, 400.0], [0, 0, 1]], jnp.float32)
    viewmat = jnp.eye(4, dtype=jnp.float32)
    return means, quats, scales, opac, viewmat, K


@pytest.mark.parametrize("two_level", [False, True])
def test_compiled_image_matches_oracle(two_level):
    """Compiled Pallas render == XLA oracle render on hardware.

    Guards against MXU-precision and guard-comparison divergence that
    interpreter-mode tests cannot see.
    """
    means, quats, scales, opac, viewmat, K = _scene()
    extra = dict(dense_capacity=128, overflow_tiles=625) if two_level else {}
    imgs = {}
    for backend in ("pallas", "jax"):
        imgs[backend] = jax.jit(lambda m, q, s, o, b=backend: rasterize(
            m, q, s, o, viewmat, K, 800, 800, tile_size=16, capacity=512,
            backend=b, **extra).image)(means, quats, scales, opac)
    diff = float(jnp.max(jnp.abs(imgs["pallas"] - imgs["jax"])))
    assert diff < 1e-4, f"compiled/oracle image diff {diff}"


def test_compiled_gradients_match_oracle():
    means, quats, scales, opac, viewmat, K = _scene()

    def loss(backend):
        def f(m, q, s, o):
            out = rasterize(m, q, s, o, viewmat, K, 800, 800, tile_size=16,
                            capacity=512, dense_capacity=128,
                            backend=backend)
            return jnp.mean(jnp.abs(out.image - 0.5))
        return jax.jit(jax.grad(f, argnums=(0, 1, 2, 3)))

    gp = loss("pallas")(means, quats, scales, opac)
    gj = loss("jax")(means, quats, scales, opac)
    for p, j, name in zip(gp, gj, ("means", "quats", "scales", "opac")):
        scale = float(jnp.max(jnp.abs(j))) + 1e-20
        rel = float(jnp.max(jnp.abs(p - j))) / scale
        assert rel < 5e-3, f"grad {name} rel diff {rel}"
