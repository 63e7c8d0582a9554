"""Strict-vma regression tests for the absgrad sink under shard_map.

Round-1 driver failure (MULTICHIP_r01.json): the custom VJP of tile_render
produced a 'views'-varying dsink cotangent for an unvarying sink primal,
which strict varying-manual-axes JAX rejects. The fix declares the sink
varying (ops.vma.match_vma) at the grad-argument creation site — OUTSIDE
the differentiated function, so the pvary does not transpose into a psum.
These tests pin both the mechanism and the numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from edgegaussians_tpu.ops import vma

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _mesh(n=8, axis="views"):
    return Mesh(np.array(jax.devices()[:n]), (axis,))


def test_match_vma_promotes_to_ref_axes():
    mesh = _mesh()
    seen = {}

    def f(xs, sink):
        sink2 = vma.match_vma(sink, xs)
        seen["sink"] = vma.vma_of(sink)
        seen["sink2"] = vma.vma_of(sink2)
        seen["xs"] = vma.vma_of(xs)
        return (jnp.sum(sink2) + jnp.sum(xs))[None]

    sh = jax.shard_map(f, mesh=mesh, in_specs=(P("views"), P()),
                       out_specs=P("views"))
    jax.jit(sh)(jnp.ones((8, 2)), jnp.zeros((3,)))
    assert seen["xs"] == frozenset({"views"})
    assert seen["sink"] == frozenset()
    assert seen["sink2"] == frozenset({"views"})


def test_match_vma_is_noop_when_already_varying():
    mesh = _mesh()

    def f(xs):
        # double-promotion must not raise (pvary errors on present axes)
        y = vma.match_vma(xs, xs)
        return jnp.sum(y)[None]

    sh = jax.shard_map(f, mesh=mesh, in_specs=(P("views"),),
                       out_specs=P("views"))
    out = jax.jit(sh)(jnp.arange(8.0))
    assert out.shape == (8,)


def test_match_vma_noop_outside_shard_map():
    x = jnp.zeros((4,))
    y = vma.match_vma(x, jnp.ones((4,)))
    assert y is x


def test_sink_grad_stays_per_device():
    """The pvary'd sink's cotangent must remain the device-local value
    (NOT a cross-device psum): pvary placed outside the grad."""
    mesh = _mesh()

    def f(xs, sink):
        sink = vma.match_vma(sink, xs)  # outside the grad closure

        def loss(s):
            return jnp.sum(jnp.abs(xs + s))

        g = jax.grad(loss)(sink)
        return g[None]  # per-device |xs| sign, varying

    sh = jax.shard_map(f, mesh=mesh, in_specs=(P("views"), P()),
                       out_specs=P("views"))
    xs = jnp.asarray(np.linspace(-1, 1, 8), jnp.float32)
    g = jax.jit(sh)(xs, jnp.zeros(()))
    # per-device cotangent = sign(xs_local): both signs present — a psum'd
    # (summed) cotangent would be a constant replicated across devices
    np.testing.assert_allclose(np.array(g), np.sign(np.array(xs)))


def test_tile_render_grad_under_shard_map_views():
    """End-to-end: render under a views-sharded shard_map, grads for params
    AND the absgrad sink; per-device absgrads must match the single-device
    per-view values (reference absgrad semantics: edge_gs.py:607-613)."""
    from edgegaussians_tpu.models.gaussians import render_view
    from edgegaussians_tpu.config import FrameworkConfig
    from edgegaussians_tpu.train import trainer

    r = np.random.default_rng(3)
    n, W, H, nv = 32, 32, 32, 8
    seeds = r.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
    seeds[:, 2] += 2.0
    cfg = FrameworkConfig()
    cfg.model.max_num_gaussians = n
    cfg.model.tile_gaussian_capacity = 16
    ts = trainer.init_train_state(seeds, cfg)
    params, alive = ts.gaussians.params, ts.gaussians.alive

    f = 30.0
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    vm = jnp.eye(4, dtype=jnp.float32)
    images = jnp.asarray(r.random((nv, H, W)), jnp.float32)

    def per_view(img, sink):
        def loss(p, s):
            out = render_view(p, alive, vm, K, W, H, capacity=16,
                              backend="jax", absgrad_sink=s)
            return jnp.mean(jnp.abs(jnp.clip(out.image, 0, 1) - img))

        l, (g, gs) = jax.value_and_grad(
            loss, argnums=(0, 1))(params, sink)
        return l, jnp.linalg.norm(gs, axis=-1)

    mesh = _mesh()

    def sharded(images):
        sink = vma.match_vma(jnp.zeros((n, 2), jnp.float32), images)
        l, a = per_view(images[0], sink)
        return l[None], a[None]

    sh = jax.shard_map(sharded, mesh=mesh, in_specs=(P("views"),),
                       out_specs=(P("views"), P("views")))
    ls, absg = jax.jit(sh)(images)

    for v in range(nv):
        l_ref, a_ref = per_view(images[v],
                                jnp.zeros((n, 2), jnp.float32))
        assert np.isclose(float(ls[v]), float(l_ref), rtol=1e-5)
        np.testing.assert_allclose(np.array(absg[v]), np.array(a_ref),
                                   rtol=1e-4, atol=1e-8)


def test_checked_mode_sharded_proj_grad_equivalence():
    """The production tile-band proj-grad runs under check_vma=True for the
    pure-XLA backend (ops.vma.shard_map_for_backend) and matches the
    single-device values — the strict type system that catches psum
    double-reduction bugs at trace time (VERDICT r2 item 3) is live again
    on every non-Pallas path."""
    from edgegaussians_tpu.config import FrameworkConfig
    from edgegaussians_tpu.parallel import train_sharded
    from edgegaussians_tpu.train import trainer

    r = np.random.default_rng(5)
    n, W, H = 64, 64, 64
    seeds = r.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
    seeds[:, 2] += 2.0
    cfg = FrameworkConfig()
    cfg.model.max_num_gaussians = n
    cfg.model.tile_gaussian_capacity = 32
    ts = trainer.init_train_state(seeds, cfg)
    params, alive = ts.gaussians.params, ts.gaussians.alive

    f = 60.0
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    vm = jnp.eye(4, dtype=jnp.float32)
    gt = jnp.asarray(r.random((H, W)), jnp.float32)
    em = gt > 0.5
    key = jax.random.PRNGKey(0)

    mesh = Mesh(np.array(jax.devices()[:4]), ("tiles",))
    # the builder must install a CHECKED shard_map for backend='jax'
    sharded = train_sharded.make_sharded_proj_grad_fn(cfg, W, H, "jax",
                                                      mesh)
    single = trainer.make_proj_grad_fn(cfg, W, H, "jax")

    for sidx in (0, 1, 2):
        l_s, st_s, g_s, a_s = jax.jit(sharded)(
            params, alive, vm, K, gt, em, jnp.int32(sidx),
            jnp.float32(1.0), key)
        l_r, st_r, g_r, a_r = jax.jit(single)(
            params, alive, vm, K, gt, em, jnp.int32(sidx),
            jnp.float32(1.0), key)
        assert np.isclose(float(l_s), float(l_r), rtol=1e-5), sidx
        np.testing.assert_allclose(np.array(g_s.means),
                                   np.array(g_r.means), atol=1e-6)
        np.testing.assert_allclose(np.array(a_s), np.array(a_r), atol=1e-6)


def test_strict_vma_pallas_repro_still_fails():
    """Pin the reason the Pallas shard_maps run check_vma=False
    (scripts/vma_pallas_repro.py; VERDICT r4 #9): inside a strict-vma
    shard_map, a Pallas body's ref loads carry the operand's vma but
    primitive results drop it, so fori_loop carries mixing ref-derived
    values with fresh constants mismatch. Re-probed against the
    INSTALLED JAX every suite run — when this starts passing under
    check_vma=True, flip ops.vma.shard_map_for_backend to checked mode
    for the pallas backend and delete this pin."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh, PartitionSpec as P

    from edgegaussians_tpu.ops import vma

    def kernel(x_ref, o_ref):
        def body(i, acc):
            return acc + x_ref[i, :] * 2.0

        o_ref[0, :] = jax.lax.fori_loop(
            0, x_ref.shape[0], body, jnp.zeros((128,), jnp.float32))

    def pcall(x):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=vma.out_struct((1, 128), jnp.float32, x),
            interpret=True,
        )(x)

    mesh = Mesh(np.array(jax.devices()[:4]), ("tiles",))

    def f(x):
        return jax.lax.psum(pcall(x), "tiles")

    x = jnp.ones((4 * 8, 128), jnp.float32)
    ok = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=P("tiles"),
                               out_specs=P(), check_vma=False))(x)
    assert float(ok.sum()) > 0

    try:
        jax.jit(jax.shard_map(f, mesh=mesh, in_specs=P("tiles"),
                              out_specs=P(), check_vma=True))(x)
        still_fails = False
    except Exception:
        still_fails = True
    assert still_fails, (
        "strict-vma now ACCEPTS pallas bodies on this JAX — flip "
        "ops.vma.shard_map_for_backend to checked mode for pallas and "
        "retire this pin (scripts/vma_pallas_repro.py)")
