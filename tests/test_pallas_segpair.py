"""Parity tests for the segmented pair-dense compositor
(ops/pallas_segpair.py, pair_kernel="seg").

The v5 path must reproduce the dense single-level rasterizer exactly
(same compositing semantics): forward image, all four packed-row
gradient groups, and the absgrad sink cotangent. Specific v5 machinery
exercised here: cross-brick transmittance/image carries on runs longer
than one 128-pair brick, the 8-row image carry chain under slow row
advance, non-multiple-of-128 budgets, and empty scenes. Kernels run in
interpret mode on CPU; the compiled-TPU check lives in
tests/test_tpu_hardware.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from edgegaussians_tpu.ops.rasterize import rasterize


def _scene(n=300, width=64, height=48, seed=0):
    r = np.random.default_rng(seed)
    means = r.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    means[:, 2] += 2.0
    quats = r.normal(size=(n, 4)).astype(np.float32)
    scales = np.exp(r.uniform(np.log(0.01), np.log(0.06), (n, 3))) \
        .astype(np.float32)
    opac = r.uniform(0.2, 0.9, n).astype(np.float32)
    f = 55.0
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]],
                 np.float32)
    vm = np.eye(4, dtype=np.float32)
    return tuple(jnp.asarray(a) for a in
                 (means, quats, scales, opac, vm, K)) + (width, height)


def _cluster_scene(n=400, width=48, height=32, seed=2):
    """Most Gaussians piled on one tile -> runs spanning many bricks."""
    r = np.random.default_rng(seed)
    means = r.normal(0, 0.02, (n, 3)).astype(np.float32)  # one hot spot
    means[:, 2] += 2.0 + r.uniform(0, 1, n).astype(np.float32)
    quats = r.normal(size=(n, 4)).astype(np.float32)
    scales = np.exp(r.uniform(np.log(0.01), np.log(0.04), (n, 3))) \
        .astype(np.float32)
    opac = r.uniform(0.05, 0.4, n).astype(np.float32)
    f = 40.0
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]],
                 np.float32)
    vm = np.eye(4, dtype=np.float32)
    return tuple(jnp.asarray(a) for a in
                 (means, quats, scales, opac, vm, K)) + (width, height)


def _loss_fn(vm, K, width, height, kwargs):
    def f(m, q, s, o, sink):
        out = rasterize(m, q, s, o, vm, K, width, height,
                        tile_size=16, absgrad_sink=sink, **kwargs)
        img = jnp.clip(out.image, 0, 1)
        w = (jnp.arange(img.size, dtype=jnp.float32)
             .reshape(img.shape) % 7) / 7.0 + 0.3
        return jnp.sum(img * w), out
    return f


def _compare(scene, budget=8192, cap=256, atol_img=2e-5, atol_g=3e-4,
             rtol_g=2e-3):
    *args, width, height = scene
    means, quats, scales, opac, vm, K = args
    sink0 = jnp.zeros((means.shape[0], 2), jnp.float32)
    dense = _loss_fn(vm, K, width, height,
                     dict(capacity=cap, backend="jax"))
    seg = _loss_fn(vm, K, width, height,
                   dict(capacity=cap, dense_capacity=32, overflow_tiles=8,
                        pair_budget=budget, pair_kernel="seg",
                        backend="jax"))
    (l1, out1), g1 = jax.value_and_grad(dense, argnums=(0, 1, 2, 3, 4),
                                        has_aux=True)(
        means, quats, scales, opac, sink0)
    (l2, out2), g2 = jax.value_and_grad(seg, argnums=(0, 1, 2, 3, 4),
                                        has_aux=True)(
        means, quats, scales, opac, sink0)
    assert int(out2.num_pairs) > 0
    assert int(out2.num_pairs) <= budget, "budget must cover the scene"
    np.testing.assert_allclose(np.asarray(out2.image),
                               np.asarray(out1.image), atol=atol_img)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    names = ["means", "quats", "scales", "opacities", "absgrad"]
    for a, b, name in zip(g1, g2, names):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=atol_g, rtol=rtol_g,
                                   err_msg=f"segpair grads {name}")


def test_segpair_matches_dense_forward_and_grads():
    _compare(_scene())


def test_segpair_long_runs_cross_brick_carries():
    # runs of several hundred pairs on one tile: the transmittance /
    # contribution-prefix carries cross many brick boundaries
    _compare(_cluster_scene(), budget=16384, cap=512)


def test_segpair_non_brick_multiple_budget():
    _compare(_scene(seed=5), budget=4100)


def test_segpair_respects_capacity_truncation():
    *args, width, height = _scene(n=400, seed=3)
    means, quats, scales, opac, vm, K = args

    def render(kwargs):
        return rasterize(means, quats, scales, opac, vm, K, width,
                         height, tile_size=16, **kwargs)

    dense = render(dict(capacity=8, backend="jax"))
    seg = render(dict(capacity=8, dense_capacity=4, overflow_tiles=4,
                      pair_budget=8192, pair_kernel="seg",
                      backend="jax"))
    np.testing.assert_allclose(np.asarray(seg.image),
                               np.asarray(dense.image), atol=2e-5)


def test_segpair_matches_v4_pair_kernel():
    *args, width, height = _scene(n=350, seed=9)
    means, quats, scales, opac, vm, K = args
    sink0 = jnp.zeros((means.shape[0], 2), jnp.float32)
    common = dict(capacity=256, dense_capacity=32, overflow_tiles=8,
                  pair_budget=8192, backend="jax")
    v4 = _loss_fn(vm, K, width, height, dict(common, pair_kernel=True))
    v5 = _loss_fn(vm, K, width, height, dict(common, pair_kernel="seg"))
    (l1, _), g1 = jax.value_and_grad(v4, argnums=(0, 1, 2, 3, 4),
                                     has_aux=True)(
        means, quats, scales, opac, sink0)
    (l2, _), g2 = jax.value_and_grad(v5, argnums=(0, 1, 2, 3, 4),
                                     has_aux=True)(
        means, quats, scales, opac, sink0)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-4, rtol=2e-3)


def _overflow_scene(width=64, height=64, sparse_per_tile=10, pile=120,
                    seed=11):
    """15 low-id tiles with ``sparse_per_tile`` Gaussians each plus a
    high-occupancy pile on the LARGEST tile id (bottom-right): its sort-1
    run starts last, so a small pair budget zeroes its kept count while
    its raw occupancy is the maximum — the exact overflow shape that broke
    the raw-count frame ordering (ADVICE r4 high)."""
    r = np.random.default_rng(seed)
    pts = []
    for ty in range(4):
        for tx in range(4):
            if (ty, tx) == (3, 3):
                continue
            pts.append(np.stack([
                tx * 16 + r.uniform(4, 12, sparse_per_tile),
                ty * 16 + r.uniform(4, 12, sparse_per_tile)], axis=1))
    pts.append(np.stack([r.uniform(52, 60, pile),
                         r.uniform(52, 60, pile)], axis=1))
    px = np.concatenate(pts).astype(np.float32)
    n = px.shape[0]
    f, z = 64.0, 2.0
    means = np.concatenate(
        [(px - 32.0) * (z / f), np.full((n, 1), z, np.float32)],
        axis=1).astype(np.float32)
    quats = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (n, 1))
    scales = np.full((n, 3), 0.015, np.float32)
    opac = np.full((n,), 0.5, np.float32)
    K = np.array([[f, 0, 32], [0, f, 32], [0, 0, 1]], np.float32)
    vm = np.eye(4, dtype=np.float32)
    return tuple(jnp.asarray(a) for a in
                 (means, quats, scales, opac, vm, K)) + (width, height)


def test_segpair_budget_overflow_matches_v4():
    # budget < num_pairs (pairs past it are dropped, trainer-audited):
    # seg must stay FINITE and reproduce the v4 pair kernel, which shares
    # the sort-1 prefix truncation semantics. Regression for the NaN the
    # raw-count frame ordering produced on mid-stream zero-kept rows.
    *args, width, height = _overflow_scene()
    means, quats, scales, opac, vm, K = args
    sink0 = jnp.zeros((means.shape[0], 2), jnp.float32)
    budget = 64
    common = dict(capacity=256, dense_capacity=32, overflow_tiles=8,
                  pair_budget=budget, backend="jax")
    v4 = _loss_fn(vm, K, width, height, dict(common, pair_kernel=True))
    v5 = _loss_fn(vm, K, width, height, dict(common, pair_kernel="seg"))
    (l1, out1), g1 = jax.value_and_grad(v4, argnums=(0, 1, 2, 3, 4),
                                        has_aux=True)(
        means, quats, scales, opac, sink0)
    (l2, out2), g2 = jax.value_and_grad(v5, argnums=(0, 1, 2, 3, 4),
                                        has_aux=True)(
        means, quats, scales, opac, sink0)
    assert int(out2.num_pairs) > budget, "scene must overflow the budget"
    assert np.isfinite(np.asarray(out2.image)).all()
    np.testing.assert_allclose(np.asarray(out2.image),
                               np.asarray(out1.image), atol=2e-5)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    for a, b in zip(g1, g2):
        assert np.isfinite(np.asarray(b)).all()
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-4, rtol=2e-3)


def test_seg_tables_zero_kept_rows_are_last():
    # table-level invariant the kernel depends on: counts_f (kept run
    # lengths in frame order) must be nonincreasing-to-zero — no zero-kept
    # row may precede a nonzero one, for ANY budget
    from edgegaussians_tpu.ops.projection import project_gaussians
    from edgegaussians_tpu.ops.tiles import bin_pairs_frame_order
    *args, width, height = _overflow_scene(seed=3)
    means, quats, scales, opac, vm, K = args
    proj = project_gaussians(means, quats, scales, opac, vm, K,
                             width, height)
    for budget in (16, 64, 256, 4096):
        pbins = bin_pairs_frame_order(proj, width, height, 16, 256,
                                      budget, block_tiles=0)
        cf = np.asarray(pbins.counts_f)
        nz = cf > 0
        first_zero = int(np.argmin(nz)) if not nz.all() else len(cf)
        assert not nz[first_zero:].any(), \
            (budget, cf.tolist())
        assert int(nz.sum()) == int((cf > 0).sum())


def test_segpair_empty_scene():
    n, width, height = 32, 64, 48
    means = jnp.full((n, 3), 100.0)          # far outside every frustum
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))
    scales = jnp.full((n, 3), 0.01)
    opac = jnp.full((n,), 0.5)
    f = 55.0
    K = jnp.asarray([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]],
                    jnp.float32)
    vm = jnp.eye(4, dtype=jnp.float32)
    out = rasterize(means, quats, scales, opac, vm, K, width, height,
                    tile_size=16, capacity=64, dense_capacity=16,
                    overflow_tiles=4, pair_budget=1024,
                    pair_kernel="seg", backend="jax")
    np.testing.assert_allclose(np.asarray(out.image), 0.0)
