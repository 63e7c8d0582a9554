"""Parity tests for the pair-domain DMA compositor (ops/pallas_pair.py).

The pair path must reproduce the dense single-level rasterizer exactly
(same compositing semantics, no truncation in these scenes): forward
image, all four packed-row gradient groups, and the absgrad sink
cotangent. Runs the kernels in interpret mode on CPU; the compiled-TPU
check lives in tests/test_tpu_hardware.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from edgegaussians_tpu.ops import tiles as tiles_mod
from edgegaussians_tpu.ops.rasterize import rasterize
from edgegaussians_tpu.ops.tiles import step_over_pairs


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


def test_step_over_pairs():
    pos = jnp.asarray([0, 0, 3, 3, 7, 9], jnp.int32)   # 5 segments
    vals = jnp.asarray([2.0, 5.0, 5.0, 1.0, 0.5])
    out = np.asarray(step_over_pairs(pos, vals, 12))
    # seg0 empty, seg1 [0,3)=5, seg2 empty, seg3 [3,7)=1, seg4 [7,9)=0.5,
    # past the end = 0
    np.testing.assert_allclose(
        out, [5, 5, 5, 1, 1, 1, 1, 0.5, 0.5, 0, 0, 0])


def _render_both(width, height, args, budget=8192, cap=256):
    means, quats, scales, opac, vm, K = args

    def loss(fn_kwargs):
        def f(m, q, s, o, sink):
            out = rasterize(m, q, s, o, vm, K, width, height,
                            tile_size=16, absgrad_sink=sink, **fn_kwargs)
            img = jnp.clip(out.image, 0, 1)
            # nonuniform cotangent so gradients are exercised everywhere
            w = (jnp.arange(img.size, dtype=jnp.float32)
                 .reshape(img.shape) % 7) / 7.0 + 0.3
            return jnp.sum(img * w), out
        return f

    sink0 = jnp.zeros((means.shape[0], 2), jnp.float32)
    dense = loss(dict(capacity=cap, backend="jax"))
    pair = loss(dict(capacity=cap, dense_capacity=32, overflow_tiles=8,
                     pair_budget=budget, pair_kernel=True,
                     backend="jax"))
    (l1, out1), g1 = jax.value_and_grad(dense, argnums=(0, 1, 2, 3, 4),
                                        has_aux=True)(
        means, quats, scales, opac, sink0)
    (l2, out2), g2 = jax.value_and_grad(pair, argnums=(0, 1, 2, 3, 4),
                                        has_aux=True)(
        means, quats, scales, opac, sink0)
    return (l1, out1, g1), (l2, out2, g2)


def test_pair_kernel_matches_dense_forward_and_grads():
    *args, width, height = _scene()
    (l1, out1, g1), (l2, out2, g2) = _render_both(width, height, args)

    assert int(out2.num_pairs) > 0
    np.testing.assert_allclose(np.asarray(out2.image),
                               np.asarray(out1.image), atol=2e-5)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    names = ["means", "quats", "scales", "opacities", "absgrad"]
    for a, b, name in zip(g1, g2, names):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-4, rtol=2e-3,
                                   err_msg=f"pair-kernel grads {name}")


def test_pair_kernel_respects_capacity_truncation():
    """With a tiny per-tile cap the pair path composites only the nearest
    cap Gaussians per tile — matching a dense render at the same cap."""
    *args, width, height = _scene(n=400, seed=3)
    means, quats, scales, opac, vm, K = args

    def render(kwargs):
        out = rasterize(means, quats, scales, opac, vm, K, width, height,
                        tile_size=16, **kwargs)
        return out

    dense = render(dict(capacity=8, backend="jax"))
    pair = render(dict(capacity=8, dense_capacity=4, overflow_tiles=4,
                       pair_budget=8192, pair_kernel=True, backend="jax"))
    np.testing.assert_allclose(np.asarray(pair.image),
                               np.asarray(dense.image), atol=2e-5)


def test_pair_bins_frame_order_tables():
    *args, width, height = _scene(n=128, seed=1)
    means, quats, scales, opac, vm, K = args
    from edgegaussians_tpu.ops.projection import project_gaussians
    proj = project_gaussians(means, quats, scales, opac, vm, K,
                             width, height)
    B = 4096
    pb = tiles_mod.bin_pairs_frame_order(proj, width, height, 16, 64, B)
    T = tiles_mod.tile_grid(width, height, 16)[2]
    s_f = np.asarray(pb.s_f)
    counts_f = np.asarray(pb.counts_f)
    assert s_f[0] == 0 and s_f.shape[0] == T + 1
    assert (np.diff(s_f) == counts_f).all()
    # occupancy descending within the budget
    assert (counts_f[:-1] >= counts_f[1:] - 0).any()
    # every valid pair's rank is a real gaussian
    pv = np.asarray(pb.pair_valid)
    assert pv.sum() == s_f[-1] == min(int(pb.num_pairs), pv.sum())
    # frame rows partition the valid pairs
    assert int(pb.num_pairs) == int(np.asarray(pb.counts).sum())


def test_pair_bins_block_alignment_pads():
    """With block_tiles set, every block of TB frame rows starts at a
    128-pair brick boundary, and counts_f excludes the pad pairs (pads
    carry ranks above every real rank and pair_valid=False)."""
    *args, width, height = _scene(n=500, seed=7)
    means, quats, scales, opac, vm, K = args
    from edgegaussians_tpu.ops.projection import project_gaussians
    proj = project_gaussians(means, quats, scales, opac, vm, K,
                             width, height)
    TB = 4
    pb = tiles_mod.bin_pairs_frame_order(proj, width, height, 16, 64,
                                         4096, block_tiles=TB)
    T = tiles_mod.tile_grid(width, height, 16)[2]
    s_f = np.asarray(pb.s_f)
    counts_f = np.asarray(pb.counts_f)
    # block starts brick-aligned
    for b0 in range(0, T, TB):
        assert s_f[b0] % 128 == 0, (b0, s_f[b0])
    # pads only on block-last rows; counts_f = run length - pads there
    run = np.diff(s_f)
    pads = run - counts_f
    assert (pads >= 0).all()
    non_last = np.ones(T, bool)
    non_last[TB - 1::TB] = False
    assert (pads[non_last] == 0).all()
    # pad pairs are invalid; real pairs valid
    pv = np.asarray(pb.pair_valid)
    assert pv.sum() == counts_f.sum()
    # composited pairs reproduce the dense render (covered by the parity
    # tests); here just check ranks of valid pairs are in range
    rk = np.asarray(pb.pair_ranks)
    assert (rk[pv] < 500).all()
