"""Mosaic lowering probes for the v5 pair-dense (segmented) compositor.

The v5 design (ops/pallas_segpair.py) walks 128-pair bricks with lanes =
pairs, a segmented Hillis-Steele transmittance scan, a per-brick one-hot
segment-sum matmul for tile images, and dynamic-row-offset DMA windows on
the [T, P] image / gradient arrays. Each of those has a Mosaic lowering
question this script answers on the REAL compile path (the support matrix
in docs/KERNELS.md §5.2 covers the v4 shapes, not these):

  P1  pltpu.roll, STATIC shift, axis 0, on [128, 256] f32   (pair-axis scan
      in the pairs-on-sublanes orientation)
  P2  pltpu.roll, STATIC shift, axis 1, on [256, 128] f32   (fallback
      orientation: pairs on lanes)
  P3  in-kernel one-hot [128,128] build (iota==iota) + dot_general with
      [128, 256] at HIGHEST                                  (segment sum)
  P4  DMA write of a [128, 256] VMEM window into [Tp, 256] HBM at a
      DYNAMIC (SMEM-prefetched) row offset                   (fwd output)
  P5  DMA read of a [128, 512] window from [Tp, 512] HBM at a dynamic row
      offset                                                 (bwd g/total)
  P6  (256, 128) -> (128, 256) in-kernel transpose           (orientation
      escape hatch)

Run:  JAX_PLATFORMS=axon PYTHONPATH=/root/.axon_site \
          python scripts/segpair_mosaic_probe.py
Each probe prints PASS/FAIL + max-abs error vs a NumPy oracle.
"""

import functools
import sys
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        err = fn()
        print(f"{name}: PASS (maxerr {err:.2e})")
    except Exception as e:
        print(f"{name}: FAIL — {type(e).__name__}: {str(e)[:300]}")
        traceback.print_exc(limit=2)


def probe_roll(axis, shape):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        o_ref[:] = x + 0.5 * pltpu.roll(x, 2, axis=axis)

    def go():
        x = np.arange(np.prod(shape), dtype=np.float32).reshape(shape)
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        )(jnp.asarray(x))
        ref = x + 0.5 * np.roll(x, 2, axis=axis)
        return float(np.max(np.abs(np.asarray(out) - ref)))
    return go


def probe_onehot():
    def kernel(r_ref, c_ref, o_ref):
        rloc = r_ref[:]                                    # [8,128] f32
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (128, 128), 0).astype(jnp.float32)
        onehot = (rows == rloc[0][None, :]).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            onehot, c_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    def go():
        rng = np.random.default_rng(0)
        rloc = np.repeat(np.arange(16), 8).astype(np.float32)  # seg ids
        r8 = np.broadcast_to(rloc, (8, 128)).copy()
        c = rng.normal(size=(128, 256)).astype(np.float32)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32),
        )(jnp.asarray(r8), jnp.asarray(c))
        onehot = (np.arange(128)[:, None] == rloc[None, :])
        ref = onehot.astype(np.float32) @ c
        return float(np.max(np.abs(np.asarray(out) - ref)))
    return go


def probe_dyn_write():
    TP, P = 512, 256

    def kernel(offs_ref, out_hbm, win, sem):
        b = pl.program_id(0)
        win[:] = (jnp.float32(b + 1)
                  + jax.lax.broadcasted_iota(jnp.int32, (128, P), 0
                                             ).astype(jnp.float32))
        off = pl.multiple_of(offs_ref[b], 8)       # 8-aligned by contract
        cp = pltpu.make_async_copy(win, out_hbm.at[pl.ds(off, 128)], sem)
        cp.start()
        cp.wait()

    def go():
        offs = jnp.asarray([40, 200], jnp.int32)   # 8-aligned, overlapping
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(2,),
                in_specs=[],
                out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
                scratch_shapes=[pltpu.VMEM((128, P), jnp.float32),
                                pltpu.SemaphoreType.DMA],
            ),
            out_shape=jax.ShapeDtypeStruct((TP, P), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(offs)
        out = np.asarray(out)
        ref_rows = np.arange(128, dtype=np.float32)[:, None]
        e1 = np.max(np.abs(out[40:168] - (1.0 + ref_rows)))
        e2 = np.max(np.abs(out[200:328] - (2.0 + ref_rows)))
        return float(max(e1, e2))
    return go


def probe_dyn_read():
    TP, W = 512, 512

    def kernel(offs_ref, src_hbm, o_ref, win, sem):
        b = pl.program_id(0)
        off = pl.multiple_of(offs_ref[b], 8)
        cp = pltpu.make_async_copy(src_hbm.at[pl.ds(off, 128)], win, sem)
        cp.start()
        cp.wait()
        o_ref[:] = win[:] * 2.0

    def go():
        rng = np.random.default_rng(1)
        src = rng.normal(size=(TP, W)).astype(np.float32)
        offs = jnp.asarray([88, 16], jnp.int32)    # 8-aligned
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(2,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
                out_specs=pl.BlockSpec((128, W), lambda b, *_: (b, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((128, W), jnp.float32),
                                pltpu.SemaphoreType.DMA],
            ),
            out_shape=jax.ShapeDtypeStruct((256, W), jnp.float32),
        )(offs, jnp.asarray(src))
        out = np.asarray(out)
        e1 = np.max(np.abs(out[:128] - 2 * src[88:216]))
        e2 = np.max(np.abs(out[128:] - 2 * src[16:144]))
        return float(max(e1, e2))
    return go


def probe_transpose():
    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.swapaxes(x_ref[:], 0, 1)

    def go():
        x = np.arange(256 * 128, dtype=np.float32).reshape(256, 128)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32),
        )(jnp.asarray(x))
        return float(np.max(np.abs(np.asarray(out) - x.T)))
    return go


def probe_vmem_dyn(rmw):
    SW, P = 264, 256

    def kernel(offs_ref, x_ref, o_ref, buf):
        b = pl.program_id(0)
        off = pl.multiple_of(offs_ref[b], 8)
        @pl.when(b == 0)
        def _():
            buf[:] = jnp.zeros_like(buf)
        if rmw:
            buf[pl.ds(off, 128)] = buf[pl.ds(off, 128)] + x_ref[0]
            o_ref[0] = buf[pl.ds(off, 128)]
        else:
            o_ref[0] = buf[pl.ds(off, 128)] * 0.0 + x_ref[0] * 2.0

    def go():
        rng = np.random.default_rng(5)
        x = rng.normal(size=(2, 128, P)).astype(np.float32)
        offs = jnp.asarray([8, 104], jnp.int32)
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(2,),
                in_specs=[pl.BlockSpec((1, 128, P), lambda b, *_: (b, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 128, P), lambda b, *_: (b, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((SW, P), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((2, 128, P), jnp.float32),
        )(offs, jnp.asarray(x))
        out = np.asarray(out)
        if rmw:
            buf = np.zeros((SW, P), np.float32)
            refs = []
            for b, off in enumerate([8, 104]):
                buf[off:off + 128] += x[b]
                refs.append(buf[off:off + 128].copy())
            return float(max(np.max(np.abs(out[b] - refs[b]))
                             for b in range(2)))
        return float(np.max(np.abs(out - 2 * x)))
    return go


def extra():
    run("P7a vmem-dyn-read", probe_vmem_dyn(False))
    run("P7b vmem-dyn-rmw-add", probe_vmem_dyn(True))


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    run("P1 roll-axis0-[128,256]", probe_roll(0, (128, 256)))
    run("P2 roll-axis1-[256,128]", probe_roll(1, (256, 128)))
    run("P3 onehot-matmul", probe_onehot())
    run("P4 dyn-offset-DMA-write", probe_dyn_write())
    run("P5 dyn-offset-DMA-read", probe_dyn_read())
    run("P6 transpose-256x128", probe_transpose())
    extra()
