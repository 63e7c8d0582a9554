"""Probe: pass count of f32 matmul precisions on the current TPU.

Times a large f32 dot at DEFAULT / HIGH / HIGHEST to reveal how many
bf16 MXU passes each lowers to on this chip+compiler (the v5 kernels'
one-hot segment matmuls have an exactly-bf16 0/1 operand — if a lower
precision is exact enough AND faster, the dominant kernel MXU term
shrinks). Every iteration perturbs the operand with a distinct scalar
so no two dispatches are identical (the axon service memoizes pure
dispatch repeats).

Usage: JAX_PLATFORMS=axon PYTHONPATH=/root/.axon_site \
           python scripts/precision_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PRECS = {"default": jax.lax.Precision.DEFAULT,
         "high": jax.lax.Precision.HIGH,
         "highest": jax.lax.Precision.HIGHEST}


def main():
    m = k = n = 4096
    flop = 2 * m * k * n
    r = np.random.default_rng(0)
    a = jnp.asarray(r.normal(size=(m, k)), jnp.float32)
    b = jnp.asarray(r.normal(size=(k, n)), jnp.float32)

    for prec, p in PRECS.items():
        @jax.jit
        def f(a, b, t, p=p):
            return jnp.sum(jnp.dot(a + t, b, precision=p) ** 2)

        for i in range(3):
            jax.block_until_ready(f(a, b, jnp.float32(i) * 1e-7))
        iters = 30
        t0 = time.time()
        for i in range(iters):
            out = f(a, b, jnp.float32(i + 7) * 1e-7)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        print(f"{prec:8s}: {dt * 1e3:7.3f} ms  "
              f"{flop / dt / 1e12:6.1f} TFLOP/s")

    # accuracy for a ONE-HOT left operand (segment-sum gather pattern)
    idx = jnp.asarray(r.integers(0, 136, 128), jnp.int32)
    onehot = (jnp.arange(136)[:, None] == idx[None, :]).astype(jnp.float32)
    vals = jnp.asarray(r.normal(size=(128, 256)), jnp.float32)
    ref = np.zeros((136, 256), np.float32)
    np.add.at(ref, np.asarray(idx), np.asarray(vals))
    scale = np.max(np.abs(ref))
    for prec, p in PRECS.items():
        out = np.asarray(jnp.dot(onehot, vals, precision=p,
                                 preferred_element_type=jnp.float32))
        err = np.max(np.abs(out - ref)) / scale
        print(f"one-hot segsum {prec:8s}: max err {err:.2e} "
              f"(rel to max |ref| = {scale:.3f})")


if __name__ == "__main__":
    main()
