"""Minimal repro: why the Pallas shard_maps run check_vma=False.

VERDICT r3 item 5 asked to either run the production Pallas path under
strict varying-manual-axes checking or commit a reproducer of why JAX
cannot. This is the reproducer, distilled to one kernel (runs on the
CPU mesh — vma checking is trace-time):

Inside a ``shard_map(check_vma=True)``, a Pallas kernel body's ref
LOADS carry the operand's vma, but primitive RESULTS drop it — so any
``fori_loop``/``while_loop`` whose carry mixes ref-derived values with
fresh constants trips "mismatched varying manual axes", and any
``lax.cond`` whose branches return ref-derived vs promoted values trips
"cond branches must have equal output types". Promoting the fresh
values with ``ops.vma.match_vma`` (as pallas_raster_v2 does) fixes the
carry INPUT but not the dropped vma on branch OUTPUTS — re-verified on
jax 0.9 / v5e 2026-08-21: forcing check_vma=True onto the production
sharded pallas program still fails with the cond-branch mismatch.

Consequence: `ops.vma.shard_map_for_backend` keeps check_vma=True for
the XLA backends (the typed defense against the round-2 4x-psum class)
and falls back to unchecked for Pallas call sites; hardware correctness
of the Pallas path is instead pinned by the per-render XLA-vs-Pallas
sharded parity test (tests/test_train_sharded.py) plus the
EG_TPU_TESTS hardware suite.

Usage: PYTHONPATH=. python scripts/vma_pallas_repro.py
Expected output: check_vma=False OK, check_vma=True FAIL (scan carry
mismatch).
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=4")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh, PartitionSpec as P

    from edgegaussians_tpu.ops import vma

    def kernel(x_ref, o_ref):
        # loop carry mixes a ref-derived value (vma = operand's) with a
        # fresh zeros constant (no vma): strict-vma rejects the carry
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
    results = {}
    for check in (False, True):
        try:
            g = jax.shard_map(f, mesh=mesh, in_specs=P("tiles"),
                              out_specs=P(), check_vma=check)
            out = jax.jit(g)(x)
            results[check] = f"OK sum={float(out.sum()):.1f}"
        except Exception as e:
            results[check] = (f"FAIL {type(e).__name__}: "
                              f"{str(e).splitlines()[0][:120]}")
        print(f"check_vma={check}: {results[check]}")
    assert results[False].startswith("OK")
    assert results[True].startswith("FAIL"), (
        "strict-vma now ACCEPTS pallas bodies — flip "
        "ops.vma.shard_map_for_backend to checked mode for pallas!")


if __name__ == "__main__":
    main()
