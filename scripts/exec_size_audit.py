"""Audit the compiled epoch-program size (remote-TPU upload cost).

Lowers + compiles the real ABC-shaped epoch function and reports the
serialized executable size plus the largest optimized-HLO computations,
so program-size bloat (wall-clock on remote-attached TPUs: ~1 MB/s upload)
can be attributed to specific ops.

Usage: python scripts/exec_size_audit.py [config_json]
"""

import collections
import re
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from edgegaussians_tpu.config import load_config, resolve_capacity
from edgegaussians_tpu.train import trainer


def main():
    cfg_path = sys.argv[1] if len(sys.argv) > 1 else \
        "configs/ABC_DexiNed.json"
    cfg = load_config(cfg_path)
    num_views, width, height = 50, 800, 800

    r = np.random.default_rng(0)
    seed_points = r.uniform(-0.5, 0.5, (2500, 3)).astype(np.float32)
    ts = trainer.init_train_state(seed_points, cfg)
    backend = "pallas" if jax.default_backend() == "tpu" else "jax"
    epoch_fn = trainer.make_epoch_fn(cfg, width, height, backend)

    images = jnp.zeros((num_views, height, width), jnp.float32)
    edge_masks = jnp.zeros((num_views, height, width), bool)
    viewmats = jnp.tile(jnp.eye(4, dtype=jnp.float32), (num_views, 1, 1))
    Ks = jnp.tile(jnp.array([[1111.0, 0, 400], [0, 1111.0, 400], [0, 0, 1]],
                            jnp.float32), (num_views, 1, 1))

    print(f"capacity={ts.gaussians.capacity} backend={backend} "
          f"cap_cfg={resolve_capacity(cfg.model, len(seed_points))}")
    lowered = epoch_fn.lower(ts, jnp.int32(0), images, edge_masks,
                             viewmats, Ks)
    shlo = lowered.as_text()
    print(f"StableHLO text: {len(shlo)/1e6:.1f} MB")
    compiled = lowered.compile()

    # serialized executable size (the thing uploaded to the TPU service)
    size = None
    try:
        ser = compiled.runtime_executable().serialize()
        size = len(ser)
    except Exception as e:
        print(f"runtime_executable().serialize() unavailable: {e}")
    if size is None:
        try:
            exe = compiled._executable.xla_executable
            size = len(exe.serialize())
        except Exception as e:
            print(f"xla_executable.serialize() unavailable: {e}")
    if size is not None:
        print(f"serialized executable: {size/1e6:.1f} MB")

    mem = compiled.memory_analysis()
    if mem is not None:
        print(f"memory: code={getattr(mem, 'generated_code_size_in_bytes', '?')}"
              f" argsize={getattr(mem, 'argument_size_in_bytes', '?')}"
              f" temp={getattr(mem, 'temp_size_in_bytes', '?')}")

    # biggest computations in the optimized HLO
    hlo = compiled.as_text()
    print(f"optimized HLO text: {len(hlo)/1e6:.1f} MB")
    sizes = collections.Counter()
    cur = None
    for line in hlo.splitlines():
        m = re.match(r"^(?:ENTRY )?%?([\w\.\-]+) .*\{", line)
        if m and not line.startswith(" "):
            cur = m.group(1)
        if cur:
            sizes[cur] += len(line)
    print("\nlargest HLO computations:")
    for name, sz in sizes.most_common(20):
        print(f"  {sz/1e3:10.0f} KB  {name}")

    # attribute fusions to source lines
    srcs = collections.Counter()
    for m in re.finditer(r'source_file="([^"]+)" source_line=(\d+)', hlo):
        srcs[f"{m.group(1)}:{m.group(2)}"] += 1
    print("\nmost-referenced source lines in HLO metadata:")
    for loc, cnt in srcs.most_common(15):
        print(f"  {cnt:6d}  {loc}")


if __name__ == "__main__":
    main()
