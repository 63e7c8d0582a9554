"""Compiled-TPU parity + quick timing for the Pallas rasterizer."""
import time
import numpy as np
import jax, jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")
from edgegaussians_tpu.ops.rasterize import rasterize

def make_scene(n, seed=0):
    r = np.random.default_rng(seed)
    means = r.uniform(-0.5, 0.5, (n, 3)).astype(np.float32); means[:, 2] += 2.0
    quats = r.normal(size=(n, 4)).astype(np.float32)
    scales = np.exp(r.uniform(np.log(0.003), np.log(0.03), (n, 3))).astype(np.float32)
    opac = r.uniform(0.2, 0.95, n).astype(np.float32)
    W = H = 800
    f = 1111.0
    K = np.array([[f, 0, W/2], [0, f, H/2], [0, 0, 1]], np.float32)
    return map(jnp.array, (means, quats, scales, opac, np.eye(4, dtype=np.float32), K)), W, H

args, W, H = make_scene(20000)
means, quats, scales, opac, viewmat, K = args

def render(backend):
    def f(m, q, s, o):
        out = rasterize(m, q, s, o, viewmat, K, W, H, tile_size=16,
                        capacity=512, backend=backend)
        return jnp.mean(jnp.abs(out.image - 0.5)), out.image
    return f

for backend in ["pallas", "jax"]:
    f = render(backend)
    g = jax.jit(jax.value_and_grad(f, argnums=(0,1,2,3), has_aux=True))
    t = time.time()
    (loss, img), grads = g(means, quats, scales, opac)
    jax.block_until_ready(grads)
    print(f"{backend}: compile+run {time.time()-t:.1f}s loss={float(loss):.5f}")
    t = time.time(); iters = 10
    for _ in range(iters):
        (loss, img), grads = g(means, quats, scales, opac)
    jax.block_until_ready(grads)
    dt = (time.time()-t)/iters
    px_s = W*H/dt
    print(f"{backend}: fwd+bwd {dt*1e3:.2f} ms/render  {px_s/1e6:.1f} Mpx/s")
    if backend == "pallas":
        img_p, grads_p = img, grads
    else:
        print("image allclose:", np.allclose(np.array(img_p), np.array(img), atol=2e-4))
        for gp, gj, name in zip(grads_p, grads, ["means","quats","scales","opac"]):
            d = float(jnp.max(jnp.abs(gp - gj))); m = float(jnp.max(jnp.abs(gj)))
            print(f"grad {name}: maxabsdiff={d:.3e} maxref={m:.3e}")
