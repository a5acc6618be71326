"""Per-op forward/backward timing on the real chip (dev tool).

Times each stage of the headline pipeline separately so perf work can
target the bottleneck. Not part of the test suite.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from nvdiffrast_tpu.ops.rasterize import rasterize
from nvdiffrast_tpu.ops.interpolate import interpolate
from nvdiffrast_tpu.ops.antialias import antialias
from nvdiffrast_tpu.models import primitives
from nvdiffrast_tpu.utils import camera

RES = 2048


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.2f} ms   {RES*RES/1e6/dt:9.1f} Mpix/s")
    return out


def main():
    pos_idx, vtxp, col_idx, _ = primitives.uv_sphere(32, 64)
    vtxc = (vtxp * 0.5 + 0.5).astype(np.float32)
    tri = jnp.asarray(pos_idx)
    cidx = jnp.asarray(col_idx)
    print(f"triangles: {pos_idx.shape[0]}, res: {RES}")

    mvp = camera.projection(x=0.4) @ camera.translate(0, 0, -3.5)
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    pos_clip = jnp.asarray((posw @ mvp.T)[None].astype(np.float32))
    col = jnp.asarray(vtxc)

    # --- forward stages ---
    rast_f = jax.jit(lambda p: rasterize(None, p, tri, (RES, RES),
                                         grad_db=False)[0])
    rast = timeit("rasterize fwd (pallas)", rast_f, pos_clip)

    rast_fx = jax.jit(lambda p: rasterize(None, p, tri, (RES, RES),
                                          grad_db=False, impl="xla")[0])
    timeit("rasterize fwd (xla scan)", rast_fx, pos_clip)

    interp_f = jax.jit(lambda c, r: interpolate(c[None], r, cidx)[0])
    img = timeit("interpolate fwd", interp_f, col, rast)

    aa_f = jax.jit(lambda c, r, p: antialias(c, r, p, tri))
    timeit("antialias fwd", aa_f, img, rast, pos_clip)

    # --- backward stages (isolated via stop_gradient chains) ---
    def rast_loss(p):
        r, _ = rasterize(None, p, tri, (RES, RES), grad_db=False)
        return jnp.mean(r[..., :3] ** 2)
    timeit("rasterize fwd+bwd", jax.jit(jax.grad(rast_loss)), pos_clip)

    def interp_loss(c, r):
        img, _ = interpolate(c[None], r, cidx)
        return jnp.mean(img ** 2)
    timeit("interpolate fwd+bwd", jax.jit(jax.grad(interp_loss)), col, rast)

    def aa_loss(c, r, p):
        out = antialias(c, r, p, tri)
        return jnp.mean(out ** 2)
    timeit("antialias fwd+bwd",
           jax.jit(jax.grad(aa_loss, argnums=(0, 2))), img, rast, pos_clip)

    def full_loss(p, c):
        r, _ = rasterize(None, p, tri, (RES, RES), grad_db=False)
        img, _ = interpolate(c[None], r, cidx)
        img = antialias(img, r, p, tri)
        return jnp.mean(img ** 2)
    timeit("FULL fwd+bwd", jax.jit(jax.grad(full_loss, argnums=(0, 1))),
           pos_clip, col)


if __name__ == "__main__":
    main()
