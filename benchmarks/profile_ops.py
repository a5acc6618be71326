"""Per-op forward/backward timing on the real chip (dev tool).

Times each stage of the headline pipeline separately so perf work can
target the bottleneck. Uses varying inputs + forced per-iteration host
reads (async dispatch makes block_until_ready unreliable for timing on
some backends). Not part of the test suite.
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


def timeit(name, fn, argsets, iters=8):
    out = fn(*argsets[0])
    first = jax.tree.leaves(out)[0]
    float(jnp.asarray(first).ravel()[0])
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*argsets[i % len(argsets)])
        float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
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
    pcs = [pos_clip * jnp.float32(1 + i * 1e-6) for i in range(4)]

    rast_f = jax.jit(lambda p: rasterize(None, p, tri, (RES, RES),
                                         grad_db=False)[0])
    rast = timeit("rasterize fwd (pallas)", rast_f, [(p,) for p in pcs])

    interp_f = jax.jit(lambda c, r: interpolate(c[None], r, cidx)[0])
    img = timeit("interpolate fwd", interp_f, [(col * s, rast) for s in
                                               (1.0, 0.99, 1.01, 0.98)])

    aa_f = jax.jit(lambda c, r, p: antialias(c, r, p, tri))
    timeit("antialias fwd", aa_f, [(img, rast, p) for p in pcs])

    def rast_loss(p):
        r, _ = rasterize(None, p, tri, (RES, RES), grad_db=False)
        return jnp.mean(r[..., :3] ** 2)
    timeit("rasterize fwd+bwd", jax.jit(jax.grad(rast_loss)),
           [(p,) for p in pcs])

    def interp_loss(c, r):
        o, _ = interpolate(c[None], r, cidx)
        return jnp.mean(o ** 2)
    timeit("interpolate fwd+bwd",
           jax.jit(jax.grad(interp_loss, argnums=(0, 1))),
           [(col * s, rast) for s in (1.0, 0.99, 1.01, 0.98)])

    def aa_loss(c, r, p):
        out = antialias(c, r, p, tri)
        return jnp.mean(out ** 2)
    timeit("antialias fwd+bwd",
           jax.jit(jax.grad(aa_loss, argnums=(0, 2))),
           [(img, rast, p) for p in pcs])

    def full_loss(p, c):
        r, _ = rasterize(None, p, tri, (RES, RES), grad_db=False)
        o, _ = interpolate(c[None], r, cidx)
        o = antialias(o, r, p, tri)
        return jnp.mean(o ** 2)
    timeit("FULL fwd+bwd", jax.jit(jax.grad(full_loss, argnums=(0, 1))),
           [(p, col) for p in pcs])


if __name__ == "__main__":
    main()
