"""Cumulative-stage timing of the headline pipeline (dev tool).

Times PREFIXES of the pipeline (raster; raster+interp; raster+interp+aa;
full grad step) with the window-difference method from bench.py, so each
stage's marginal cost — including the XLA glue between ops — is the
difference of adjacent lines. Complements profile_ops.py (which times
ops in isolation with per-iter host reads).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import _measure  # window-difference timing

from nvdiffrast_tpu.ops.rasterize import rasterize
from nvdiffrast_tpu.ops.interpolate import interpolate
from nvdiffrast_tpu.ops.antialias import antialias
from nvdiffrast_tpu.models import primitives
from nvdiffrast_tpu.utils import camera

RES = 2048


def line(name, dt):
    print(f"{name:44s} {dt*1e3:9.2f} ms   {RES*RES/1e6/dt:9.1f} Mpix/s",
          flush=True)


def main():
    pos_idx, vtxp, col_idx, _ = primitives.uv_sphere(32, 64)
    vtxc = (vtxp * 0.5 + 0.5).astype(np.float32)
    tri = jnp.asarray(pos_idx)
    cidx = jnp.asarray(col_idx)
    print(f"triangles: {pos_idx.shape[0]}, res: {RES}", flush=True)

    mvp = camera.projection(x=0.4) @ camera.translate(0, 0, -3.5)
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    pos_clip = jnp.asarray((posw @ mvp.T)[None].astype(np.float32))
    col = jnp.asarray(vtxc)
    pcs = [pos_clip * jnp.float32(1 + i * 1e-6) for i in range(8)]
    argsets = [(p, col) for p in pcs]

    # --- forward prefixes -------------------------------------------
    def f_rast(p, c):
        r, _ = rasterize(None, p, tri, (RES, RES), grad_db=False)
        return (jnp.sum(r),)

    def f_interp(p, c):
        r, _ = rasterize(None, p, tri, (RES, RES), grad_db=False)
        o, _ = interpolate(c[None], r, cidx)
        return (jnp.sum(o),)

    def f_aa(p, c):
        r, _ = rasterize(None, p, tri, (RES, RES), grad_db=False)
        o, _ = interpolate(c[None], r, cidx)
        o = antialias(o, r, p, tri)
        return (jnp.sum(o),)

    line("fwd: raster", _measure(jax.jit(f_rast), argsets))
    line("fwd: raster+interp", _measure(jax.jit(f_interp), argsets))
    line("fwd: raster+interp+aa", _measure(jax.jit(f_aa), argsets))

    # --- grad suffixes (full pipeline, loss after stage k) -----------
    def g_full(p, c):
        def loss(p, c):
            r, _ = rasterize(None, p, tri, (RES, RES), grad_db=False)
            o, _ = interpolate(c[None], r, cidx)
            o = antialias(o, r, p, tri)
            return jnp.mean(o ** 2)
        return jax.grad(loss, argnums=(0, 1))(p, c)

    def g_no_aa(p, c):
        def loss(p, c):
            r, _ = rasterize(None, p, tri, (RES, RES), grad_db=False)
            o, _ = interpolate(c[None], r, cidx)
            return jnp.mean(o ** 2)
        return jax.grad(loss, argnums=(0, 1))(p, c)

    def g_rast(p, c):
        def loss(p, c):
            r, _ = rasterize(None, p, tri, (RES, RES), grad_db=False)
            return jnp.mean(r[..., :3] ** 2)
        return jax.grad(loss, argnums=(0,))(p, c)

    line("f+b: raster", _measure(jax.jit(g_rast), argsets))
    line("f+b: raster+interp", _measure(jax.jit(g_no_aa), argsets))
    line("f+b: raster+interp+aa (STEP)", _measure(jax.jit(g_full), argsets))


if __name__ == "__main__":
    main()
