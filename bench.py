"""Headline benchmark: Mpix/s forward+backward at 2048^2 on one chip.

Pipeline per BASELINE.md: rasterize + interpolate + antialias, forward
and backward (L2 loss, gradients to vertex positions and colors),
sphere mesh, 2048x2048, minibatch 1. Prints ONE JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nvdiffrast_tpu.ops.rasterize import rasterize
    from nvdiffrast_tpu.ops.interpolate import interpolate
    from nvdiffrast_tpu.ops.antialias import antialias
    from nvdiffrast_tpu.models import primitives
    from nvdiffrast_tpu.utils import camera

    RES = 2048
    pos_idx, vtxp, col_idx, _ = primitives.uv_sphere(32, 64)
    vtxc = (vtxp * 0.5 + 0.5).astype(np.float32)
    tri = jnp.asarray(pos_idx)
    cidx = jnp.asarray(col_idx)

    mvp = camera.projection(x=0.4) @ camera.translate(0, 0, -3.5)
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    pos_clip = jnp.asarray((posw @ mvp.T)[None].astype(np.float32))
    col = jnp.asarray(vtxc)

    def loss_fn(pos_clip, col):
        rast, _ = rasterize(None, pos_clip, tri, (RES, RES), grad_db=False)
        img, _ = interpolate(col[None], rast, cidx)
        img = antialias(img, rast, pos_clip, tri)
        return jnp.mean(img ** 2)

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))

    # Warm up / compile.
    g = step(pos_clip, col)
    jax.block_until_ready(g)

    # Time one iteration to choose the measurement count.
    t0 = time.perf_counter()
    jax.block_until_ready(step(pos_clip, col))
    t_iter = time.perf_counter() - t0
    iters = max(3, min(50, int(10.0 / max(t_iter, 1e-3))))

    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(pos_clip, col)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / iters

    mpix_s = (RES * RES / 1e6) / dt
    print(json.dumps({
        "metric": "mpix_per_s_fwd_bwd_2048_raster_interp_aa",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
