"""Headline benchmark: Mpix/s forward+backward at 2048^2 on one chip.

Pipeline per BASELINE.md: rasterize + interpolate + antialias, forward
and backward (L2 loss, gradients to vertex positions and colors),
sphere mesh, 2048x2048, minibatch 1. Prints ONE JSON line.

Methodology notes: inputs vary per iteration (rules out any
result-level caching in the execution stack) and each iteration forces
a host read of one gradient element (async dispatch on some backends
makes `block_until_ready` unreliable for timing). The first window is
discarded as warm-up.
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

    # Distinct inputs per iteration (epsilon-perturbed views).
    pcs = [pos_clip * jnp.float32(1.0 + i * 1e-6) for i in range(8)]

    # Warm up / compile, then a discarded warm window.
    g = step(pcs[0], col)
    float(g[0][0, 0, 0])
    for i in range(4):
        g = step(pcs[i % 8], col)
    float(g[0][0, 0, 0])

    iters = 16
    t0 = time.perf_counter()
    for i in range(iters):
        g = step(pcs[i % 8], col)
        float(g[0][0, 0, 0])  # force completion on async backends
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
