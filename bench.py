"""Headline benchmark: Mpix/s forward+backward at 2048^2 on one chip.

Pipeline per BASELINE.md: rasterize + interpolate + antialias, forward
and backward (L2 loss, gradients to vertex positions and colors),
sphere mesh, 2048x2048, minibatch 1. Prints ONE JSON line.

Methodology notes: inputs vary per iteration (rules out any
result-level caching in the execution stack). Device throughput is the
*difference* of two timing windows (16 vs 48 iterations, each ending
with a forced host read): the subtraction cancels both the constant
dispatch-queue slack and the host<->device round-trip latency, which on
tunneled backends is tens of ms and would otherwise bias the result.
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

    def window(iters):
        t0 = time.perf_counter()
        for i in range(iters):
            g = step(pcs[i % 8], col)
        float(g[0][0, 0, 0])  # force completion on async backends
        return time.perf_counter() - t0

    n1, n2 = 16, 48
    t1 = window(n1)
    t2 = window(n2)
    dt = max(t2 - t1, 1e-9) / (n2 - n1)

    mpix_s = (RES * RES / 1e6) / dt
    print(json.dumps({
        "metric": "mpix_per_s_fwd_bwd_2048_raster_interp_aa",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
