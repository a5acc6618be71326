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
import sys
import time

import numpy as np


def _measure(step, argsets):
    """Window-difference throughput of `step` over varying inputs."""
    g = step(*argsets[0])
    float(np.asarray(g[0]).ravel()[0])
    for i in range(4):
        g = step(*argsets[i % len(argsets)])
    float(np.asarray(g[0]).ravel()[0])

    def window(iters):
        t0 = time.perf_counter()
        for i in range(iters):
            g = step(*argsets[i % len(argsets)])
        float(np.asarray(g[0]).ravel()[0])  # force completion (async)
        return time.perf_counter() - t0

    n1, n2 = 16, 48
    t1 = window(n1)
    t2 = window(n2)
    return max(t2 - t1, 1e-9) / (n2 - n1)


def main(with_texture=True):
    import jax
    import jax.numpy as jnp

    from nvdiffrast_tpu.ops.rasterize import rasterize
    from nvdiffrast_tpu.ops.interpolate import interpolate
    from nvdiffrast_tpu.ops.texture import texture
    from nvdiffrast_tpu.ops.antialias import antialias
    from nvdiffrast_tpu.ops.pipeline import render_pipeline
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
        # Fused raster+interp+AA pipeline (ops/pipeline.py) — the same
        # computation as the composed rasterize/interpolate/antialias
        # ops (bit-parity tested in tests/test_pipeline.py).
        img = render_pipeline(pos_clip, tri, col, (RES, RES),
                              attr_idx=cidx)
        return jnp.mean(img ** 2)

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))

    # Distinct inputs per iteration (epsilon-perturbed views).
    pcs = [pos_clip * jnp.float32(1.0 + i * 1e-6) for i in range(8)]
    dt = _measure(step, [(p, col) for p in pcs])
    mpix_s = (RES * RES / 1e6) / dt
    print(json.dumps({
        "metric": "mpix_per_s_fwd_bwd_2048_raster_interp_aa",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s",
        "vs_baseline": None,
    }))

    if not with_texture:
        return

    # Secondary line: the full 4-op pipeline with trilinear texturing
    # (earth.py-style): rasterize(grad_db) + interpolate(uv + uv_da) +
    # texture(mip) + antialias, gradients to pos and texture.
    rng = np.random.RandomState(0)
    tex = jnp.asarray(rng.rand(1, 512, 512, 3).astype(np.float32))
    # Spherical uv from the sphere parameterization.
    uvw = np.stack([np.arctan2(vtxp[:, 0], vtxp[:, 2]) / (2 * np.pi) + 0.5,
                    np.arccos(np.clip(vtxp[:, 1], -1, 1)) / np.pi],
                   axis=1).astype(np.float32)
    uvv = jnp.asarray(uvw)

    def tex_loss(pos_clip, tex):
        # Fused flat-boundary textured pipeline (ops/pipeline_tex.py):
        # same computation as rasterize(grad_db) + interpolate(uv +
        # uv_da) + texture(mip) + antialias, parity-tested in
        # tests/test_pipeline_tex.py.
        from nvdiffrast_tpu.ops.pipeline_tex import render_pipeline_textured
        img = render_pipeline_textured(pos_clip, tri, uvv, tex, (RES, RES),
                                       uv_tri=cidx)
        return jnp.mean(img ** 2)

    tstep = jax.jit(jax.grad(tex_loss, argnums=(0, 1)))
    dt = _measure(tstep, [(p, tex) for p in pcs])
    mpix_s = (RES * RES / 1e6) / dt
    print(json.dumps({
        "metric": "mpix_per_s_fwd_bwd_2048_raster_interp_tex_aa",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    # The textured 4-op line is emitted by default (second JSON line)
    # so the driver's BENCH record tracks both; --no-texture skips it.
    main(with_texture="--no-texture" not in sys.argv[1:])
