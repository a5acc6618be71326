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

    # --- fused render_pipeline internals ------------------------------
    # The headline runs ops/pipeline.py (2 fwd kernels + 1 bwd kernel +
    # MXU scatters); time each piece so optimization targets the real
    # cost, not the composed-op proxy above.
    from nvdiffrast_tpu.ops.pipeline import (
        render_pipeline, _pipeline_fwd_core, _pipeline_bwd_core)
    from nvdiffrast_tpu.ops import pipeline_pallas as pp
    from nvdiffrast_tpu.ops.rasterize_pallas import rasterize_fused
    from nvdiffrast_tpu.ops.scatter import scatter_add_by_id
    from nvdiffrast_tpu.ops.topology import build_opposite_table

    op_table = build_opposite_table(tri)

    def fr_flat(p, c):
        ranges = jnp.broadcast_to(jnp.array([[0, tri.shape[0]]],
                                            jnp.int32), (1, 2))
        outs = rasterize_fused(p, tri, (RES, RES), ranges,
                               emit_db=False, flat=True)
        return (jnp.sum(outs[0]),)

    def f_pipe(p, c):
        img = render_pipeline(p, tri, c, (RES, RES), attr_idx=cidx)
        return (jnp.sum(img),)

    def g_pipe(p, c):
        def loss(p, c):
            img = render_pipeline(p, tri, c, (RES, RES), attr_idx=cidx)
            return jnp.mean(img ** 2)
        return jax.grad(loss, argnums=(0, 1))(p, c)

    line("fused: raster_fused flat (no db)", _measure(jax.jit(fr_flat),
                                                      argsets))
    line("fused: pipeline fwd", _measure(jax.jit(f_pipe), argsets))
    line("fused: pipeline STEP (bench line)", _measure(jax.jit(g_pipe),
                                                       argsets))

    # Isolate the bwd kernel + the two scatters on realistic inputs.
    A = col.shape[-1]
    T = tri.shape[0]
    N = RES * RES
    color, saved = jax.jit(
        lambda p, c: _pipeline_fwd_core(p, c, tri, cidx, op_table,
                                        (RES, RES), "pallas"))(pos_clip,
                                                               col)
    dy = (2.0 / color.size) * color

    def bwd_all(p, c, saved, dy):
        return _pipeline_bwd_core(p, c, tri, cidx, op_table, (RES, RES),
                                  "pallas", 1.0, saved, dy)

    line("fused: bwd total (kernel+scatters)",
         _measure(jax.jit(bwd_all), [(p, col, saved, dy) for p in pcs]))

    # Scatters alone (same id/value shapes as the real backward).
    b0f, b1f, idff, c0, res = saved
    tid0 = idff.astype(jnp.int32) - 1
    rid = jnp.where((tid0 >= 0) & (tid0 < T), tid0, 0)
    gvr = jnp.stack([b0f * (i + 1) for i in range(3 * A + 9)])
    rid2 = jnp.concatenate([rid, rid])
    gval2 = jnp.stack([jnp.concatenate([b0f, b1f]) * (i + 1)
                       for i in range(9)])

    def scats(rid, gvr, rid2, gval2):
        g1 = scatter_add_by_id(rid, gvr, T)
        g2 = scatter_add_by_id(rid2, gval2, T)
        return g1, g2

    line("fused: 2 grad scatters alone",
         _measure(jax.jit(scats),
                  [(rid, gvr * jnp.float32(1 + i * 1e-6),
                    rid2, gval2 * jnp.float32(1 + i * 1e-6))
                   for i in range(4)]))


if __name__ == "__main__":
    main()
