"""Standalone timings of the textured pipeline's backward pieces
(dev tool): slim AA bwd (XLA), interp+raster K2 kernel, fused grad
scatter, and the stash uv math — to locate glue not accounted for by
the component estimates. Window-difference timing, random inputs of
bench shape.

Run: PYTHONPATH=.:~/.axon_site python benchmarks/profile_ptexbwd.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import _measure

from nvdiffrast_tpu.models import primitives
from nvdiffrast_tpu.utils import camera

RES = 2048


def main():
    from nvdiffrast_tpu.ops import coord
    from nvdiffrast_tpu.ops import pipeline_pallas as pp
    from nvdiffrast_tpu.ops import pipeline_tex_pallas as ptp
    from nvdiffrast_tpu.ops.antialias import _build_tables
    from nvdiffrast_tpu.ops.pipeline import _attr_table
    from nvdiffrast_tpu.ops.rasterize_pallas import rasterize_fused
    from nvdiffrast_tpu.ops.topology import build_opposite_table

    pos_idx, vtxp, col_idx, _ = primitives.uv_sphere(32, 64)
    tri = jnp.asarray(pos_idx)
    cidx = jnp.asarray(col_idx)
    mvp = camera.projection(x=0.4) @ camera.translate(0, 0, -3.5)
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    pos = jnp.asarray((posw @ mvp.T)[None].astype(np.float32))
    uvv = jnp.asarray(np.random.RandomState(0).rand(
        vtxp.shape[0], 2).astype(np.float32))
    op_table = build_opposite_table(tri)

    B, H, W = 1, RES, RES
    N = B * H * W
    T = tri.shape[0]
    C = 3
    rng = np.random.RandomState(1)

    ranges = jnp.broadcast_to(jnp.array([[0, T]], jnp.int32), (B, 2))
    outs = rasterize_fused(pos, tri, (H, W), ranges, emit_db=True,
                           flat=True)
    u, v, zw, idf, d0, d1, d2, d3 = (
        jnp.asarray(a).reshape(N) for a in outs[:8])
    db4 = jnp.stack([d0, d1, d2, d3])
    atbl, _ = _attr_table(uvv, cidx, True, B, T)
    _, vtbl, R, _ = _build_tables(pos, tri, op_table, True, H, W)
    pix = jnp.arange(N, dtype=jnp.int32)
    xs, xo, ys, yo = coord.pixel_scale_offset(H, W)
    fxc = (pix % W).astype(jnp.float32) * xs + xo
    fyc = ((pix // W) % H).astype(jnp.float32) * ys + yo

    gus = [jnp.asarray(rng.randn(N).astype(np.float32)) for _ in range(3)]
    gv_ = jnp.asarray(rng.randn(N).astype(np.float32))
    gda4 = jnp.asarray(rng.randn(4, N).astype(np.float32) * 1e-3)

    def k2(gu):
        out15 = ptp.interp_raster_bwd_tex(
            atbl, vtbl, idf, u, v, gu, gv_, gda4, db4, None, fxc, fyc,
            T, 2.0 / W, 2.0 / H)
        return (jnp.sum(out15[:, ::97]),)

    f = jax.jit(k2)
    dt = _measure(f, [(g,) for g in gus]) * 1e3
    print(f"K2 interp+raster bwd kernel   {dt:7.2f} ms", flush=True)

    # grad scatter with synthetic slim streams
    tid0 = coord.float_to_triidx(idf) - 1
    valid = (tid0 >= 0) & (tid0 < T)
    rid0v = jnp.where(valid, tid0, 0)
    gs11 = jnp.asarray(rng.randn(11, N).astype(np.float32))
    gs11 = gs11 * valid[None].astype(jnp.float32)
    dd2 = jnp.asarray((rng.rand(2, N) < 0.01).astype(np.float32)
                      * rng.randn(2, N).astype(np.float32))
    rid2 = jnp.stack([rid0v, rid0v])
    ax2 = jnp.zeros((2, N), jnp.float32)
    da4c = jnp.asarray(rng.randn(4, N).astype(np.float32)
                       * valid[None].astype(np.float32))

    def gsc(gs):
        gt, gaa = pp.pipeline_grad_scatter(
            rid0v, gs, dd2, rid2, u, v, ax2[0], ax2[1], vtbl[:, :R], 2,
            R, W, H, da4=da4c)
        return (jnp.sum(gt) + jnp.sum(gaa),)

    gss = [gs11 * jnp.float32(1 + i * 1e-6) for i in range(3)]
    f = jax.jit(gsc)
    dt = _measure(f, [(g,) for g in gss]) * 1e3
    print(f"pipeline_grad_scatter (da4)   {dt:7.2f} ms", flush=True)

    # slim AA bwd (XLA): random residuals with realistic sparsity
    al = (rng.rand(2, N) < 0.02).astype(np.float32) * 0.3
    aa_res_t = []
    # build padded tile-order residuals the way the fwd returns them
    from nvdiffrast_tpu.ops.texture_pallas import _tile_order
    for d in range(2):
        a = _tile_order(jnp.asarray(al[d]), B, H, W, fill=0.0)
        x = _tile_order(jnp.zeros((N,), jnp.float32), B, H, W, fill=0.0)
        rows_p = a.shape[0]
        aa_res_t += [a, x]
    dy_cm = jnp.asarray(rng.randn(C, N).astype(np.float32))
    c0_cm = jnp.asarray(rng.rand(C, N).astype(np.float32))

    def aaslim(dy):
        gc, dd, rid, ax = ptp.aa_bwd_slim_cols(dy, c0_cm, idf,
                                               tuple(aa_res_t), T, B, H, W)
        return (jnp.sum(gc[:, ::97]) + jnp.sum(dd[:, ::97]),)

    dys = [dy_cm * jnp.float32(1 + i * 1e-6) for i in range(3)]
    f = jax.jit(aaslim)
    dt = _measure(f, [(g,) for g in dys]) * 1e3
    print(f"aa_bwd_slim_cols (XLA)        {dt:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
