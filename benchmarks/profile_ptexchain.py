"""Stage split of the slim-vjp textured pipeline at 2048^2 (dev tool).

Forward stages cumulatively (internal kernels, same calls as
pipeline_tex._ptex_fwd_core), then grad configs of the public
render_pipeline_textured. Window-difference timing.

Run: PYTHONPATH=.:~/.axon_site python benchmarks/profile_ptexchain.py
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
    from nvdiffrast_tpu.ops import antialias_pallas as ap
    from nvdiffrast_tpu.ops import interpolate_pallas as ip
    from nvdiffrast_tpu.ops import texture_pallas as tp
    from nvdiffrast_tpu.ops.antialias import _build_tables
    from nvdiffrast_tpu.ops.coord import float_to_triidx
    from nvdiffrast_tpu.ops.pipeline_tex import render_pipeline_textured
    from nvdiffrast_tpu.ops.rasterize_pallas import rasterize_fused
    from nvdiffrast_tpu.ops.texture import (_mip_level_from_footprint_cols,
                                            _pack_pyramid, _static_meta,
                                            build_mip_stack)
    from nvdiffrast_tpu.ops.topology import build_opposite_table

    pos_idx, vtxp, col_idx, _ = primitives.uv_sphere(32, 64)
    tri = jnp.asarray(pos_idx)
    cidx = jnp.asarray(col_idx)
    mvp = camera.projection(x=0.4) @ camera.translate(0, 0, -3.5)
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    pos_clip = jnp.asarray((posw @ mvp.T)[None].astype(np.float32))
    rng = np.random.RandomState(0)
    tex = jnp.asarray(rng.rand(1, 512, 512, 3).astype(np.float32))
    uvw = np.stack([np.arctan2(vtxp[:, 0], vtxp[:, 2]) / (2 * np.pi) + 0.5,
                    np.arccos(np.clip(vtxp[:, 1], -1, 1)) / np.pi],
                   axis=1).astype(np.float32)
    uvv = jnp.asarray(uvw)
    pcs = [pos_clip * jnp.float32(1 + i * 1e-6) for i in range(8)]
    op_table = build_opposite_table(tri)

    B, H, W = 1, RES, RES
    N = B * H * W
    T = tri.shape[0]

    def fwd_stage(level, p, tex):
        levels = [tex] + build_mip_stack(tex, -1, False)
        smeta, _ = _static_meta(levels)
        L = len(levels)
        flat, _ = _pack_pyramid(levels, False)
        ranges = jnp.broadcast_to(jnp.array([[0, T]], jnp.int32), (B, 2))
        outs = rasterize_fused(p, tri, (H, W), ranges, emit_db=True,
                               flat=True)
        u, v, zw, idf, d0, d1, d2, d3 = (a.reshape(N) for a in outs[:8])
        if level == 0:
            return sum(jnp.sum(a[::97]) for a in (u, v, zw, idf, d0))
        idbuf = float_to_triidx(idf) - 1
        valid = (idbuf >= 0) & (idbuf < T)
        a2d = uvv
        tbl = a2d[cidx].reshape(-1, 6).T
        tbl = jnp.concatenate([tbl, jnp.zeros((6, 1), jnp.float32)], 1)
        rid_u = jnp.where(valid, idbuf, T)
        b0 = jnp.where(valid, u, 0.0)
        b1 = jnp.where(valid, v, 0.0)
        b2 = jnp.where(valid, 1.0 - u - v, 0.0)
        db_cols = tuple(jnp.where(valid, c, 0.0)
                        for c in (d0, d1, d2, d3))
        uv_cm, da_cm = ip.interp_forward_fused(
            tbl, rid_u, b0, b1, b2, valid, db_cols, 2, (0, 1))
        if level == 1:
            return jnp.sum(uv_cm[:, ::97]) + jnp.sum(da_cm[:, ::97])
        tz = jnp.zeros((N,), jnp.int32)
        flevel = jnp.clip(
            _mip_level_from_footprint_cols(
                da_cm[0], da_cm[1], da_cm[2], da_cm[3],
                jnp.float32(512), jnp.float32(512)), 0.0, float(L - 1))
        out_cm, _saved = tp._sample_fwd(
            flat.T, uv_cm[0], uv_cm[1], flevel, tz, smeta, L, "wrap",
            "linear-mipmap-linear", (B, H, W), False)
        if level == 2:
            return jnp.sum(out_cm[:, ::97])
        ftable, _, _R, _T = _build_tables(p, tri, op_table, True, H, W)
        img, _res = ap.aa_forward_fused_cols(
            out_cm, idf, zw, ftable, T, True, (B, H, W, 3))
        return jnp.sum(img[:, ::97, ::97])

    names = ["raster(db)", "+interp", "+tex fwd_stash", "+AA fwd"]
    prev = 0.0
    for lv in range(4):
        f = jax.jit(lambda p, t, lv=lv: (fwd_stage(lv, p, t),))
        dt = _measure(f, [(p, tex) for p in pcs]) * 1e3
        print(f"fwd {names[lv]:18s} cum {dt:7.2f}  marg {dt - prev:7.2f}",
              flush=True)
        prev = dt
    fwd_full = prev

    def loss(p, t):
        img = render_pipeline_textured(p, tri, uvv, t, (RES, RES),
                                       uv_tri=cidx)
        return jnp.mean(img ** 2)

    for name, argnums in (("grad wrt pos", 0), ("grad wrt tex", 1),
                          ("grad wrt both", (0, 1))):
        f = jax.jit(jax.grad(loss, argnums=argnums))
        dt = _measure(f, [(p, tex) for p in pcs]) * 1e3
        print(f"{name:22s} {dt:7.2f}  (bwd marg {dt - fwd_full:7.2f})",
              flush=True)


if __name__ == "__main__":
    main()
