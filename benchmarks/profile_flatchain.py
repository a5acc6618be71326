"""Stage-marginal fwd+bwd anatomy of the FLAT textured chain.

bench.py's textured line runs pipeline_tex.render_pipeline_textured =
rasterize_flat + interpolate_flat + sample_fused + antialias_flat,
each with its own custom_vjp. This times grad steps of progressively
longer flat chains at 2048^2 with window-difference timing (the only
trustworthy method on axon — see CLAUDE.md), so stage deltas give true
marginal f+b costs. Compare against the fused untextured pipeline step
(~17 ms) to size the slim-stream port opportunity.

Run: PYTHONPATH=.:~/.axon_site python benchmarks/profile_flatchain.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from nvdiffrast_tpu.models import primitives
from nvdiffrast_tpu.utils import camera

RES = 2048


def _measure(step, argsets, n1=8, n2=24):
    g = step(*argsets[0])
    float(np.asarray(jax.tree.leaves(g)[0]).ravel()[0])
    for i in range(4):
        g = step(*argsets[i % len(argsets)])
    float(np.asarray(jax.tree.leaves(g)[0]).ravel()[0])

    def window(iters):
        t0 = time.perf_counter()
        for i in range(iters):
            g = step(*argsets[i % len(argsets)])
        float(np.asarray(jax.tree.leaves(g)[0]).ravel()[0])
        return time.perf_counter() - t0

    t1 = window(n1)
    t2 = window(n2)
    return max(t2 - t1, 1e-9) / (n2 - n1)


def main():
    from nvdiffrast_tpu.ops.rasterize import rasterize_flat
    from nvdiffrast_tpu.ops.interpolate import interpolate_flat
    from nvdiffrast_tpu.ops.antialias import antialias_flat
    from nvdiffrast_tpu.ops.texture import (
        _mip_level_from_footprint_cols, _pack_pyramid, _static_meta,
        build_mip_stack, dispatch_fused_cols)
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
    op_table = build_opposite_table(tri)
    pcs = [pos_clip * jnp.float32(1 + i * 1e-6) for i in range(8)]

    B, H, W = 1, RES, RES
    N = B * H * W
    C = 3

    def chain(level, p, tex):
        u, v, zw, idf, d0, d1, d2, d3 = rasterize_flat(
            p, tri, (RES, RES), "auto", True)
        if level == 0:
            return (jnp.mean(u ** 2) + jnp.mean(v ** 2) + jnp.mean(zw ** 2)
                    + jnp.mean(d0 ** 2) + jnp.mean(d1 ** 2)
                    + jnp.mean(d2 ** 2) + jnp.mean(d3 ** 2))
        db01 = jnp.stack([d0, d1])
        db23 = jnp.stack([d2, d3])
        uv_cm, da_cm = interpolate_flat(
            uvv, u, v, idf, cidx, db01, db23, (0, 1), "auto")
        if level == 1:
            return jnp.mean(uv_cm ** 2) + jnp.mean(da_cm ** 2)
        levels = [tex] + build_mip_stack(tex, -1, False)
        smeta, _ = _static_meta(levels)
        L = len(levels)
        flat, _ = _pack_pyramid(levels, False)
        tz = jnp.zeros((N,), jnp.int32)
        tw = jnp.float32(tex.shape[-2])
        th = jnp.float32(tex.shape[-3])
        flevel = jnp.clip(
            _mip_level_from_footprint_cols(
                da_cm[0], da_cm[1], da_cm[2], da_cm[3], tw, th),
            0.0, float(L - 1))
        out_cm = dispatch_fused_cols(
            flat, smeta, levels, False, uv_cm[0], uv_cm[1], flevel, tz,
            "wrap", "linear-mipmap-linear", (B, H, W), False, None)
        if level == 2:
            return jnp.mean(out_cm ** 2)
        return jnp.mean(antialias_flat(
            out_cm, idf, zw, p, tri, op_table, (B, H, W, C), 1.0,
            "auto") ** 2)

    names = ["raster_flat(db)", "+interp_flat(uv,da)", "+texture(sample)",
             "+antialias_flat"]
    prev = 0.0
    for lv in range(4):
        step = jax.jit(jax.grad(lambda p, t, lv=lv: chain(lv, p, t),
                                argnums=(0, 1)))
        dt = _measure(step, [(p, tex) for p in pcs]) * 1e3
        print(f"{names[lv]:28s} cum {dt:8.2f} ms   marginal "
              f"{dt - prev:8.2f} ms", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
