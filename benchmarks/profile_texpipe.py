"""Stage-cumulative fwd+bwd timing of the textured pipeline (dev tool).

bench.py's --with-texture line is far slower than the sum of per-op
profiles; this times grad steps of progressively longer pipelines at
2048^2 to locate the blowup. Compare deltas (RTT ~30 ms included).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from nvdiffrast_tpu.ops.rasterize import rasterize
from nvdiffrast_tpu.ops.interpolate import interpolate
from nvdiffrast_tpu.ops.texture import texture
from nvdiffrast_tpu.ops.antialias import antialias
from nvdiffrast_tpu.models import primitives
from nvdiffrast_tpu.utils import camera

RES = 2048


def timeit(name, fn, argsets, iters=6):
    out = fn(*argsets[0])
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*argsets[i % len(argsets)])
        float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:52s} {dt*1e3:9.2f} ms", flush=True)


def main():
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
    pcs = [pos_clip * jnp.float32(1 + i * 1e-6) for i in range(4)]

    def stage(level, p, tex):
        rast, rast_db = rasterize(None, p, tri, (RES, RES), grad_db=True)
        if level == 0:
            return jnp.mean(rast ** 2) + jnp.mean(rast_db ** 2)
        uv, uv_da = interpolate(uvv[None], rast, cidx, rast_db,
                                diff_attrs="all")
        if level == 1:
            return jnp.mean(uv ** 2) + jnp.mean(uv_da ** 2)
        img = texture(tex, uv, uv_da=uv_da,
                      filter_mode="linear-mipmap-linear")
        if level == 2:
            return jnp.mean(img ** 2)
        img = antialias(img, rast, p, tri)
        return jnp.mean(img ** 2)

    names = ["raster(grad_db)", "+interp(da)", "+texture(tril)", "+aa"]
    for lv, nm in enumerate(names):
        timeit(f"fwd+bwd {nm}", jax.jit(
            jax.grad(lambda p, t, lv=lv: stage(lv, p, t), argnums=(0, 1))),
            [(p, tex) for p in pcs])

    # texture alone on the same uv stream (fixed inputs, no chain).
    rast, rast_db = rasterize(None, pos_clip, tri, (RES, RES), grad_db=True)
    uv, uv_da = interpolate(uvv[None], rast, cidx, rast_db, diff_attrs="all")

    def tex_only(t, u, da):
        return jnp.mean(texture(t, u, uv_da=da,
                                filter_mode="linear-mipmap-linear") ** 2)
    timeit("fwd+bwd texture only (pipeline uvs)", jax.jit(
        jax.grad(tex_only, argnums=(0, 1, 2))),
        [(tex, uv * jnp.float32(1 + i * 1e-6), uv_da) for i in range(4)])

    # Decomposition of the texture cost on the pipeline uv stream.
    timeit("fwd texture only (pipeline uvs)", jax.jit(
        lambda t, u: texture(t, u, uv_da=uv_da,
                             filter_mode="linear-mipmap-linear")),
        [(tex, uv * jnp.float32(1 + i * 1e-6)) for i in range(4)])
    timeit("fwd texture linear-no-mip (pipeline uvs)", jax.jit(
        lambda t, u: texture(t, u, filter_mode="linear")),
        [(tex, uv * jnp.float32(1 + i * 1e-6)) for i in range(4)])

    def tex_guv(u):
        return jnp.mean(texture(tex, u, uv_da=uv_da,
                                filter_mode="linear-mipmap-linear") ** 2)
    timeit("fwd+bwd texture wrt uv only", jax.jit(jax.grad(tex_guv)),
           [(uv * jnp.float32(1 + i * 1e-6),) for i in range(4)])

    def tex_gt(t):
        return jnp.mean(texture(t, uv, uv_da=uv_da,
                                filter_mode="linear-mipmap-linear") ** 2)
    timeit("fwd+bwd texture wrt tex only", jax.jit(jax.grad(tex_gt)),
           [(tex * jnp.float32(1 + i * 1e-6),) for i in range(4)])


if __name__ == "__main__":
    main()
