"""A/B the texture-gradient scatter chunk size on chip (dev tool).

The MXU one-hot scatter's compare+matmul overdraw scales with the
texel-id span of each pixel chunk; smaller chunks have proportionally
smaller spans (an image tile's uv bbox shrinks with the tile). This
times the real texture wrt-tex backward (bench shapes: 512^2 trilinear
texture under the 2048^2 sphere uv stream) at several _SCAT_P_CHUNK
values, plus the full fwd+bwd, so the default in texture_pallas.py is
set from measurement.

Usage: PYTHONPATH=.:~/.axon_site python benchmarks/profile_scatter.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import _measure  # window-difference timing

from nvdiffrast_tpu.ops import texture_pallas as tp
from nvdiffrast_tpu.ops.rasterize import rasterize
from nvdiffrast_tpu.ops.interpolate import interpolate
from nvdiffrast_tpu.ops.texture import texture
from nvdiffrast_tpu.models import primitives
from nvdiffrast_tpu.utils import camera

RES = 2048


def line(name, dt):
    print(f"{name:52s} {dt*1e3:9.2f} ms", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    pos_idx, vtxp, _, _ = primitives.uv_sphere(32, 64)
    tri = jnp.asarray(pos_idx)
    mvp = camera.projection(x=0.4) @ camera.translate(0, 0, -3.5)
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    pos_clip = jnp.asarray((posw @ mvp.T)[None].astype(np.float32))
    rng = np.random.RandomState(0)
    tex = jnp.asarray(rng.rand(1, 512, 512, 3).astype(np.float32))
    uvw = np.stack([np.arctan2(vtxp[:, 0], vtxp[:, 2]) / (2 * np.pi) + 0.5,
                    np.arccos(np.clip(vtxp[:, 1], -1, 1)) / np.pi],
                   axis=1).astype(np.float32)
    uvv = jnp.asarray(uvw)

    rast, rast_db = rasterize(None, pos_clip, tri, (RES, RES),
                              grad_db=True)
    uv, uv_da = interpolate(uvv[None], rast, tri, rast_db,
                            diff_attrs="all")

    def tex_gt(t):
        return jnp.mean(texture(t, uv, uv_da=uv_da,
                                filter_mode="linear-mipmap-linear",
                                impl="pallas") ** 2)

    texs = [tex * jnp.float32(1 + i * 1e-6) for i in range(4)]
    ref = None
    for pc in (8192, 4096, 2048, 1024):
        tp._SCAT_P_CHUNK = pc
        g = jax.jit(jax.grad(tex_gt))(texs[0])
        if ref is None:
            ref = g
        else:
            # Chunking changes f32 accumulation grouping AND the bf16
            # hi/lo split points -> small relative differences only
            # (scatter audit bound is ~1.5e-3; see results_r4.md).
            d = float(jnp.abs(g - ref).max() / jnp.abs(ref).max())
            assert d < 1e-3, f"p_chunk={pc} changed the gradient by {d}"
        line(f"f+b wrt-tex, scatter p_chunk={pc}",
             _measure(jax.jit(jax.grad(tex_gt)), [(t,) for t in texs]))
    print("done", flush=True)


if __name__ == "__main__":
    main()
