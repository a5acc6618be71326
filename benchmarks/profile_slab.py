"""A/B the rasterizer sweep's slab height on a 1M-tri mesh (dev tool).

The fused sweep evaluates each surviving record group over
SLAB_H x 128 pixel regions; for ~4-px triangles that is a large
overdraw, and SLAB_H=8 (one f32 vreg) halves it at the cost of more
fori steps for large triangles. Times the 1M-tri forward at both
values plus the headline mesh as a regression guard.

Usage: PYTHONPATH=.:~/.axon_site python benchmarks/profile_slab.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import _measure

from nvdiffrast_tpu.ops import rasterize_pallas as rp
from nvdiffrast_tpu.ops.rasterize import rasterize
from nvdiffrast_tpu.models import primitives
from nvdiffrast_tpu.utils import camera

RES = 2048


def line(name, dt):
    print(f"{name:52s} {dt*1e3:9.2f} ms", flush=True)


def sphere_args(nlat, nlon):
    pos_idx, vtxp, _, _ = primitives.uv_sphere(nlat, nlon)
    tri = jnp.asarray(pos_idx)
    mvp = camera.projection(x=0.4) @ camera.translate(0, 0, -3.5)
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    pos = jnp.asarray((posw @ mvp.T)[None].astype(np.float32))
    return tri, [pos * jnp.float32(1 + i * 1e-6) for i in range(4)]


def main():
    print("backend:", jax.default_backend(), flush=True)
    big_tri, big_pcs = sphere_args(724, 724)  # ~1.05M tris
    small_tri, small_pcs = sphere_args(32, 64)
    print(f"big mesh: {big_tri.shape[0]} tris", flush=True)

    for slab in (16, 8):
        rp.SLAB_H = slab

        def fwd(p, tri=big_tri):
            r, _ = rasterize(None, p, tri, (RES, RES), grad_db=False)
            return (jnp.sum(r[..., 2]),)

        line(f"1M-tri fwd, SLAB_H={slab}",
             _measure(jax.jit(fwd), [(p,) for p in big_pcs]))

        def fwd_s(p, tri=small_tri):
            r, _ = rasterize(None, p, tri, (RES, RES), grad_db=False)
            return (jnp.sum(r[..., 2]),)

        line(f"4k-tri fwd, SLAB_H={slab}",
             _measure(jax.jit(fwd_s), [(p,) for p in small_pcs]))
    print("done", flush=True)


if __name__ == "__main__":
    main()
