"""Large-mesh rasterizer breakdown on the real chip (dev tool).

Times forward rasterization at growing triangle counts, and separates
the XLA geometry/binning prepass from the Pallas sweep by timing the
prepass alone. Compare deltas (RTT ~30 ms included in each line).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from nvdiffrast_tpu.ops.rasterize import rasterize
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


def scene(nlat, nlon):
    pos_idx, vtxp, col_idx, _ = primitives.uv_sphere(nlat, nlon)
    tri = jnp.asarray(pos_idx)
    mvp = camera.projection(x=0.4) @ camera.translate(0, 0, -3.5)
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    pos = jnp.asarray((posw @ mvp.T)[None].astype(np.float32))
    return pos, tri


def main():
    from nvdiffrast_tpu.ops import rasterize_pallas as rp

    for nlat, nlon in ((32, 64), (128, 320), (256, 512), (512, 1024)):
        pos, tri = scene(nlat, nlon)
        T = tri.shape[0]
        pcs = [pos * jnp.float32(1 + i * 1e-6) for i in range(4)]

        def fwd(p):
            return rasterize(None, p, tri, (RES, RES), grad_db=False)[0]

        timeit(f"raster fwd T={T}", jax.jit(fwd), [(p,) for p in pcs])

        def prep(p):
            tri_ids = jnp.arange(T, dtype=jnp.int32)
            rec_cm, clipc, valid, slop = rp._build_records_cm(p[0], tri,
                                                              tri_ids)
            sx, sy, sw, sv = clipc
            aabb = rp._aabb_union_cols(sx, sy, sw, sv, valid, slop,
                                       RES, RES, 0, RES)
            nty = -(-RES // rp.TILE_H)
            rec_s, gaabb = rp._sort_records(rec_cm, aabb, nty, 2, 1024)
            return rec_s[0]

        timeit(f"  binning prepass only T={T}", jax.jit(prep),
               [(p,) for p in pcs])

        def fwd_bwd(p):
            r, _ = rasterize(None, p, tri, (RES, RES), grad_db=False)
            return jnp.mean(r[..., :3] ** 2)

        timeit(f"  fwd+bwd T={T}", jax.jit(jax.grad(fwd_bwd)),
               [(p,) for p in pcs])


if __name__ == "__main__":
    main()
