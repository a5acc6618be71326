"""Split rasterize_flat(db)'s f+b cost: fwd alone vs fwd+bwd, db on/off.

Window-difference timing. Run:
PYTHONPATH=.:~/.axon_site python benchmarks/profile_rasterflat.py
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

    pos_idx, vtxp, _, _ = primitives.uv_sphere(32, 64)
    tri = jnp.asarray(pos_idx)
    mvp = camera.projection(x=0.4) @ camera.translate(0, 0, -3.5)
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    pos_clip = jnp.asarray((posw @ mvp.T)[None].astype(np.float32))
    pcs = [pos_clip * jnp.float32(1 + i * 1e-6) for i in range(8)]

    def fwd_db(p):
        outs = rasterize_flat(p, tri, (RES, RES), "auto", True)
        return sum(jnp.sum(o[::97]) for o in outs)

    def fwd_nodb(p):
        outs = rasterize_flat(p, tri, (RES, RES), "auto", False)
        return sum(jnp.sum(o[::97]) for o in outs)

    def fb_db(p):
        outs = rasterize_flat(p, tri, (RES, RES), "auto", True)
        return sum(jnp.mean(o ** 2) for o in outs)

    def fb_nodb(p):
        outs = rasterize_flat(p, tri, (RES, RES), "auto", False)
        return sum(jnp.mean(o ** 2) for o in outs[:3])

    for name, fn, grad in (("fwd db", fwd_db, False),
                           ("fwd nodb", fwd_nodb, False),
                           ("f+b db", fb_db, True),
                           ("f+b nodb", fb_nodb, True)):
        f = jax.jit(jax.grad(fn) if grad else fn)
        dt = _measure(f, [(p,) for p in pcs]) * 1e3
        print(f"{name:12s} {dt:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
