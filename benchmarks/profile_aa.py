"""AA-internal stage timing on the real chip (dev tool).

Separates the antialias cost into: table gather, dense per-pair
analysis (gather stubbed), MXU scatter, and the full op, so fusion
work targets the real bottleneck. Times include a constant host-read
RTT (~25-35 ms); compare deltas, not absolutes.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from nvdiffrast_tpu.ops.rasterize import rasterize
from nvdiffrast_tpu.ops.interpolate import interpolate
from nvdiffrast_tpu.ops import antialias as aa
from nvdiffrast_tpu.ops.gather import table_take
from nvdiffrast_tpu.ops.scatter import scatter_add_by_id
from nvdiffrast_tpu.ops.topology import build_opposite_table
from nvdiffrast_tpu.models import primitives
from nvdiffrast_tpu.utils import camera

RES = 2048


def timeit(name, fn, argsets, iters=8):
    out = fn(*argsets[0])
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*argsets[i % len(argsets)])
        float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.2f} ms")
    return out


def main():
    pos_idx, vtxp, col_idx, _ = primitives.uv_sphere(32, 64)
    tri = jnp.asarray(pos_idx)
    cidx = jnp.asarray(col_idx)
    T = tri.shape[0]
    print(f"triangles: {T}, res: {RES}")

    mvp = camera.projection(x=0.4) @ camera.translate(0, 0, -3.5)
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    pos_clip = jnp.asarray((posw @ mvp.T)[None].astype(np.float32))
    col = jnp.asarray((vtxp * 0.5 + 0.5).astype(np.float32))
    pcs = [pos_clip * jnp.float32(1 + i * 1e-6) for i in range(4)]

    rast = jax.jit(lambda p: rasterize(None, p, tri, (RES, RES),
                                       grad_db=False)[0])(pos_clip)
    img = jax.jit(lambda c: interpolate(c[None], rast, cidx)[0])(col)
    op_table = build_opposite_table(tri)
    N = RES * RES

    # RTT floor: trivial jitted fn.
    timeit("floor (noop add)", jax.jit(lambda p: p + 1.0),
           [(p,) for p in pcs])

    # 1. the XLA path's forward table gather alone [7, 2N].
    rflat = rast.reshape(N, 4)
    idf0, z0 = rflat[:, 3], rflat[:, 2]
    fx, fy, rofs, _, _ = aa._pixel_grid(1, RES, RES, T, True)
    nb = aa._fold_rolls(idf0, z0, 1, RES, RES)
    rids = []
    for d in (0, 1):
        idf1, z1 = nb[d]
        tid, _, _ = aa.pair_ids(idf0, idf1, z0, z1, T)
        rids.append(tid + rofs)
    rid2 = jnp.concatenate(rids)

    def g7(p):
        ft, _, _, _ = aa._build_tables(p, tri, op_table, True, RES, RES)
        return table_take(ft, rid2)
    timeit("fwd table gather [7, 2N]", jax.jit(g7), [(p,) for p in pcs])

    # 2. scatter alone: [9, 2N] -> [T, 9].
    gv = jnp.ones((9, 2 * N), jnp.float32)
    timeit("bwd scatter [2N]->[T,9]", jax.jit(
        lambda g: scatter_add_by_id(rid2, g, T)),
        [(gv * s,) for s in (1.0, 0.5, 0.25, 2.0)])

    # 3/4. full forward, per impl.
    for impl in ("xla", "pallas"):
        timeit(f"fwd full [{impl}]", jax.jit(
            lambda c, r, p, impl=impl: aa._aa_forward_core(
                c, r, p, tri, op_table, impl)[0]),
            [(img, rast, p) for p in pcs])

    # 5/6. full fwd+bwd via grad, per impl.
    for impl in ("xla", "pallas"):
        def aa_loss(c, r, p, impl=impl):
            return jnp.mean(aa.antialias(c, r, p, tri, impl=impl) ** 2)
        timeit(f"fwd+bwd full [{impl}]",
               jax.jit(jax.grad(aa_loss, argnums=(0, 2))),
               [(img, rast, p) for p in pcs])


if __name__ == "__main__":
    main()
