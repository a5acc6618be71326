"""Scaling-efficiency benchmark: Mpix/s vs mesh size.

BASELINE.md's north-star metric is multi-chip scaling efficiency
(>=80% at N hosts). Only one physical chip is reachable in this
environment, so this script measures two things:

1. Real-chip batch scaling (B=1 vs B=4 per-step throughput on the
   actual TPU) — the single-chip proxy for data-parallel efficiency.
2. Virtual-mesh scaling (1 vs 8 fake CPU devices,
   --xla_force_host_platform_device_count): validates that the sharded
   train step partitions and that per-device work actually shrinks.
   CPU timings are NOT chip throughput; only the ratio structure is
   meaningful.

Usage:
  PYTHONPATH=.:~/.axon_site python benchmarks/scaling.py          # real chip
  JAX_PLATFORMS=cpu python benchmarks/scaling.py --virtual        # CPU mesh
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pipeline(res, batch):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nvdiffrast_tpu.ops.rasterize import rasterize
    from nvdiffrast_tpu.ops.interpolate import interpolate
    from nvdiffrast_tpu.ops.antialias import antialias
    from nvdiffrast_tpu.models import primitives
    from nvdiffrast_tpu.utils import camera

    pos_idx, vtxp, col_idx, _ = primitives.uv_sphere(32, 64)
    vtxc = (vtxp * 0.5 + 0.5).astype(np.float32)
    tri = jnp.asarray(pos_idx)
    cidx = jnp.asarray(col_idx)
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    rng = np.random.RandomState(0)
    views = []
    for _ in range(batch):
        rot = camera.random_rotation_translation(0.25, rng)
        mvp = camera.projection(x=0.4) @ camera.translate(0, 0, -3.5) @ rot
        views.append((posw @ mvp.T).astype(np.float32))
    pos_clip = jnp.asarray(np.stack(views))
    col = jnp.asarray(vtxc)

    def loss_fn(p, c):
        r, _ = rasterize(None, p, tri, (res, res), grad_db=False)
        img, _ = interpolate(c[None], r, cidx)
        img = antialias(img, r, p, tri)
        return jnp.mean(img ** 2)

    return pos_clip, col, loss_fn


def bench_real(res=1024):
    import jax
    import jax.numpy as jnp

    print(f"# real-chip batch scaling at {res}^2 "
          f"(backend={jax.default_backend()})")
    base = None
    for B in (1, 2, 4):
        pos_clip, col, loss_fn = _pipeline(res, B)
        step = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
        pcs = [pos_clip * jnp.float32(1 + i * 1e-6) for i in range(4)]
        g = step(pcs[0], col)
        float(g[0][0, 0, 0])
        iters = 8
        t0 = time.perf_counter()
        for i in range(iters):
            g = step(pcs[i % 4], col)
            float(g[0][0, 0, 0])
        dt = (time.perf_counter() - t0) / iters
        mpix = B * res * res / 1e6 / dt
        if base is None:
            base = mpix
        print(f"B={B}: {dt*1e3:8.2f} ms/step  {mpix:8.1f} Mpix/s  "
              f"per-image efficiency vs B=1: {100*mpix/base:5.1f}%")


def bench_virtual(res=256):
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nvdiffrast_tpu.parallel import make_mesh, shard_map_train_step

    n = len(jax.devices())
    print(f"# virtual-mesh scaling at {res}^2 ({n} {jax.default_backend()} "
          f"devices, shard_map dp)")
    results = {}
    for nd in (1, n):
        mesh = make_mesh((nd,), ("dp",), devices=jax.devices()[:nd])
        B = n  # fixed global batch so per-device work shrinks
        pos_clip, col, loss_fn = _pipeline(res, B)

        def ploss(params, batch):
            return loss_fn(batch, params["col"])

        opt = optax.adam(1e-2)
        params = {"col": col}
        state = opt.init(params)
        step = shard_map_train_step(ploss, opt, mesh)
        batch = jax.device_put(pos_clip, NamedSharding(mesh, P("dp")))
        params, state, loss = step(params, state, batch)
        jax.block_until_ready(loss)
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            params, state, loss = step(params, state, batch)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / iters
        results[nd] = dt
        print(f"devices={nd}: {dt*1e3:8.2f} ms/step (global batch {B})")
    if n in results and 1 in results:
        sp = results[1] / results[n]
        print(f"speedup {sp:.2f}x on {n} devices "
              f"-> {100*sp/n:.1f}% parallel efficiency (CPU-mesh structure "
              f"check, not chip throughput)")


def bench_virtual_sp(res=512):
    """Single large image split into row bands across the virtual mesh."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nvdiffrast_tpu.parallel import make_mesh
    from nvdiffrast_tpu.parallel.spatial import make_sp_render
    from nvdiffrast_tpu.models import primitives
    from nvdiffrast_tpu.utils import camera

    n = len(jax.devices())
    print(f"# virtual-mesh SPATIAL scaling: one {res}^2 image in row bands")
    pos_idx, vtxp, col_idx, _ = primitives.uv_sphere(32, 64)
    tri = jnp.asarray(pos_idx)
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    mvp = camera.projection(x=0.4) @ camera.translate(0, 0, -3.5)
    pos = jnp.asarray((posw @ mvp.T)[None].astype(np.float32))
    col = jnp.asarray((vtxp * 0.5 + 0.5).astype(np.float32))

    results = {}
    for nd in (1, n):
        mesh = make_mesh((nd,), ("sp",), devices=jax.devices()[:nd])
        render = make_sp_render(mesh, tri, jnp.asarray(col_idx), (res, res))
        out = render(pos, col)
        jax.block_until_ready(out)
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            out = render(pos * jnp.float32(1 + 1e-6), col)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        results[nd] = dt
        print(f"sp devices={nd}: {dt*1e3:8.2f} ms/render")
    sp = results[1] / results[n]
    print(f"sp speedup {sp:.2f}x on {n} devices "
          f"-> {100*sp/n:.1f}% parallel efficiency (CPU-mesh)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", action="store_true")
    ap.add_argument("--res", type=int, default=None)
    args = ap.parse_args()
    if args.virtual:
        # The site customization force-selects the TPU platform; pin CPU
        # with fake devices here (same dance as tests/conftest.py).
        flag = "--xla_force_host_platform_device_count=8"
        if flag not in os.environ.get("XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "") + " " + flag).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        bench_virtual(args.res or 256)
        bench_virtual_sp((args.res or 256) * 2)
    else:
        bench_real(args.res or 1024)
