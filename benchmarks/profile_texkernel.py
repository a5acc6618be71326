"""Axis-scaling micro-profile of the fused texture sampler (dev tool).

The textured headline needs texture fwd+bwd at 2048² cut from ~100 ms
toward ~35 ms (VERDICT r4 #3). This isolates which axis the sampler
kernel's cost actually scales with, by timing fwd and bwd while varying
ONE axis at a time from a center config (2048² render, 512² texture,
C=3, trilinear, wrap, smooth uv, flevel ~0.5):

  channels    C in {1, 3, 4}      -> is the 4C-gather loop the cost?
  uv scale    texel-rows/block    -> is the per-texel-row loop the cost?
  filter      linear vs trilinear -> is the 2nd level's sweep the cost?
  da          flevel 0.5 vs 1.5   -> VMEM level size (512 vs 256 rows)

Usage: PYTHONPATH=.:~/.axon_site python benchmarks/profile_texkernel.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from nvdiffrast_tpu.ops.texture import texture

RES = 2048


def timeit(name, fn, argsets, iters=8):
    out = fn(*argsets[0])
    jax.block_until_ready(out)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    outs = [fn(*argsets[i % len(argsets)]) for i in range(iters)]
    float(jnp.asarray(jax.tree.leaves(outs[-1])[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:52s} {dt*1e3:9.2f} ms", flush=True)


def uv_field(scale):
    """Smooth uv covering `scale` wraps across the image: texel rows
    per 64x128 block grow with scale."""
    yy, xx = np.meshgrid(np.linspace(0, 1, RES), np.linspace(0, 1, RES),
                         indexing="ij")
    uv = np.stack([scale * (xx + 0.05 * np.sin(4 * yy)), scale * yy], -1)
    return jnp.asarray(uv[None].astype(np.float32))


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)

    def cfg(C=3, uv_scale=1.0, filt="linear-mipmap-linear", fl=0.5,
            ts=512):
        tex = jnp.asarray(rng.rand(1, ts, ts, C).astype(np.float32))
        uv = uv_field(uv_scale)
        # uv_da chosen so flevel ~= fl everywhere.
        da = 2.0 ** fl / ts
        uv_da = jnp.asarray(np.full((1, RES, RES, 4), da, np.float32))
        return tex, uv, uv_da, filt

    def run(name, C=3, uv_scale=1.0, filt="linear-mipmap-linear",
            fl=0.5, ts=512, mode="both"):
        tex, uv, uv_da, filt = cfg(C, uv_scale, filt, fl, ts)

        def fwd(t, u):
            kw = {}
            if filt != "linear":
                kw["uv_da"] = uv_da
            return texture(t, u, filter_mode=filt, boundary_mode="wrap",
                           impl="pallas", **kw)

        def loss(t, u):
            return jnp.sum(fwd(t, u) ** 2)

        tex2 = tex * 1.000001
        uv2 = uv * 1.000001
        if mode in ("both", "fwd"):
            timeit(f"fwd  {name}", jax.jit(fwd), [(tex, uv), (tex2, uv2)])
        if mode in ("both", "bwd"):
            timeit(f"f+b  {name}", jax.jit(jax.grad(loss, argnums=(0, 1))),
                   [(tex, uv), (tex2, uv2)])

    run("center (C=3, scale 1, trilinear, fl .5)")
    run("C=1", C=1)
    run("C=4", C=4)
    run("uv scale 0.25 (few texel rows/block)", uv_scale=0.25)
    run("uv scale 4 (many texel rows/block)", uv_scale=4.0)
    run("filter linear (1 level, no mip)", filt="linear")
    run("fl 1.5 (levels 1+2)", fl=1.5)
    run("ts=256 pyramid", ts=256)

    # Pixel-tile height A/B: the fwd cost scales with texel rows per
    # block (see the uv-scale lines), and a smaller tile sees a
    # proportionally smaller texel bbox at more grid steps.
    from nvdiffrast_tpu.ops import texture_pallas as tp
    for th in (32, 16, 8):
        tp.TILE_H = th
        run(f"center, TILE_H={th}")
        run(f"uv scale 4, TILE_H={th}", uv_scale=4.0, mode="fwd")
    tp.TILE_H = 64
    print("done", flush=True)


if __name__ == "__main__":
    main()
