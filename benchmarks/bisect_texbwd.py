"""Bisect the round-5 texture-backward regression (dev tool).

Measures, with bench.py window-difference timing at a 2048^2 render:
  fwd primal      — plain fused forward (no stash)
  fwd_stash       — jax.vjp forward only (runs the fwd_stash kernel)
  bwd uv-only     — vjp called with the scatter result discarded is
                    not expressible; instead: full vjp wrt uv only
  full f+b        — grad wrt (tex, uv)
Set NVDR_TILED_IDS=0 to A/B the scatter id space.

Usage: PYTHONPATH=.:~/.axon_site [NVDR_TILED_IDS=0]
       python benchmarks/bisect_texbwd.py [tex_size]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import _measure

from nvdiffrast_tpu.ops import texture_pallas as tp
from nvdiffrast_tpu.ops.texture import texture

RES = 2048


def main():
    arg = sys.argv[1] if len(sys.argv) > 1 else "512"
    if "x" in arg:  # e.g. 1536x2048 (the earth atlas; needs max_mip 9)
        th, tw = (int(p) for p in arg.split("x"))
        max_mip = 9
    else:
        th = tw = int(arg)
        max_mip = None  # full chain (texture() requires None, not -1)
    print(f"backend: {jax.default_backend()}  tex {th}x{tw}  render "
          f"{RES}^2  tiled_ids={tp._TILED_IDS}", flush=True)
    rng = np.random.RandomState(0)
    yy, xx = np.meshgrid(np.linspace(0, 1, RES), np.linspace(0, 1, RES),
                         indexing="ij")
    uv = np.stack([xx + 0.05 * np.sin(4 * yy), yy], -1)[None]
    uv = jnp.asarray(uv.astype(np.float32))
    uv_da = jnp.asarray(
        rng.uniform(1e-4, 1e-3, (1, RES, RES, 4)).astype(np.float32))
    tex = jnp.asarray(rng.rand(1, th, tw, 3).astype(np.float32))
    us = [uv * jnp.float32(1.0 + i * 1e-6) for i in range(3)]

    def tex_op(t, u):
        return texture(t, u, uv_da=uv_da,
                       filter_mode="linear-mipmap-linear",
                       boundary_mode="wrap", impl="pallas",
                       max_mip_level=max_mip)

    def fwd(t, u):
        return (jnp.sum(tex_op(t, u)),)

    def fwd_stash(t, u):
        out, _vjp = jax.vjp(lambda t_, u_: tex_op(t_, u_), t, u)
        return (jnp.sum(out),)

    def fb_uv(t, u):
        def loss(u_):
            return jnp.sum(tex_op(t, u_) ** 2)
        return (jnp.sum(jax.grad(loss)(u)),)

    def fb_tex(t, u):
        def loss(t_):
            return jnp.sum(tex_op(t_, u) ** 2)
        return (jnp.sum(jax.grad(loss)(t)),)

    def fb_all(t, u):
        def loss(t_, u_):
            return jnp.sum(tex_op(t_, u_) ** 2)
        g = jax.grad(loss, argnums=(0, 1))(t, u)
        return (jnp.sum(g[0]) + jnp.sum(g[1][0]),)

    for name, fn in (("fwd primal", fwd), ("fwd_stash (vjp fwd)", fwd_stash),
                     ("f+b wrt uv", fb_uv), ("f+b wrt tex", fb_tex),
                     ("f+b wrt both", fb_all)):
        dt = _measure(jax.jit(fn), [(tex, u) for u in us])
        print(f"{name:22s} {dt * 1e3:8.2f} ms", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
