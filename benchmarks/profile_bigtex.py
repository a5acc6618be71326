"""Large-texture sampler profile on real TPU (VERDICT r2 item 2).

The reference serves 2^16-px textures at full speed through hardware
texture units (csrc/common/texture.h:24); its earth sample uses a
2048x1536 atlas (samples/torch/earth.py:73). Here the fused Pallas
sampler streams big pyramid levels from HBM through windowed DMA
(_gather_big); this measures it against the XLA gather path at
reference scale, fwd and fwd+bwd, at a 2048^2 render.

Usage: PYTHONPATH=.:~/.axon_site python benchmarks/profile_bigtex.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import _measure  # window-difference timing

from nvdiffrast_tpu.ops.texture import texture


def timeit(fn, args_list, iters=None):
    # Window-difference timing: on axon, block_until_ready can no-op,
    # so the old per-iter scheme let leftover COMPILE time leak into
    # the first window — round-5's 1856 ms "regression" at 1024² was
    # entirely that artifact (benchmarks/bisect_texbwd.py measured the
    # same program at 97 ms with _measure).
    def step(*a):
        out = fn(*a)
        leaf = jax.tree.leaves(out)[0]
        return (leaf.ravel()[:1],)
    return _measure(jax.jit(step), args_list)


def main():
    print("backend:", jax.default_backend())
    RES = 2048
    rng = np.random.RandomState(0)

    # Smooth uv field over the image (sphere-like parameterization).
    yy, xx = np.meshgrid(np.linspace(0, 1, RES), np.linspace(0, 1, RES),
                         indexing="ij")
    uv = np.stack([xx + 0.05 * np.sin(4 * yy), yy], -1)[None]
    uv = jnp.asarray(uv.astype(np.float32))
    uv_da = jnp.asarray(
        rng.uniform(1e-4, 1e-3, (1, RES, RES, 4)).astype(np.float32))

    # The 2048x1536 atlas needs max_mip_level=9: level 10 would be
    # 4x3, not divisible by 2 (the reference earth sample does the
    # same: /root/reference/samples/torch/earth.py:73).
    for th, tw, max_mip in ((1024, 1024, None), (1536, 2048, 9)):
        tex = jnp.asarray(rng.rand(1, th, tw, 3).astype(np.float32))

        for impl in ("pallas", "xla"):
            def fwd(t, u):
                return (texture(t, u, uv_da=uv_da,
                                filter_mode="linear-mipmap-linear",
                                boundary_mode="wrap", impl=impl,
                                max_mip_level=max_mip),)

            def fb(t, u):
                def loss(t_, u_):
                    return jnp.sum(fwd(t_, u_)[0] ** 2)
                return jax.grad(loss, argnums=(0, 1))(t, u)

            us = [uv * jnp.float32(1.0 + i * 1e-6) for i in range(3)]
            try:
                dt_f = timeit(jax.jit(fwd), [(tex, u) for u in us])
                dt_b = timeit(jax.jit(fb), [(tex, u) for u in us])
                print(f"{th}x{tw} {impl:6s}: fwd {dt_f * 1e3:8.2f} ms   "
                      f"fwd+bwd {dt_b * 1e3:8.2f} ms")
            except Exception as e:  # noqa: BLE001 — report and move on
                print(f"{th}x{tw} {impl:6s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")

    print("done")


if __name__ == "__main__":
    sys.exit(main())
