"""Texture sampler timing on the real chip (dev tool).

Times the XLA and fused-Pallas texture paths (fwd and fwd+bwd) at
2048^2 with a 512^2 mip pyramid. Times include a constant host-read
RTT (~25-35 ms); compare deltas against the floor line.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from nvdiffrast_tpu.ops.texture import texture

RES = 2048


def timeit(name, fn, argsets, iters=8):
    out = fn(*argsets[0])
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*argsets[i % len(argsets)])
        float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    rng = np.random.RandomState(0)
    tex = jnp.asarray(rng.rand(1, 512, 512, 3).astype(np.float32))
    # Smooth, rotated uv field (realistic spatial coherence) + footprint.
    yy, xx = np.mgrid[0:RES, 0:RES].astype(np.float32) / RES
    uvn = np.stack([0.9 * xx + 0.25 * yy, -0.2 * xx + 0.8 * yy], -1)
    uv = jnp.asarray(uvn[None])
    uv_da = jnp.asarray(
        np.broadcast_to(np.float32([1.1 / RES, 0.2 / RES, 0.15 / RES,
                                    0.9 / RES]),
                        (1, RES, RES, 4)).copy())
    uvs = [uv + jnp.float32(i * 1e-5) for i in range(4)]

    timeit("floor (noop add)", jax.jit(lambda p: p + 1.0),
           [(u,) for u in uvs])

    for impl in ("xla", "pallas"):
        for fm in ("linear", "linear-mipmap-linear"):
            kw = dict(filter_mode=fm, impl=impl)
            if "mipmap" in fm:
                kw["uv_da"] = uv_da
            timeit(f"fwd {fm} [{impl}]",
                   jax.jit(lambda u, kw=kw: texture(tex, u, **kw)),
                   [(u,) for u in uvs])

    for impl in ("xla", "pallas"):
        def loss(t, u, impl=impl):
            o = texture(t, u, uv_da=uv_da,
                        filter_mode="linear-mipmap-linear", impl=impl)
            return jnp.mean(o ** 2)
        timeit(f"fwd+bwd trilinear [{impl}]",
               jax.jit(jax.grad(loss, argnums=(0, 1))),
               [(tex, u) for u in uvs])


if __name__ == "__main__":
    main()
