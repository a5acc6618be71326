"""Bisect the 1024^2 big-texture Mosaic compile failure (VERDICT r4 #1).

Round-3 evidence: the fused sampler with HBM windowed-DMA levels
compiles at a 256^2 texture (L=9, forced split) but the remote Mosaic
compile crashes (HTTP 500) at 1024^2 (L=11, organic split, 2048^2
render). Each config below isolates one axis: texture size (level
count L), render size (grid length), filter chain length
(max_mip_level), and fwd vs bwd kernels. Compile wall time is printed
per config — a near-timeout pass is as informative as a failure.

Usage: PYTHONPATH=.:~/.axon_site python benchmarks/bisect_bigtex.py [n...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from nvdiffrast_tpu.ops.texture import texture
from nvdiffrast_tpu.ops import texture_pallas as tp


def uv_field(res):
    yy, xx = np.meshgrid(np.linspace(0, 1, res), np.linspace(0, 1, res),
                         indexing="ij")
    uv = np.stack([xx + 0.05 * np.sin(4 * yy), yy], -1)[None]
    return jnp.asarray(uv.astype(np.float32))


def run(name, ts, res, mode, max_mip=None, vmem_budget=None):
    rng = np.random.RandomState(0)
    tex = jnp.asarray(rng.rand(1, ts, ts, 3).astype(np.float32))
    uv = uv_field(res)
    uv_da = jnp.asarray(np.full((1, res, res, 4), 2e-3, np.float32))

    def loss(t):
        o = texture(t, uv, uv_da=uv_da,
                    filter_mode="linear-mipmap-linear",
                    boundary_mode="wrap", impl="pallas",
                    max_mip_level=max_mip)
        return jnp.sum(o ** 2)

    fn = jax.jit(loss) if mode == "fwd" else jax.jit(jax.grad(loss))
    orig = tp._MAX_VMEM_TABLE
    t0 = time.perf_counter()
    try:
        if vmem_budget is not None:
            tp._MAX_VMEM_TABLE = vmem_budget
        out = fn(tex)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"{name}: OK  ({dt:.1f}s compile+run)", flush=True)
    except Exception as e:  # noqa: BLE001 — isolate per config
        dt = time.perf_counter() - t0
        print(f"{name}: FAIL after {dt:.1f}s  "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    finally:
        tp._MAX_VMEM_TABLE = orig


CONFIGS = {
    # (ts, res, mode, max_mip, vmem_budget)
    "1": ("ts1024 res256 fwd       (L=11 organic big)",
          1024, 256, "fwd", None, None),
    "2": ("ts512 res2048 fwd forced (L=10, big render)",
          512, 2048, "fwd", None, 1 << 18),
    "3": ("ts1024 res256 fwd mip4   (L=5, organic big)",
          1024, 256, "fwd", 4, None),
    "4": ("ts1024 res256 bwd       (L=11 organic big)",
          1024, 256, "bwd", None, None),
    "5": ("ts1024 res2048 fwd      (the failing shape)",
          1024, 2048, "fwd", None, None),
    "6": ("ts512 res256 fwd forced  (L=10 small render)",
          512, 256, "fwd", None, 1 << 18),
    # Round-4 second pass: [4] showed bwd at L=11 crashes Mosaic while
    # every fwd config compiles. Walk the bwd kernel's level count.
    "7": ("ts512 res256 bwd forced  (L=10, n_big=1)",
          512, 256, "bwd", None, 1 << 18),
    "8": ("ts1024 res256 bwd mip4   (L=5, organic big)",
          1024, 256, "bwd", 4, None),
    "9": ("ts1024 res256 bwd mip9   (L=10, organic big)",
          1024, 256, "bwd", 9, None),
    "10": ("ts1024 res256 bwd mip10 (L=11 == failing)",
           1024, 256, "bwd", 10, None),
    "11": ("ts2048 res256 bwd mip9  (L=10, 2 HBM levels)",
           2048, 256, "bwd", 9, None),
}


def main():
    print("backend:", jax.default_backend(), flush=True)
    keys = sys.argv[1:] or list(CONFIGS)
    for k in keys:
        name, ts, res, mode, mm, vb = CONFIGS[k]
        run(f"[{k}] {name}", ts, res, mode, mm, vb)
    print("done", flush=True)


if __name__ == "__main__":
    main()
