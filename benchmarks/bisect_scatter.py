"""Isolate the bwd big-texture Mosaic crash to the row-blocked scatter.

bisect_bigtex narrowed the HTTP-500 Mosaic failure to "backward pass +
1024-wide HBM level". But the backward program contains one kernel the
forward doesn't: the texture-gradient MXU scatter — and at a 1024²
texture its extended-pyramid table (~1.4M rows x K=6) exceeds the
single-block accumulator budget for the FIRST time anywhere in the
codebase, switching scatter_add_by_id to the row-blocked
PrefetchScalarGridSpec kernel (scatter.py NB>1 branch) that has only
ever run in interpret mode. At a 512² texture NTe ~ 351k keeps NB=1.
That matches every bisect datapoint (fwd-only OK, level count and
render size irrelevant).

Configs isolate: NB=1 vs NB=2 vs NB=4 pure scatters (tiny programs,
fast compile), then the full ts1024 bwd with the pallas scatter
replaced by XLA scatter (if the rest compiles, the row-blocked kernel
is confirmed as the crash site).

Usage: PYTHONPATH=.:~/.axon_site python benchmarks/bisect_scatter.py [n...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from nvdiffrast_tpu.ops import scatter as sc


def run_scatter(name, num_rows, K=6, N=1 << 18):
    """Coherent-id pallas scatter vs the XLA lowering, on chip."""
    rng = np.random.RandomState(0)
    # Spatially coherent ids (sorted-ish), like a texture-grad stream.
    base = np.sort(rng.randint(0, num_rows, N)).astype(np.int32)
    ids = jnp.asarray(base)
    vals = jnp.asarray(rng.randn(K, N).astype(np.float32))

    F = 1
    while K < 8 and (F * 2 * K <= 128) and (F < 8):
        F *= 2
    FK = F * K
    QR = max(-(-(-(-num_rows // F)) // sc._QW) * sc._QW, sc._QW)
    QRB = min(QR, max(sc._PALLAS_MAX_ACC // FK // sc._QW, 1) * sc._QW)
    NB = -(-QR // QRB)

    t0 = time.perf_counter()
    try:
        out = jax.jit(lambda i, v: sc.scatter_add_by_id(
            i, v, num_rows, method="pallas", coherent=True))(ids, vals)
        jax.block_until_ready(out)
        ref = jax.jit(lambda i, v: sc.scatter_add_by_id(
            i, v, num_rows, method="scatter"))(ids, vals)
        err = float(jnp.max(jnp.abs(out - ref))
                    / (jnp.max(jnp.abs(ref)) + 1e-30))
        dt = time.perf_counter() - t0
        print(f"{name} (NB={NB}): OK ({dt:.1f}s)  max-rel-vs-xla {err:.2e}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        dt = time.perf_counter() - t0
        print(f"{name} (NB={NB}): FAIL after {dt:.1f}s  "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)


def run_bwd_xla_scatter(name):
    """Full ts1024 bwd with scatter_add_by_id forced to XLA lowering."""
    from nvdiffrast_tpu.ops.texture import texture
    orig = sc.scatter_add_by_id

    def forced(ids, vals_t, num_rows, method="auto", coherent=False):
        return orig(ids, vals_t, num_rows, method="scatter")

    rng = np.random.RandomState(0)
    tex = jnp.asarray(rng.rand(1, 1024, 1024, 3).astype(np.float32))
    res = 256
    yy, xx = np.meshgrid(np.linspace(0, 1, res), np.linspace(0, 1, res),
                         indexing="ij")
    uv = jnp.asarray(np.stack([xx, yy], -1)[None].astype(np.float32))
    uv_da = jnp.asarray(np.full((1, res, res, 4), 2e-3, np.float32))

    def loss(t):
        o = texture(t, uv, uv_da=uv_da,
                    filter_mode="linear-mipmap-linear",
                    boundary_mode="wrap", impl="pallas", max_mip_level=4)
        return jnp.sum(o ** 2)

    import nvdiffrast_tpu.ops.texture_pallas as tp
    saved = tp.scatter_add_by_id if hasattr(tp, "scatter_add_by_id") else None
    sc.scatter_add_by_id = forced
    t0 = time.perf_counter()
    try:
        g = jax.jit(jax.grad(loss))(tex)
        jax.block_until_ready(g)
        print(f"{name}: OK ({time.perf_counter() - t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL after {time.perf_counter() - t0:.1f}s  "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)
    finally:
        sc.scatter_add_by_id = orig
        if saved is not None:
            tp.scatter_add_by_id = saved


CONFIGS = {
    "1": ("scatter 300k rows", lambda: run_scatter("[1] scatter 300k",
                                                   300_000)),
    "2": ("scatter 600k rows", lambda: run_scatter("[2] scatter 600k",
                                                   600_000)),
    "3": ("scatter 1.4M rows", lambda: run_scatter("[3] scatter 1.4M",
                                                   1_400_000)),
    "4": ("ts1024 bwd, XLA scatter", lambda: run_bwd_xla_scatter(
        "[4] ts1024 bwd + xla-scatter")),
}


def main():
    print("backend:", jax.default_backend(), flush=True)
    keys = sys.argv[1:] or list(CONFIGS)
    for k in keys:
        CONFIGS[k][1]()
    print("done", flush=True)


if __name__ == "__main__":
    main()
