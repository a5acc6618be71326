"""Per-stage cost of the fused pipeline backward kernel (dev tool).

Sets pipeline_pallas._ABLATE to compile stage groups OUT of
pipeline_bwd and times the full headline grad step for each config;
adjacent-line differences give each stage's marginal cost inside the
kernel (the scatters and XLA glue are constant across lines).

Usage: PYTHONPATH=.:~/.axon_site python benchmarks/profile_bwdkernel.py
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import _measure

from nvdiffrast_tpu.ops import pipeline_pallas as pp
from nvdiffrast_tpu.ops.pipeline import render_pipeline
from nvdiffrast_tpu.models import primitives
from nvdiffrast_tpu.utils import camera

RES = int(os.environ.get("BWDK_RES", 2048))
IMPL = os.environ.get("BWDK_IMPL", "auto")


def main():
    pos_idx, vtxp, col_idx, _ = primitives.uv_sphere(32, 64)
    vtxc = (vtxp * 0.5 + 0.5).astype(np.float32)
    tri = jnp.asarray(pos_idx)
    print(f"triangles: {pos_idx.shape[0]}, res: {RES}", flush=True)
    mvp = camera.projection(x=0.4) @ camera.translate(0, 0, -3.5)
    posw = np.concatenate([vtxp, np.ones_like(vtxp[:, :1])], axis=1)
    pos_clip = jnp.asarray((posw @ mvp.T)[None].astype(np.float32))
    col = jnp.asarray(vtxc)
    # attr must be [V, A<=8]; reuse colors (A=3) like bench.py.
    pcs = [pos_clip * jnp.float32(1 + i * 1e-6) for i in range(8)]
    argsets = [(p, col) for p in pcs]

    configs = [
        ("all ablated (streams+glue+scatters)",
         {"aa", "roll", "interp", "raster"}),
        ("+ interp", {"aa", "roll", "raster"}),
        ("+ raster", {"aa", "roll"}),
        ("+ aa replay", {"roll"}),
        ("full (production)", set()),
    ]

    def make_step(token):
        def step(p, c):
            def loss(p_):
                img = render_pipeline(p_, tri, c, (RES, RES), impl=IMPL)
                return jnp.sum(img * img)

            g = jax.grad(loss)(p)
            return (jnp.sum(g) + token,)

        return step

    prev = None
    for i, (name, abl) in enumerate(configs):
        pp._ABLATE = frozenset(abl)
        dt = _measure(jax.jit(make_step(jnp.float32(i))), argsets)
        marg = "" if prev is None else f"   (+{(dt - prev) * 1e3:6.2f} ms)"
        print(f"{name:40s} {dt * 1e3:8.2f} ms{marg}", flush=True)
        prev = dt
    pp._ABLATE = frozenset()
    print("done", flush=True)


if __name__ == "__main__":
    main()
