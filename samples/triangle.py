"""Smoke test: rasterize one triangle and save tri.png.

Mirror of the reference's install-verification sample
(samples/torch/triangle.py:17-30) — "Running this should be the first
step to verify that you have everything set up correctly".

Usage: python samples/triangle.py [--outdir .] [--res 256]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import nvdiffrast_tpu as dr
from nvdiffrast_tpu.utils import image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default=".")
    ap.add_argument("--res", type=int, default=256)
    args = ap.parse_args()

    glctx = dr.RasterizeCudaContext()
    pos = jnp.asarray([[[-0.8, -0.8, 0, 1], [0.8, -0.8, 0, 1],
                        [-0.8, 0.8, 0, 1]]], jnp.float32)
    col = jnp.asarray([[[1, 0, 0], [0, 1, 0], [0, 0, 1]]], jnp.float32)
    tri = jnp.asarray([[0, 1, 2]], jnp.int32)

    rast, _ = dr.rasterize(glctx, pos, tri, resolution=(args.res, args.res))
    out, _ = dr.interpolate(col, rast, tri)

    img = np.asarray(out[0])
    print(f"Saving to '{args.outdir}/tri.png'.")
    image.save_image(os.path.join(args.outdir, "tri.png"), img)


if __name__ == "__main__":
    main()
