"""Earth texture-fitting sample: learn a texture, with/without mips.

Mirror of the reference sample samples/torch/earth.py:43-173: learn a
sphere texture from renders; `--mip` enables trilinear sampling with
uv derivatives (interpolate diff_attrs='all' -> texture
linear-mipmap-linear), which is what removes aliasing in the learned
texture. The reference's earth.npz blob is absent, so the target
texture is procedural; optimization structure and the texture-PSNR
metric match.

Usage: python samples/earth.py [--mip | --no-mip] [--max-iter 1000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description="Earth texture fit example")
    mip = ap.add_mutually_exclusive_group()
    mip.add_argument("--mip", dest="mip", action="store_true", default=True)
    mip.add_argument("--no-mip", dest="mip", action="store_false")
    ap.add_argument("--max-iter", type=int, default=1000)
    ap.add_argument("--log-interval", type=int, default=100)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--max-mip-level", type=int, default=9)
    ap.add_argument("--tex-res", type=str, default="128x256",
                    help="texture HxW; the reference's atlas is "
                         "1536x2048 (samples/torch/earth.py:73) and is "
                         "served by the fused big-texture sampler")
    args = ap.parse_args()

    from nvdiffrast_tpu.models.fit_earth import EarthFitModel

    th, tw = (int(x) for x in args.tex_res.split("x"))
    model = EarthFitModel(res=args.res, enable_mip=args.mip,
                          max_mip_level=args.max_mip_level,
                          tex_res=(th, tw))
    psnr = model.fit(max_iter=args.max_iter, log_interval=args.log_interval)
    print(f"final texture PSNR: {psnr:.2f} dB (mip={'on' if args.mip else 'off'})")


if __name__ == "__main__":
    main()
