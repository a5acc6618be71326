"""Cube fitting sample: vertex position + color optimization.

Mirror of the reference sample samples/torch/cube.py:40-158: fit cube
geometry and vertex colors from low-resolution renders; antialias
position gradients are what make convergence possible at 4-16 px.

Usage: python samples/cube.py [--resolution 16] [--discontinuous]
       [--max-iter 1000] [--log-interval 100]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description="Cube fit example")
    ap.add_argument("--discontinuous", action="store_true",
                    help="use the split-vertex (discontinuous) cube")
    ap.add_argument("--resolution", type=int, default=16,
                    help="rendering resolution (reference uses 4-16)")
    ap.add_argument("--max-iter", type=int, default=1000)
    ap.add_argument("--log-interval", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-2)
    args = ap.parse_args()

    from nvdiffrast_tpu.models.fit_cube import CubeFitModel

    model = CubeFitModel(resolution=args.resolution,
                         discontinuous=args.discontinuous, lr=args.lr)
    err = model.fit(max_iter=args.max_iter, log_interval=args.log_interval)
    print(f"final geometric error: {err:.6f}")


if __name__ == "__main__":
    main()
