"""Pose fitting sample: recover a rotation from rendered images.

Mirror of the reference sample samples/torch/pose.py:120-249: two
phases (random search, then gradient descent) recovering a cube's pose
from color renders; relies on antialias position gradients for the
gradient phase.

Usage: python samples/pose.py [--max-iter 300]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description="Pose fit example")
    ap.add_argument("--max-iter", type=int, default=300)
    ap.add_argument("--log-interval", type=int, default=50)
    ap.add_argument("--resolution", type=int, default=64)
    args = ap.parse_args()

    from nvdiffrast_tpu.models.fit_pose import PoseFitModel

    model = PoseFitModel(resolution=args.resolution)
    err = model.fit(max_iter=args.max_iter, log_interval=args.log_interval)
    print(f"final pose angle error: {err:.4f} degrees")


if __name__ == "__main__":
    main()
