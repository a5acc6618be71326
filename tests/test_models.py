"""Convergence tests with absolute quality bars.

Mirrors the reference samples' logged quality metrics (SURVEY.md §4):
pose angular error in degrees (samples/torch/pose.py:213-219), earth
texture PSNR (earth.py:114-148), cube geometric error (cube.py:108-120),
envphong env-map RMSE (envphong.py:154-162). Budgets are sized for CPU
CI; bars carry ~2x margin over measured results at these budgets, so a
gradient-quality regression (which slows convergence long before it
breaks improvement) fails the test.
"""

import numpy as np
import pytest


def test_cube_fit_converges():
    from nvdiffrast_tpu.models.fit_cube import CubeFitModel

    m = CubeFitModel(resolution=16, seed=0)
    e0 = m.geometric_error()
    assert e0 > 0.3  # sanity: starts far away
    for _ in range(150):
        m.step()
    e = m.geometric_error()
    # Measured 0.023 @200 steps, 0.0052 @300; 0.08 @150 holds 2x margin.
    assert e < 0.08, f"cube geometric error {e:.4f} (bar 0.08, from {e0:.3f})"


def test_earth_fit_psnr():
    from nvdiffrast_tpu.models.fit_earth import EarthFitModel

    m = EarthFitModel(res=32, ref_res=64, tex_res=(32, 64), max_mip_level=4,
                      seed=0)
    p0 = m.texture_psnr()
    for _ in range(50):
        m.step()
    p = m.texture_psnr()
    # Measured: 6.9 dB start, 13.3 dB @100 steps; 10.0 dB @50 has margin.
    assert p > 10.0, f"earth texture PSNR {p:.2f} dB (bar 10.0, from {p0:.2f})"


def test_envphong_fit_rmse():
    from nvdiffrast_tpu.models.fit_envphong import EnvPhongFitModel

    m = EnvPhongFitModel(res=32, env_res=8, subdiv=1, seed=0)
    e0 = m.metrics()[0]
    for _ in range(150):
        m.step()
    env_rmse, rgb_rmse, exp_rel = m.metrics()
    # Measured env RMSE 0.012 @150 steps from 0.265.
    assert env_rmse < 0.03, (
        f"envphong env RMSE {env_rmse:.4f} (bar 0.03, from {e0:.3f})")


def test_pose_fit_angle():
    from nvdiffrast_tpu.models.fit_pose import PoseFitModel

    m = PoseFitModel(resolution=24, seed=0)
    a0 = m.angle_error()
    err = m.fit(max_iter=300)
    # Reference quality bar: < 2 degrees (pose.py logs angle in deg and
    # converges to fractions of a degree). Measured 0.60 deg here.
    assert err < 2.0, f"pose angular error {err:.2f} deg (bar 2.0, from {a0:.1f})"
