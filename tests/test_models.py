"""Convergence smoke tests for the model families (tiny budgets)."""

import numpy as np
import pytest


def test_cube_fit_improves():
    from nvdiffrast_tpu.models.fit_cube import CubeFitModel

    m = CubeFitModel(resolution=16, seed=0)
    e0 = m.geometric_error()
    for _ in range(40):
        m.step()
    assert m.geometric_error() < e0


def test_earth_fit_improves():
    from nvdiffrast_tpu.models.fit_earth import EarthFitModel

    m = EarthFitModel(res=32, ref_res=64, tex_res=(32, 64), max_mip_level=4,
                      seed=0)
    p0 = m.texture_psnr()
    for _ in range(30):
        m.step()
    assert m.texture_psnr() > p0


def test_envphong_fit_improves():
    from nvdiffrast_tpu.models.fit_envphong import EnvPhongFitModel

    m = EnvPhongFitModel(res=32, env_res=8, subdiv=1, seed=0)
    e0 = m.metrics()[0]
    for _ in range(30):
        m.step()
    assert m.metrics()[0] < e0


def test_pose_fit_reduces_angle():
    from nvdiffrast_tpu.models.fit_pose import PoseFitModel

    m = PoseFitModel(resolution=24, seed=0)
    a0 = m.angle_error()
    err = m.fit(max_iter=60)
    assert err <= a0
