"""Host-side argument validation (reference NVDR_CHECK parity).

Mirrors csrc/torch/torch_rasterize.cpp:50-57 and
torch_antialias.cpp:79-86 style shape/range rejection.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import nvdiffrast_tpu as dr


def _tri():
    return jnp.asarray([[0, 1, 2]], jnp.int32)


def _pos():
    return jnp.asarray(
        [[[-0.5, -0.5, 0, 1], [0.5, -0.5, 0, 1], [0, 0.5, 0, 1]]],
        jnp.float32)


def test_rasterize_rejects_bad_pos_shape():
    with pytest.raises(ValueError, match="pos must be"):
        dr.rasterize(None, jnp.zeros((1, 3, 3)), _tri(), (8, 8))


def test_rasterize_rejects_bad_tri_shape():
    with pytest.raises(ValueError, match="tri must be"):
        dr.rasterize(None, _pos(), jnp.zeros((3, 2), jnp.int32), (8, 8))


def test_rasterize_rejects_out_of_range_indices():
    bad = jnp.asarray([[0, 1, 7]], jnp.int32)
    with pytest.raises(ValueError, match="out of range"):
        dr.rasterize(None, _pos(), bad, (8, 8))
    bad = jnp.asarray([[0, -2, 2]], jnp.int32)
    with pytest.raises(ValueError, match="out of range"):
        dr.rasterize(None, _pos(), bad, (8, 8))


def test_rasterize_rejects_giant_mesh():
    tri = jnp.zeros((1 << 24, 3), jnp.int32)
    with pytest.raises(ValueError, match="2\\*\\*24"):
        dr.rasterize(None, _pos(), tri, (8, 8))


def test_rasterize_rejects_bad_ranges():
    pos2d = _pos()[0]
    with pytest.raises(ValueError, match="range mode requires"):
        dr.rasterize(None, pos2d, _tri(), (8, 8))
    with pytest.raises(ValueError, match="ranges"):
        dr.rasterize(None, pos2d, _tri(), (8, 8),
                     ranges=np.zeros((2, 3), np.int32))


def test_antialias_rejects_minibatch_mismatch():
    rast, _ = dr.rasterize(None, _pos(), _tri(), (8, 8))
    color = jnp.zeros((1, 8, 8, 3))
    pos_bad = jnp.broadcast_to(_pos(), (2, 3, 4))
    with pytest.raises(ValueError, match="minibatch"):
        dr.antialias(color, rast, pos_bad, _tri())


def test_antialias_rejects_resolution_mismatch():
    rast, _ = dr.rasterize(None, _pos(), _tri(), (8, 8))
    color = jnp.zeros((1, 4, 8, 3))
    with pytest.raises(ValueError, match="mismatch"):
        dr.antialias(color, rast, _pos(), _tri())
