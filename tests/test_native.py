"""Native C++ host module tests (built on the fly with g++)."""

import os
import tempfile

import numpy as np
import pytest

from nvdiffrast_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_opposite_table_matches_jax():
    from nvdiffrast_tpu.ops.topology import build_opposite_table as jx

    rng = np.random.RandomState(0)
    # Random triangle soup incl. degenerates and shared edges.
    tri = rng.randint(0, 40, size=(200, 3)).astype(np.int32)
    ref = np.asarray(jx(tri, num_vertices=40))
    out = native.build_opposite_table(tri, num_vertices=40)
    np.testing.assert_array_equal(out, ref)


def test_opposite_table_quad():
    tri = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    op = native.build_opposite_table(tri)
    assert op[0, 0] == 3 and op[1, 1] == 0
    assert op[0, 1] == -1 and op[0, 2] == -1


def test_vertex_normals_sphereish():
    from nvdiffrast_tpu.models import primitives

    tri, vtx = primitives.icosphere(1)
    n = native.vertex_normals(tri, vtx)
    # Icosphere normals are radial.
    r = vtx / np.linalg.norm(vtx, axis=1, keepdims=True)
    dots = np.abs((n * r).sum(axis=1))
    assert dots.min() > 0.99


def test_load_obj_roundtrip():
    obj = """
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vt 0 0
vt 1 0
vt 0 1
vt 1 1
f 1/1 2/2 3/3
f 2/2 4/4 3/3
"""
    with tempfile.NamedTemporaryFile("w", suffix=".obj", delete=False) as f:
        f.write(obj)
        path = f.name
    try:
        pos, tri, uv, uv_tri = native.load_obj(path)
        assert pos.shape == (4, 3)
        assert tri.shape == (2, 3)
        assert uv.shape == (4, 2)
        np.testing.assert_array_equal(tri, [[0, 1, 2], [1, 3, 2]])
        np.testing.assert_array_equal(uv_tri, [[0, 1, 2], [1, 3, 2]])
    finally:
        os.unlink(path)


def test_load_obj_quad_fan_and_negative_indices():
    obj = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f -4 -3 -2 -1
"""
    with tempfile.NamedTemporaryFile("w", suffix=".obj", delete=False) as f:
        f.write(obj)
        path = f.name
    try:
        pos, tri, uv, uv_tri = native.load_obj(path)
        assert tri.shape == (2, 3)  # quad -> 2 triangles
        np.testing.assert_array_equal(tri, [[0, 1, 2], [0, 2, 3]])
        assert (uv_tri == -1).all()
    finally:
        os.unlink(path)
