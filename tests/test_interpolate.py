import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nvdiffrast_tpu as dr


def _setup():
    pos = jnp.array(
        [[[-0.8, -0.8, 0.0, 1.0],
          [0.8, -0.8, 0.0, 1.0],
          [-0.8, 0.8, 0.0, 1.0]]], jnp.float32)
    tri = jnp.array([[0, 1, 2]], jnp.int32)
    rast, rast_db = dr.rasterize(None, pos, tri, (16, 16))
    return pos, tri, rast, rast_db


def test_basic_interpolation_matches_barycentrics():
    pos, tri, rast, _ = _setup()
    attr = jnp.array([[[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]]], jnp.float32)
    out, out_da = dr.interpolate(attr, rast, tri)
    # out[..., 0] must equal b0 (rast ch0), out[..., 1] = b1 where covered.
    covered = np.asarray(rast[..., 3]) > 0
    np.testing.assert_allclose(np.asarray(out[..., 0])[covered],
                               np.asarray(rast[..., 0])[covered], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[..., 1])[covered],
                               np.asarray(rast[..., 1])[covered], atol=1e-6)
    # Background pixels are zero.
    assert np.all(np.asarray(out)[~covered] == 0)
    assert out_da.shape == (1, 16, 16, 0)


def test_diff_attrs_all_and_list():
    pos, tri, rast, rast_db = _setup()
    attr = jnp.array([[[1.0, 2.0, 3.0], [0.0, 1.0, -1.0], [2.0, 0.0, 1.0]]],
                     jnp.float32)
    out_all, da_all = dr.interpolate(attr, rast, tri, rast_db=rast_db,
                                     diff_attrs="all")
    assert da_all.shape == (1, 16, 16, 6)
    out_sel, da_sel = dr.interpolate(attr, rast, tri, rast_db=rast_db,
                                     diff_attrs=[2])
    np.testing.assert_array_equal(np.asarray(da_sel[..., 0]),
                                  np.asarray(da_all[..., 4]))
    np.testing.assert_array_equal(np.asarray(da_sel[..., 1]),
                                  np.asarray(da_all[..., 5]))
    # Negative (Python-style) index.
    out_neg, da_neg = dr.interpolate(attr, rast, tri, rast_db=rast_db,
                                     diff_attrs=[-1])
    np.testing.assert_array_equal(np.asarray(da_neg), np.asarray(da_sel))


def test_attr_broadcast_minibatch():
    pos, tri, _, _ = _setup()
    pos2 = jnp.concatenate([pos, pos], axis=0)
    rast, _ = dr.rasterize(None, pos2, tri, (16, 16))
    attr = jnp.array([[[1.0], [2.0], [3.0]]], jnp.float32)  # [1, V, A]
    out, _ = dr.interpolate(attr, rast, tri)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(out[1]))


def test_attr_gradients_are_barycentric_weights():
    pos, tri, rast, _ = _setup()
    attr = jnp.zeros((1, 3, 1), jnp.float32)

    def loss(a):
        out, _ = dr.interpolate(a, rast, tri)
        return jnp.sum(out)

    g = jax.grad(loss)(attr)
    # d out / d attr_v = sum over covered pixels of bary_v.
    r = np.asarray(rast)
    covered = r[..., 3] > 0
    b0 = r[..., 0][covered].sum()
    b1 = r[..., 1][covered].sum()
    b2 = (1 - r[..., 0] - r[..., 1])[covered].sum()
    np.testing.assert_allclose(np.asarray(g[0, :, 0]), [b0, b1, b2],
                               rtol=1e-5)


def test_rast_gradient_lands_in_uv_channels():
    pos, tri, rast, rast_db = _setup()
    attr = jnp.array([[[1.0], [2.0], [4.0]]], jnp.float32)

    def loss(r):
        out, _ = dr.interpolate(attr, r, tri)
        return jnp.sum(out ** 2)

    g = np.asarray(jax.grad(loss)(rast))
    # Gradients w.r.t. z/w and id channels must be zero
    # (reference: interpolate.cu:213 writes zeros to channels 2,3).
    assert np.abs(g[..., 2]).sum() == 0
    assert np.abs(g[..., 3]).sum() == 0
    assert np.abs(g[..., 0]).sum() > 0


def test_da_gradient_flows_to_rast_db():
    pos, tri, rast, rast_db = _setup()
    attr = jnp.array([[[1.0], [2.0], [4.0]]], jnp.float32)

    def loss(rdb):
        _, da = dr.interpolate(attr, rast, tri, rast_db=rdb, diff_attrs="all")
        return jnp.sum(da ** 2)

    g = np.asarray(jax.grad(loss)(rast_db))
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0


def test_range_mode_attrs():
    pos = jnp.array(
        [[-0.8, -0.8, 0.0, 1.0], [0.8, -0.8, 0.0, 1.0], [-0.8, 0.8, 0.0, 1.0]],
        jnp.float32)
    tri = jnp.array([[0, 1, 2]], jnp.int32)
    ranges = jnp.array([[0, 1]], jnp.int32)
    rast, _ = dr.rasterize(None, pos, tri, (16, 16), ranges=ranges)
    attr = jnp.array([[1.0], [2.0], [3.0]], jnp.float32)  # [V, A] range mode
    out, _ = dr.interpolate(attr, rast, tri)
    covered = np.asarray(rast[..., 3]) > 0
    vals = np.asarray(out[..., 0])[covered]
    assert (vals >= 1.0 - 1e-5).all() and (vals <= 3.0 + 1e-5).all()


def test_attr_broadcast_gradient_sums_over_minibatch():
    """A [1, V, A] attribute broadcast over B images accumulates
    gradient contributions from every image (reference semantics)."""
    import jax
    import nvdiffrast_tpu as dr

    pos1 = jnp.array(
        [[[-0.8, -0.8, 0.0, 1.0], [0.8, -0.8, 0.0, 1.0],
          [-0.8, 0.8, 0.0, 1.0]]], jnp.float32)
    pos = jnp.concatenate([pos1, pos1], axis=0)  # two identical views
    tri = jnp.array([[0, 1, 2]], jnp.int32)
    attr = jnp.array([[[1.0], [2.0], [3.0]]], jnp.float32)  # [1, 3, 1]

    rast, _ = dr.rasterize(None, pos, tri, (32, 32))

    def loss_b(a):
        out, _ = dr.interpolate(a, rast, tri)
        return jnp.sum(out)

    def loss_1(a):
        out, _ = dr.interpolate(a, rast[:1], tri)
        return jnp.sum(out)

    g_b = jax.grad(loss_b)(attr)
    g_1 = jax.grad(loss_1)(attr)
    assert g_b.shape == attr.shape
    np.testing.assert_allclose(np.asarray(g_b), 2 * np.asarray(g_1),
                               rtol=1e-6)


def test_negative_diff_attrs_indices():
    import nvdiffrast_tpu as dr

    pos = jnp.array(
        [[[-0.8, -0.8, 0.0, 1.0], [0.8, -0.8, 0.0, 1.0],
          [-0.8, 0.8, 0.0, 1.0]]], jnp.float32)
    tri = jnp.array([[0, 1, 2]], jnp.int32)
    attr = jnp.array([[0.0, 1.0, 2.0], [1.0, 0.0, 3.0], [0.0, 0.0, 4.0]],
                     jnp.float32)
    rast, rast_db = dr.rasterize(None, pos, tri, (32, 32))
    _, da_neg = dr.interpolate(attr, rast, tri, rast_db=rast_db,
                               diff_attrs=[-1])
    _, da_pos = dr.interpolate(attr, rast, tri, rast_db=rast_db,
                               diff_attrs=[2])
    np.testing.assert_allclose(np.asarray(da_neg), np.asarray(da_pos))
