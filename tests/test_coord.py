import jax.numpy as jnp
import numpy as np

from nvdiffrast_tpu.ops import coord


def test_pixel_centers():
    fx, fy = coord.pixel_centers(4, 8)
    # Pixel center of px=0 in an 8-wide image: (2*0+1)/8 - 1 = -0.875.
    np.testing.assert_allclose(np.asarray(fx[0]), -0.875, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fx[-1]), 0.875, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fy[0]), -0.75, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fy[-1]), 0.75, rtol=1e-6)


def test_triidx_codec_small():
    ids = jnp.array([0, 1, 2, 1000, 16777215, 16777216], jnp.int32)
    enc = coord.triidx_to_float(ids)
    np.testing.assert_array_equal(np.asarray(enc), np.asarray(ids, np.float32))
    dec = coord.float_to_triidx(enc)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(ids))


def test_triidx_codec_large():
    # Beyond 2^24, the encoding is a bit trick; round trip must hold up
    # to the documented max (reference: csrc/common/common.h:190).
    ids = jnp.array(
        [16777217, 20000000, 123456789, coord.MAX_TRIANGLE_ID], jnp.int32)
    dec = coord.float_to_triidx(coord.triidx_to_float(ids))
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(ids))


def test_triidx_codec_unique():
    # Encodings must be distinct floats across the boundary.
    ids = jnp.arange(16777210, 16777230, dtype=jnp.int32)
    enc = np.asarray(coord.triidx_to_float(ids))
    assert len(np.unique(enc)) == len(enc)
