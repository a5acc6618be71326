"""Numerics substrate: clip->pixel transforms and the triangle-ID codec.

Semantics match the reference implementation:

* Pixel-center to clip-space mapping ``f = s * p + o`` with
  ``xs=2/W, xo=1/W-1, ys=2/H, yo=1/H-1`` so pixel ``(px, py)`` has its
  center at NDC ``((2*px+1)/W - 1, (2*py+1)/H - 1)``
  (reference: csrc/torch/torch_rasterize.cpp:146-149).
* Triangle IDs are stored in a float32 channel. Values up to 16,777,216
  convert trivially; larger values are mapped to unique float32 bit
  patterns (reference: csrc/common/common.h:186-193). The largest
  round-trippable ID is 889,192,447.
"""

import jax
import jax.numpy as jnp

# Largest triangle ID that survives the float32 round trip.
MAX_TRIANGLE_ID = 889192447

# IDs <= this value are represented exactly as plain float32.
_EXACT_ID_LIMIT = 0x01000000  # 16777216

_BIG_ID_BIAS = 0x4A800000


def pixel_scale_offset(height, width):
    """Return (xs, xo, ys, yo) mapping pixel index -> clip-space coordinate."""
    xs = 2.0 / float(width)
    xo = 1.0 / float(width) - 1.0
    ys = 2.0 / float(height)
    yo = 1.0 / float(height) - 1.0
    return xs, xo, ys, yo


def pixel_centers(height, width, dtype=jnp.float32):
    """Clip-space coordinates of all pixel centers.

    Returns:
      (fx, fy): fx has shape [width], fy has shape [height].
    """
    xs, xo, ys, yo = pixel_scale_offset(height, width)
    fx = jnp.arange(width, dtype=dtype) * jnp.asarray(xs, dtype) + jnp.asarray(xo, dtype)
    fy = jnp.arange(height, dtype=dtype) * jnp.asarray(ys, dtype) + jnp.asarray(yo, dtype)
    return fx, fy


def triidx_to_float(idx):
    """Encode int32 triangle IDs (1-based, 0 = empty) as float32."""
    idx = jnp.asarray(idx, jnp.int32)
    small = idx.astype(jnp.float32)
    big = jax.lax.bitcast_convert_type(idx + jnp.int32(_BIG_ID_BIAS), jnp.float32)
    return jnp.where(idx <= _EXACT_ID_LIMIT, small, big)


def float_to_triidx(x):
    """Decode float32-encoded triangle IDs back to int32."""
    x = jnp.asarray(x, jnp.float32)
    # Values <= 16777216.0 are exact integers; larger encodings are bitcasts.
    small = x.astype(jnp.int32)
    big = jax.lax.bitcast_convert_type(x, jnp.int32) - jnp.int32(_BIG_ID_BIAS)
    return jnp.where(x <= jnp.float32(16777216.0), small, big)
