"""Device mesh construction helpers."""

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(shape=None, axis_names=("dp", "sp"), devices=None):
    """Create a Mesh over the available devices.

    Args:
      shape: tuple matching axis_names; None = put all devices on the
        first axis.
      axis_names: mesh axis names; by convention "dp" = data parallel
        (minibatch), "sp" = spatial (image rows).
      devices: explicit device list (default: jax.devices()).

    Returns:
      jax.sharding.Mesh
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not match {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def default_mesh(n_devices=None):
    """A (dp, sp) mesh: batch-major, spatial axis second."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    # Prefer a 2D factorization when possible (dp x sp).
    sp = 1
    for cand in (4, 2):
        if n % cand == 0 and n > cand:
            sp = cand
            break
    return make_mesh((n // sp, sp), ("dp", "sp"), devices)
