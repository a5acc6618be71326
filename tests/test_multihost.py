"""Multi-host entry points (single-process behavior on the CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from nvdiffrast_tpu.parallel import multihost


def test_initialize_noop_single_process():
    # No coordinator configured -> must be a harmless no-op.
    multihost.initialize()
    assert jax.process_count() == 1


def test_pod_mesh_layout():
    mesh = multihost.pod_mesh()
    assert mesh.axis_names == ("dp", "sp")
    assert mesh.shape["dp"] == jax.process_count()
    assert mesh.shape["sp"] == len(jax.devices()) // jax.process_count()

    mesh2 = multihost.pod_mesh(dp_over_hosts=False)
    assert mesh2.axis_names == ("sp", "dp")


def test_pod_mesh_usable_for_sharding():
    mesh = multihost.pod_mesh()
    x = jnp.arange(16.0).reshape(8, 2)
    xs = jax.device_put(x, NamedSharding(mesh, P("sp")))
    y = jax.jit(lambda a: (a * 2).sum())(xs)
    assert float(y) == float(x.sum() * 2)


def test_local_batch_slice():
    mesh = multihost.pod_mesh()
    start, size = multihost.local_batch_slice(16, mesh, dp_axis="dp")
    assert start == 0 and size == 16  # single process owns everything
