"""Multi-host (pod-slice) runtime entry points.

The reference is strictly single-process/single-GPU (SURVEY.md §2.6);
multi-host scaling is this framework's north-star extension. The
recipe (jax-ml.github.io/scaling-book): initialize the distributed
runtime, build one global Mesh over every chip of every host, lay the
data-parallel axis over DCN (host boundary) and the spatial/model axes
over ICI, and express programs with shard_map/GSPMD — XLA inserts the
collectives and routes them over the right fabric.

Usage (one call per process, before any other JAX work):

    import nvdiffrast_tpu.parallel.multihost as mh
    mh.initialize()                      # env-driven (TPU pods: automatic)
    mesh = mh.pod_mesh(dp_over_hosts=True)
    step = shard_map_train_step(loss, opt, mesh)   # unchanged code

Every op in this package is pure and shape-static, so the single-chip
pipeline runs unmodified inside shard_map on each chip; only the
gradient psums (dp) and the 1-row AA halo ppermutes (sp) touch the
interconnect. dp collectives are O(params) and ride DCN fine; the sp
halo is latency-bound and must stay on ICI — pod_mesh guarantees that
by construction (hosts axis = slowest-varying = DCN).
"""

import numpy as np

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               **kwargs):
    """Initialize the JAX distributed runtime (idempotent).

    On Cloud TPU pods all arguments are discovered from the environment;
    elsewhere pass them explicitly (reference: jax.distributed docs).
    Safe to call in single-process runs — a no-op when there is nothing
    to coordinate and no coordinator is configured.
    """
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator_address is None and num_processes is None:
        import os

        if not (os.environ.get("COORDINATOR_ADDRESS")
                or os.environ.get("TPU_WORKER_HOSTNAMES")
                or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")):
            return  # single-process environment
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except RuntimeError as e:
        # Backend already initialized (single-process run that merely
        # inherited pod-ish env vars) — proceed single-process.
        import warnings

        warnings.warn(f"multihost.initialize skipped: {e}", stacklevel=2)


def pod_mesh(axis_names=("dp", "sp"), dp_over_hosts=True, devices=None):
    """Global mesh over all hosts: hosts x local-chips.

    dp_over_hosts=True puts the data-parallel axis on the host (DCN)
    boundary and the spatial axis inside each host (ICI) — the layout
    where dp gradient psums cross DCN once per step while the
    latency-sensitive sp halo exchanges stay on ICI.

    Returns a jax.sharding.Mesh with shape
    (num_processes, local_device_count) — or (1, n) single-process.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n_hosts = jax.process_count()
    per_host = devices.size // n_hosts
    grid = devices.reshape(n_hosts, per_host)
    if not dp_over_hosts:
        axis_names = tuple(reversed(axis_names))
        grid = grid.T
    from jax.sharding import Mesh

    return Mesh(grid, axis_names)


def local_batch_slice(global_batch, mesh, dp_axis="dp"):
    """Host-local slice bounds of a dp-sharded global batch.

    Multi-host data loading: each process feeds only its own shard.
    Returns (start, size) for this process along the batch axis.
    """
    n_dp = mesh.shape[dp_axis]
    per = global_batch // n_dp
    # dp is laid out over hosts (pod_mesh): process i owns shard i.
    start = (jax.process_index() * n_dp // jax.process_count()) * per
    size = per * max(1, n_dp // jax.process_count())
    return start, size
