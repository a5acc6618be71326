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


def _distributed_client_active():
    """True iff jax.distributed.initialize already ran in this process."""
    try:
        return jax.distributed.is_initialized()
    except AttributeError:  # older jax
        from jax._src import distributed

        return distributed.global_state.client is not None


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               **kwargs):
    """Initialize the JAX distributed runtime (idempotent).

    On Cloud TPU pods all arguments are discovered from the environment;
    elsewhere pass them explicitly (reference: jax.distributed docs).
    Safe to call in single-process runs — a no-op when there is nothing
    to coordinate and no coordinator is configured.

    MUST be called before any other JAX API that initializes the XLA
    backends (jax.devices, jax.process_count, any computation). When a
    coordinator IS configured (args or pod env vars) but the backend
    was already touched, this raises — a silent single-process
    fallback on a real pod would mean N independent jobs, not one.
    """
    if _distributed_client_active():
        return  # idempotent: distributed runtime already up
    import os

    # TPU_WORKER_HOSTNAMES is a comma-separated worker list; a single
    # entry (e.g. 'localhost' on one-chip dev machines) is NOT a pod.
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    env_pod = bool(os.environ.get("COORDINATOR_ADDRESS")
                   or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
                   or len([w for w in workers.split(",") if w.strip()]) > 1)
    if coordinator_address is None and num_processes is None and not env_pod:
        return  # single-process environment
    # May raise RuntimeError ('must be called before any JAX
    # computations') if the backend was touched first. That is a real
    # multi-process setup going wrong — never downgrade it to a
    # warning: a silent fallback on a pod means N independent jobs.
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


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
    Returns (start, size) for this process along the batch axis,
    derived from the mesh's actual device layout (which dp coordinates
    this process's local devices cover) — correct for dp-over-hosts,
    dp-within-host, and mixed layouts alike.
    """
    n_dp = mesh.shape[dp_axis]
    per = global_batch // n_dp
    axis = mesh.axis_names.index(dp_axis)
    dev = np.asarray(mesh.devices)
    pid = jax.process_index()
    proc = np.vectorize(lambda d: d.process_index)(dev)
    coords = np.argwhere(proc == pid)
    if coords.size == 0:
        return 0, 0  # process owns no device of this mesh
    dp_lo = int(coords[:, axis].min())
    dp_hi = int(coords[:, axis].max())
    return dp_lo * per, (dp_hi - dp_lo + 1) * per
