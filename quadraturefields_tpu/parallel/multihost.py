"""Multi-host (multi-process) initialization and mesh construction.

The reference is strictly single-process (SURVEY §2.4: hard-coded
`cuda:0`, no launcher, no torch.distributed — e.g.
/root/reference/examples/train_ngp_nerf_sg_occ.py:153), so nothing here
has a reference counterpart; it closes the one SURVEY §2.4 inventory
row a TPU-native framework still owes: when a pod slice spans several
hosts, each host process must join a jax.distributed cluster before any
device query, build its mesh from GLOBAL devices, and feed its local
shard of the ray batch into a global sharded array.

Single-host (and the CI virtual-CPU mesh) paths are unchanged: every
function degrades to a no-op / plain local construction when the
process count is 1.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """jax.distributed.initialize, gated so single-host runs never pay
    for it. Returns True when a multi-process runtime is (already)
    active.

    Resolution order per argument: explicit parameter, then the
    QF_COORDINATOR / QF_NUM_PROCESSES / QF_PROCESS_ID env vars, then
    JAX's own auto-detection (TPU pod metadata / SLURM). Called at CLI
    entry; idempotent.

    Ordering constraint (ADVICE r4 high): jax.distributed.initialize
    must run BEFORE any call that instantiates the XLA backend —
    including jax.process_count()/jax.devices(), whose results are then
    cached. So when a coordinator config is present we initialize
    first and never pre-query the backend; the process_count() probe is
    only the fallback for configless auto-detected environments.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "QF_COORDINATOR"
    )
    if num_processes is None and "QF_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["QF_NUM_PROCESSES"])
    if process_id is None and "QF_PROCESS_ID" in os.environ:
        process_id = int(os.environ["QF_PROCESS_ID"])

    if coordinator_address is not None or num_processes not in (None, 1):
        # explicit config: initialize before touching the backend
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _INITIALIZED = True
        return True
    # no config: either JAX auto-detected a pod runtime earlier in this
    # process (process_count > 1) or we are single-host
    if jax.process_count() > 1:
        _INITIALIZED = True
        return True
    return False  # single-host: nothing to do


def mesh_device_grid(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
):
    """The device list a 1-D DP mesh should use, process-aware.

    Multi-process rule: jax.devices() is GLOBAL and every process must
    construct the identical mesh over it; truncating to a prefix that
    excludes some process's local devices would deadlock its
    collectives, so n_devices must then be a multiple of
    devices-per-process covering whole processes (validated here with a
    clear error instead of a hang).
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if n_devices is None:
        return devices
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices, only {len(devices)} present"
        )
    if jax.process_count() > 1:
        per_proc = len(devices) // jax.process_count()
        if n_devices % per_proc != 0:
            raise ValueError(
                f"multi-process mesh must cover whole processes: "
                f"n_devices={n_devices} is not a multiple of the "
                f"{per_proc} devices per process"
            )
        # keep whole processes, in process order (devices are already
        # ordered process-major by jax.devices())
        devices = devices[:n_devices]
    else:
        devices = devices[:n_devices]
    return devices


def make_global_mesh(
    n_devices: Optional[int] = None, axis: str = "data"
) -> Mesh:
    """1-D mesh over (a whole-process prefix of) the global device
    list. On one host this is parallel/dp.py's make_mesh; on a pod it
    is the construction every process must perform identically."""
    return Mesh(np.asarray(mesh_device_grid(n_devices)), (axis,))


def process_local_slice(global_n: int, mesh: Mesh, axis: str = "data"):
    """(start, size) of the leading-axis slice of a [global_n, ...]
    batch that THIS process must materialize locally.

    The ray batch shards equally over the mesh's devices; a process
    owns the contiguous run of shards belonging to its local devices.
    global_n must divide by the mesh size (the batching buckets are
    multiples of 256, so any n_devices <= 256 divides)."""
    n_dev = mesh.devices.size
    if global_n % n_dev != 0:
        raise ValueError(
            f"global batch {global_n} not divisible by mesh size {n_dev}"
        )
    per_dev = global_n // n_dev
    mesh_devs = list(mesh.devices.flat)
    local = [i for i, d in enumerate(mesh_devs)
             if d.process_index == jax.process_index()]
    if not local:
        return 0, 0  # this process holds no shard of this mesh
    # a process's devices are contiguous in the process-major order
    start, stop = min(local), max(local) + 1
    if local != list(range(start, stop)):
        raise ValueError(
            "process-local devices are not contiguous in the mesh; "
            "construct the mesh from jax.devices() order"
        )
    return start * per_dev, (stop - start) * per_dev


def put_process_batch(arrays, mesh: Mesh, sharding, axis: str = "data"):
    """Place [global_n, ...] host batches onto a DP sharding, correct
    in BOTH runtimes (ADVICE r4 medium: trainers used to device_put the
    full batch against the global mesh, which raises on a pod).

    Single-process: plain device_put. Multi-process: every process must
    hold the SAME deterministic global batch (the data loaders draw
    from fixed-seed numpy Generators, so identical call sequences give
    identical batches on every host); each process then materializes
    only its process_local_slice and assembles the global jax.Array via
    make_array_from_process_local_data."""
    arrays = [np.asarray(a) for a in arrays]
    if jax.process_count() == 1:
        return tuple(jax.device_put(a, sharding) for a in arrays)
    n = arrays[0].shape[0]
    start, size = process_local_slice(n, mesh, axis)
    return global_ray_batch(
        [a[start:start + size] for a in arrays], n, mesh, axis
    )


def global_ray_batch(
    local_arrays, global_n: int, mesh: Mesh, axis: str = "data"
):
    """Assemble jax.Arrays sharded P(axis) over the mesh from each
    process's LOCAL numpy slice (the slice process_local_slice names).

    Single-process: equivalent to device_put with the sharded layout.
    Multi-process: uses jax.make_array_from_process_local_data, so no
    host ever materializes the full global batch.
    """
    sharding = NamedSharding(mesh, P(axis))
    out = []
    for a in local_arrays:
        a = np.asarray(a)
        global_shape = (global_n,) + a.shape[1:]
        if jax.process_count() == 1:
            out.append(jax.device_put(a, sharding))
        else:
            out.append(
                jax.make_array_from_process_local_data(
                    sharding, a, global_shape
                )
            )
    return tuple(out)
