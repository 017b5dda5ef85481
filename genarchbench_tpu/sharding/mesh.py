"""Device-mesh construction and data-parallel sharding helpers.

The reference parallelizes every kernel with OpenMP `parallel for` over
independent work items (SURVEY.md §2.4, e.g. chain/src/host_kernel.cpp:98,
bsw/src/main_banded.cpp:338).  The TPU-native equivalent is SPMD over a
1-D device mesh: work items (pairs, records, groups, reads) shard along
the leading batch axis with `jax.sharding.NamedSharding`; XLA partitions
the jitted kernel and inserts any collectives lock-step loops need (e.g.
wfa's global `any(active)` loop condition becomes an all-reduce over the
mesh).

Kernels accept an optional `mesh`; the CLIs build one from the
GENARCH_DEVICES env var, which the scheduler harness's generated job
scripts export (harness/scheduler.py::_job_script) — the analogue of
run_wrapper.sh exporting OMP_NUM_THREADS.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def devices_from_env(default: int = 1) -> int:
    """GENARCH_DEVICES, exported by the harness job scripts."""
    try:
        return max(1, int(os.environ.get("GENARCH_DEVICES", default)))
    except ValueError:
        return default


_distributed_initialized = False


def init_distributed() -> int:
    """Multi-host (DCN) wiring: start the jax.distributed runtime when the
    harness asked for more than one process.

    The reference's multi-node story is run_wrapper.sh exporting MPI_RANKS
    into scheduler job scripts (run_wrapper.sh:190-250) — plumbing with no
    real communication.  Here the same harness knob (`Job.hosts`, exported
    as GENARCH_HOSTS by harness/scheduler.py::_job_script) turns on the
    real thing: `jax.distributed.initialize` joins every process into one
    SPMD runtime so `jax.devices()` spans all hosts and meshes built from
    it ride ICI inside a slice and DCN across slices.

    Env contract (all optional; SLURM/TPU-metadata autodetect otherwise):
      GENARCH_HOSTS        total process count (1 = no-op)
      GENARCH_COORDINATOR  host:port of process 0
      GENARCH_PROCESS_ID   this process's rank

    Returns the process count in effect.  Idempotent.
    """
    global _distributed_initialized
    n = int(os.environ.get("GENARCH_HOSTS", "1") or 1)
    if n <= 1 or _distributed_initialized:
        return max(n, 1)
    kwargs = {}
    coord = os.environ.get("GENARCH_COORDINATOR")
    if coord:
        kwargs["coordinator_address"] = coord
        kwargs["num_processes"] = n
        pid = os.environ.get("GENARCH_PROCESS_ID")
        if pid is None:
            # JAX requires an explicit process_id whenever the
            # coordinator address is explicit (autodetection only
            # covers cluster environments it knows about)
            raise RuntimeError(
                "GENARCH_COORDINATOR is set but GENARCH_PROCESS_ID is "
                "not; export this process's rank (0..GENARCH_HOSTS-1)")
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    _distributed_initialized = True
    return n


def data_mesh(n_devices: Optional[int] = None,
              axis_name: str = "batch") -> Optional[Mesh]:
    """1-D mesh over the first `n_devices` devices; None for n=1 (the
    single-device fast path: no resharding, no partitioning overhead)."""
    if n_devices is None:
        n_devices = devices_from_env()
    if n_devices <= 1:
        return None
    devs = jax.devices()
    if n_devices > len(devs):
        n_devices = len(devs)
    if n_devices <= 1:
        return None
    return Mesh(np.asarray(devs[:n_devices]), (axis_name,))


def mesh_size(mesh: Optional[Mesh]) -> int:
    return 1 if mesh is None else int(mesh.devices.size)


def pad_batch(n: int, mesh: Optional[Mesh]) -> int:
    """Smallest padded leading dim >= n divisible by the mesh size."""
    s = mesh_size(mesh)
    return ((n + s - 1) // s) * s


def shard_args(mesh: Optional[Mesh], *arrays) -> Tuple:
    """device_put each array sharded along its leading axis (trailing
    axes replicated).  No-op without a mesh.

    With a multi-process mesh (after init_distributed) each process
    passes its LOCAL slice of the batch; the slices are stitched into
    one global array without any cross-host copy."""
    if mesh is None:
        return arrays
    axis = mesh.axis_names[0]
    sh = NamedSharding(mesh, P(axis))
    multiproc = len({d.process_index for d in mesh.devices.flat}) > 1
    if multiproc:
        return tuple(
            jax.make_array_from_process_local_data(sh, np.asarray(a))
            for a in arrays)
    return tuple(jax.device_put(a, sh) for a in arrays)


def global_data_mesh(axis_name: str = "batch") -> Optional[Mesh]:
    """Mesh over every device of every process (call init_distributed
    first); None when that is a single device."""
    init_distributed()
    devs = jax.devices()
    if len(devs) <= 1:
        return None
    return Mesh(np.asarray(devs), (axis_name,))
