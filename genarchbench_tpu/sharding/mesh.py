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
    axes replicated).  No-op without a mesh."""
    if mesh is None:
        return arrays
    axis = mesh.axis_names[0]
    sh = NamedSharding(mesh, P(axis))
    return tuple(jax.device_put(a, sh) for a in arrays)
