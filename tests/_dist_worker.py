"""Worker process for tests/test_distributed.py.

Joins a 2-process jax.distributed CPU cluster (2 virtual devices per
process -> 4 global), builds the global mesh, and exercises the two
multi-host paths: a psum over DCN-spanning shards and the kmer-cnt
all_to_all distinct count (the TPU analogue of run_wrapper.sh's
MPI_RANKS plumbing, run_wrapper.sh:190-250 — except here the processes
really communicate).

Prints "DIST_OK <sum> <distinct>" on success; the parent asserts both
workers printed identical values.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

# the axon sitecustomize force-registers the TPU backend and overrides
# JAX_PLATFORMS from the environment, so pin CPU via jax.config
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from genarchbench_tpu.sharding.mesh import (  # noqa: E402
    global_data_mesh, init_distributed, shard_args)


def main() -> None:
    n = init_distributed()
    assert n == 2, n
    assert jax.process_count() == 2, jax.process_count()
    mesh = global_data_mesh()
    assert mesh is not None and mesh.devices.size == 4, mesh

    # -- data-parallel reduction across hosts ------------------------------
    pi = jax.process_index()
    local = np.arange(2, dtype=np.int32) + 10 * pi        # each host's slice
    (x,) = shard_args(mesh, local)
    assert x.shape == (4,), x.shape
    total = int(jax.jit(lambda v: v.sum())(x))
    assert total == (0 + 1) + (10 + 11), total

    # -- kmer all_to_all distinct count over the global mesh ---------------
    from genarchbench_tpu.io.fasta_io import ReadSet
    from genarchbench_tpu.kernels.kmer import count_distinct_sharded

    rng = np.random.default_rng(7)
    seqs = [rng.integers(0, 4, 400).astype(np.uint8) for _ in range(8)]
    reads = ReadSet([f"r{i}" for i in range(8)], seqs)
    # mesh=None -> count_distinct_sharded builds its own global
    # ("kspace",) mesh over all 4 devices of both processes
    distinct = count_distinct_sharded(reads, 15)

    print(f"DIST_OK {total} {distinct}", flush=True)


if __name__ == "__main__":
    main()
