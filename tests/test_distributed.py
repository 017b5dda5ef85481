"""Multi-host (jax.distributed) smoke test: 2 CPU processes, 4 global
devices, real cross-process collectives (psum + kmer all_to_all).

The reference's multi-node surface is run_wrapper.sh exporting MPI_RANKS
into scheduler jobs (run_wrapper.sh:190-250); this is its working TPU
equivalent per SURVEY.md §2.4/§5.8.
"""

import pathlib
import socket
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "_dist_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cluster():
    port = _free_port()
    procs = []
    for rank in range(2):
        env = {
            "PATH": "/usr/bin:/bin",
            "HOME": "/root",
            "GENARCH_HOSTS": "2",
            "GENARCH_COORDINATOR": f"127.0.0.1:{port}",
            "GENARCH_PROCESS_ID": str(rank),
        }
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        lines = [l for l in out.splitlines() if l.startswith("DIST_OK")]
        assert lines, f"no DIST_OK in output:\n{out}\n{err[-1000:]}"
        outs.append(lines[-1])
    assert outs[0] == outs[1], outs

    # cross-check the sharded distinct count against the exact
    # single-process path on the same seeded reads
    import numpy as np
    from genarchbench_tpu.io.fasta_io import ReadSet
    from genarchbench_tpu.kernels.kmer import count_distinct
    rng = np.random.default_rng(7)
    seqs = [rng.integers(0, 4, 400).astype(np.uint8) for _ in range(8)]
    want = count_distinct(ReadSet([f"r{i}" for i in range(8)], seqs), 15)
    assert outs[0].split() == ["DIST_OK", "22", str(want)]
