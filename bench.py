"""Driver benchmark: one JSON line {"metric", "value", "unit", "vs_baseline"}.

North-star metric (BASELINE.md): DP cell-updates/s on the banded
Smith-Waterman kernel (bsw), the heaviest pairwise aligner in the suite.
Baseline = the reference C++ binary (bsw/src/bandedSWA.cpp SSE2 vector
path, OpenMP over all host cores) run on the same synthetic workload on
this host's CPU; `value` = our TPU kernel's cell-updates/s on the real
chip; `vs_baseline` = value / baseline.
"""

import json
import os
import pathlib
import re
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from tests.synth import gen_bsw_input  # noqa: E402
from genarchbench_tpu.io.bsw_io import read_bsw_pairs  # noqa: E402

N_PAIRS = int(os.environ.get("BENCH_PAIRS", "16384"))
REF_LEN = 256
QUERY_LEN = 128
ERR = 0.12


def build_ref() -> pathlib.Path:
    out = REPO / ".refbuild" / "bsw_ref"
    if not out.exists():
        out.parent.mkdir(exist_ok=True)
        src = "/root/reference/benchmarks/bsw/src"
        cmd = (f"g++ -O3 -fopenmp -msse4.1 -DENABLE_PREFETCH -DBWA_OTHER_ELE=0 "
               f"-DSORT_PAIRS=1 -I {src} -o {out} "
               f"{src}/main_banded.cpp {src}/bandedSWA.cpp")
        subprocess.run(["bash", "-c", cmd], check=True, capture_output=True)
    return out


def ref_cells_per_s(binary, inp, nthreads) -> float:
    r = subprocess.run([str(binary), "-pairs", str(inp), "-t", str(nthreads),
                        "-b", "512"], capture_output=True, text=True,
                       timeout=1800)
    m = re.search(r"Overall SW cycles = \d+, ([0-9.]+) s", r.stderr + r.stdout)
    secs = float(m.group(1))
    return secs


def main() -> None:
    inp = pathlib.Path("/tmp/bench_bsw_pairs.txt")
    rng = np.random.default_rng(1234)
    inp.write_text(gen_bsw_input(rng, n_pairs=N_PAIRS, ref_len=REF_LEN,
                                 query_len=QUERY_LEN, error_rate=ERR))
    pairs = read_bsw_pairs(str(inp))

    from genarchbench_tpu.kernels.bsw import bsw_batch, cell_updates
    cells = cell_updates(pairs)

    # warmup (compile) on a small slice shape-identical to the real run
    bsw_batch(pairs, batch_size=512)
    t0 = time.perf_counter()
    scores = bsw_batch(pairs, batch_size=512)
    ours_s = time.perf_counter() - t0
    ours = cells / ours_s

    binary = build_ref()
    nthreads = os.cpu_count() or 1
    ref_s = ref_cells_per_s(binary, inp, nthreads)
    ref = cells / ref_s if ref_s > 0 else float("nan")

    checksum = int(np.asarray(scores, np.int64).sum())
    print(f"# bsw {N_PAIRS} pairs ({REF_LEN}x{QUERY_LEN}): "
          f"tpu {ours_s:.3f}s vs cpu({nthreads}t) {ref_s:.3f}s, "
          f"score-sum {checksum}", file=sys.stderr)
    print(json.dumps({
        "metric": "bsw_cell_updates_per_s",
        "value": round(ours, 1),
        "unit": "cells/s",
        "vs_baseline": round(ours / ref, 3) if ref == ref else None,
    }))


if __name__ == "__main__":
    main()
