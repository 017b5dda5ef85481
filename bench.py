"""Driver benchmark: one JSON line {"metric", "value", "unit", "vs_baseline"}.

Headline metric: kmer-cnt kernel throughput (bases/s through the
distinct-canonical-k-mer count at the benchmark configuration k=17,
reference: kmer-cnt/vertex_index.cpp COUNT_VERSION 3).  Baseline = the
reference C++ binary compiled -O2 with OpenMP using every host core, on
the same synthetic read set, on this host's CPU.  `value` = our TPU
kernel's bases/s; `vs_baseline` = ours / reference.

Secondary numbers (bsw cell-updates/s etc.) are printed to stderr.
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

N_READS = int(os.environ.get("BENCH_KMER_READS", "120"))
READ_LEN = int(os.environ.get("BENCH_KMER_READLEN", "20000"))
K = 17


def build_ref() -> pathlib.Path:
    out = REPO / ".refbuild" / "kmercnt_ref"
    if not out.exists():
        out.parent.mkdir(exist_ok=True)
        ref = "/root/reference/benchmarks/kmer-cnt"
        cmd = (f"g++ -O2 -fopenmp -std=c++14 -I {ref} -I {ref}/libcuckoo "
               f"-o {out} {ref}/kmer_cnt.cpp {ref}/vertex_index.cpp "
               f"{ref}/sequence_container.cpp {ref}/sequence.cpp -lz")
        subprocess.run(["bash", "-c", cmd], check=True, capture_output=True)
    return out


def gen_reads(path: pathlib.Path, rng) -> int:
    total = 0
    with open(path, "w") as f:
        for i in range(N_READS):
            L = READ_LEN + int(rng.integers(-2000, 2000))
            total += L
            f.write(f">read_{i}\n")
            s = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
            for j in range(0, L, 80):
                f.write(s[j:j + 80] + "\n")
    return total


def run_ref(binary, fasta, cfg, nthreads):
    """Reference baseline, cached: the reference's 16 GB flat-counter
    kernel takes ~4 min regardless of input size, so the measurement is
    stored in .refbuild keyed by the workload parameters."""
    cache = REPO / ".refbuild" / (
        f"kmer_baseline_{N_READS}x{READ_LEN}_k{K}_t{nthreads}.json")
    if cache.exists():
        d = json.loads(cache.read_text())
        return d["secs"], d["count"]
    t0 = time.perf_counter()
    r = subprocess.run(
        [str(binary), "--reads", str(fasta), "--config", str(cfg),
         "--debug", "--threads", str(nthreads)],
        capture_output=True, text=True, timeout=3000)
    wall = time.perf_counter() - t0
    txt = r.stderr + r.stdout
    mt = re.search(r"Kernel time: ([0-9.]+) sec", txt)
    mk = re.search(r"Total k-mers (\d+)", txt)
    secs = float(mt.group(1)) if mt else wall
    count = int(mk.group(1)) if mk else -1
    cache.write_text(json.dumps({"secs": secs, "count": count}))
    return secs, count


def main() -> None:
    rng = np.random.default_rng(4242)
    fasta = pathlib.Path("/tmp/bench_kmer_reads.fasta")
    total_bases = gen_reads(fasta, rng)
    cfg = pathlib.Path("/tmp/bench_kmer.cfg")
    cfg.write_text(f"kmer_size = {K}\nuse_minimizers = 0\n"
                   "assemble_kmer_sample = 1\n")

    from genarchbench_tpu.io.fasta_io import read_fasta
    from genarchbench_tpu.kernels.kmer import count_distinct
    reads = read_fasta(str(fasta), min_len=5000)

    count_distinct(reads, K)                   # warmup/compile
    t0 = time.perf_counter()
    ours_n = count_distinct(reads, K)
    ours_s = time.perf_counter() - t0
    ours = total_bases / ours_s

    binary = build_ref()
    nthreads = os.cpu_count() or 1
    ref_s, ref_n = run_ref(binary, fasta, cfg, nthreads)
    ref = total_bases / ref_s if ref_s > 0 else float("nan")

    match = "OK" if ours_n == ref_n else f"MISMATCH ours={ours_n} ref={ref_n}"
    print(f"# kmer-cnt k={K} {total_bases} bases: tpu {ours_s:.2f}s "
          f"vs cpu({nthreads}t) {ref_s:.2f}s, distinct {ours_n} [{match}]",
          file=sys.stderr)
    print(json.dumps({
        "metric": "kmercnt_bases_per_s",
        "value": round(ours, 1),
        "unit": "bases/s",
        "vs_baseline": round(ours / ref, 3) if ref == ref else None,
    }))


if __name__ == "__main__":
    main()
