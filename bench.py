"""Driver benchmark: one JSON line {"metric", "value", "unit", "vs_baseline"}.

Headline metric: kmer-cnt kernel throughput (bases/s through the
distinct-canonical-k-mer count at the benchmark configuration k=17,
reference: kmer-cnt/vertex_index.cpp COUNT_VERSION 3).  Baseline = the
reference C++ binary compiled -O2 with OpenMP using every host core, on
the same synthetic read set, on this host's CPU (cached after the
first run — its 16 GB flat-counter kernel takes minutes regardless of
input size).

The measurement runs in a child process with a timeout: the TPU tunnel
on this host flaps, so a dead tunnel falls back to the CPU backend
rather than hanging the driver.
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
FASTA = pathlib.Path("/tmp/bench_kmer_reads.fasta")


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


def gen_reads(rng) -> int:
    total = 0
    with open(FASTA, "w") as f:
        for i in range(N_READS):
            L = READ_LEN + int(rng.integers(-2000, 2000))
            total += L
            f.write(f">read_{i}\n")
            s = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
            for j in range(0, L, 80):
                f.write(s[j:j + 80] + "\n")
    return total


def run_ref(binary, cfg, nthreads):
    cache = REPO / ".refbuild" / (
        f"kmer_baseline_{N_READS}x{READ_LEN}_k{K}_t{nthreads}.json")
    if cache.exists():
        d = json.loads(cache.read_text())
        return d["secs"], d["count"]
    r = subprocess.run(
        [str(binary), "--reads", str(FASTA), "--config", str(cfg),
         "--debug", "--threads", str(nthreads)],
        capture_output=True, text=True, timeout=3000)
    txt = r.stderr + r.stdout
    mt = re.search(r"Kernel time: ([0-9.]+) sec", txt)
    mk = re.search(r"Total k-mers (\d+)", txt)
    secs = float(mt.group(1)) if mt else float("nan")
    count = int(mk.group(1)) if mk else -1
    cache.write_text(json.dumps({"secs": secs, "count": count}))
    return secs, count


def measure_child(platform: str):
    """Runs in a child process: time the kernel, print 'SECS COUNT'."""
    import jax
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from genarchbench_tpu.io.fasta_io import read_fasta
    from genarchbench_tpu.kernels.kmer import count_distinct
    reads = read_fasta(str(FASTA), min_len=5000)
    count_distinct(reads, K)                   # warmup/compile
    t0 = time.perf_counter()
    n = count_distinct(reads, K)
    dt = time.perf_counter() - t0
    print(f"MEASURE {dt:.4f} {n} {platform}")


def measure(platform: str, timeout: int):
    r = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--measure", platform],
        capture_output=True, text=True, timeout=timeout)
    m = re.search(r"MEASURE ([0-9.]+) (\d+) (\w+)", r.stdout)
    if not m:
        raise RuntimeError(r.stderr[-300:])
    return float(m.group(1)), int(m.group(2)), m.group(3)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--measure":
        measure_child(sys.argv[2])
        return

    rng = np.random.default_rng(4242)
    total_bases = gen_reads(rng)
    cfg = pathlib.Path("/tmp/bench_kmer.cfg")
    cfg.write_text(f"kmer_size = {K}\nuse_minimizers = 0\n"
                   "assemble_kmer_sample = 1\n")

    try:
        ours_s, ours_n, plat = measure("tpu", timeout=300)
    except Exception as e:
        print(f"# tpu measurement failed ({type(e).__name__}); "
              f"falling back to cpu backend", file=sys.stderr)
        ours_s, ours_n, plat = measure("cpu", timeout=600)
    ours = total_bases / ours_s

    binary = build_ref()
    nthreads = os.cpu_count() or 1
    ref_s, ref_n = run_ref(binary, cfg, nthreads)
    ref = total_bases / ref_s if ref_s > 0 else float("nan")

    match = "OK" if ours_n == ref_n else f"MISMATCH ours={ours_n} ref={ref_n}"
    print(f"# kmer-cnt k={K} {total_bases} bases on {plat}: "
          f"{ours_s:.2f}s vs cpu-ref({nthreads}t) {ref_s:.2f}s, "
          f"distinct {ours_n} [{match}]", file=sys.stderr)
    print(json.dumps({
        "metric": "kmercnt_bases_per_s",
        "value": round(ours, 1),
        "unit": "bases/s",
        "vs_baseline": round(ours / ref, 3) if ref == ref else None,
    }))


if __name__ == "__main__":
    main()
