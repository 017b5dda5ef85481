"""Driver benchmark: ONE stdout JSON line
{"metric", "value", "unit", "vs_baseline"}.

Headline: geometric-mean speedup of the TPU framework over the
reference C/C++ binaries (compiled -O2 + OpenMP, all host cores, same
host) across four kernels: kmer-cnt (distinct canonical k-mers, k=17),
bpm (Myers edit distance), chain (minimap2 chain DP), bsw (banded SW).
Per-kernel detail goes to stderr; reference timings are cached in
.refbuild/bench_baselines.json (the kmer-cnt reference alone costs ~25
minutes on a 2-core host: its 16 GB flat-counter design,
vertex_index.cpp:803-812, pays a fixed O(4^k) scan regardless of input).

Each TPU measurement runs in a child process under a timeout and is
skipped (not failed) if the TPU tunnel flaps; if every kernel skips,
the kmer kernel is re-measured on the CPU backend so the driver always
gets a number.
"""

import json
import math
import os
import pathlib
import re
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

RB = REPO / ".refbuild"
CACHE = RB / "bench_baselines.json"
TMP = pathlib.Path("/tmp")
KMER_K = 17
TPU_TIMEOUT = int(os.environ.get("BENCH_TPU_TIMEOUT", "900"))
NN_CHUNKS, NN_CHUNKSIZE = 32, 6000


# ---------------------------------------------------------------------------
# inputs (seeded, written once per process)
# ---------------------------------------------------------------------------

def gen_inputs():
    sys.path.insert(0, str(REPO / "tests"))
    from synth import gen_bsw_input, gen_chain_input, gen_seqpair_dataset
    paths = {}

    # every input gets its own seeded stream so the on-disk caching of
    # one file cannot shift another's content
    rng = np.random.default_rng(4242)
    fa = TMP / "bench_kmer_reads.fasta"
    n_reads = int(os.environ.get("BENCH_KMER_READS", "120"))
    read_len = int(os.environ.get("BENCH_KMER_READLEN", "20000"))
    total = 0
    with open(fa, "w") as f:
        for i in range(n_reads):
            L = read_len + int(rng.integers(-2000, 2000))
            total += L
            f.write(f">read_{i}\n")
            s = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
            for j in range(0, L, 80):
                f.write(s[j:j + 80] + "\n")
    cfg = TMP / "bench_kmer.cfg"
    cfg.write_text(f"kmer_size = {KMER_K}\nuse_minimizers = 0\n"
                   "assemble_kmer_sample = 1\n")
    paths["kmer"] = (fa, cfg)
    paths["kmer_bases"] = total

    # sized so the reference binary runs ~1-60 s per kernel on this
    # host (the suite's own small-input design target, README.md:7) —
    # large enough that neither side is measuring fixed overheads
    bpm = TMP / "bench_bpm_pairs_v2.txt"
    if not bpm.exists():
        bpm.write_text(gen_seqpair_dataset(
            np.random.default_rng(101), n_pairs=4096, length=480,
            error_rate=0.12))
    paths["bpm"] = bpm

    chain = TMP / "bench_chain_v2.txt"
    if not chain.exists():
        chain.write_text(gen_chain_input(
            np.random.default_rng(102), n_records=16384, max_anchors=512))
    paths["chain"] = chain

    bsw = TMP / "bench_bsw_pairs_v2.txt"
    if not bsw.exists():
        bsw.write_text(gen_bsw_input(
            np.random.default_rng(103), n_pairs=16384, ref_len=384,
            query_len=192))
    paths["bsw"] = bsw

    wfa = TMP / "bench_wfa_pairs_v2.txt"
    if not wfa.exists():
        wfa.write_text(gen_seqpair_dataset(
            np.random.default_rng(104), n_pairs=8192, length=96,
            error_rate=0.10))
    paths["wfa"] = wfa

    # fmi: synthetic reference + reads; the bwa-mem2-format index is
    # built once by the reference's own index builder
    fmi_dir = TMP / "bench_fmi"
    fmi_fa = fmi_dir / "ref.fa"
    fmi_fq = fmi_dir / "reads.fq"
    if not fmi_fq.exists():
        fmi_dir.mkdir(exist_ok=True)
        rng_f = np.random.default_rng(106)
        ref_len, n_reads, read_len = 2_000_000, 250_000, 100
        ref = "".join("ACGT"[c] for c in rng_f.integers(0, 4, ref_len))
        with open(fmi_fa, "w") as f:
            f.write(">chr1\n")
            for i in range(0, ref_len, 70):
                f.write(ref[i:i + 70] + "\n")
        with open(fmi_fq, "w") as f:
            for i in range(n_reads):
                p = int(rng_f.integers(0, ref_len - read_len))
                s = list(ref[p:p + read_len])
                for _ in range(5):
                    s[int(rng_f.integers(0, read_len))] = \
                        "ACGT"[rng_f.integers(0, 4)]
                f.write(f"@r{i}\n{''.join(s)}\n+\n{'I' * read_len}\n")
    paths["fmi"] = (fmi_fa, fmi_fq)

    pile_bam = TMP / "bench_pileup.bam"
    if not pile_bam.exists():
        from test_pileup import make_bam
        make_bam(pile_bam, np.random.default_rng(107), ref_len=500_000,
                 n_reads=60_000, read_len=300)
    paths["pileup"] = (pile_bam, "tig1:1-500000")

    dbg_dir = TMP / "bench_dbg"
    if not (dbg_dir / "r.bam").exists():
        dbg_dir.mkdir(exist_ok=True)
        from test_dbg import make_case
        make_case(dbg_dir, np.random.default_rng(108), ref_len=500_000,
                  n_reads=25_000, read_len=150)
    paths["dbg"] = (dbg_dir / "r.bam", "tig1:0-500000",
                    dbg_dir / "ref.fa")

    poa = TMP / "bench_poa_v3.txt"
    if not poa.exists():
        rng_p = np.random.default_rng(105)
        out = []
        for b in range(256):
            base = "".join("ACGT"[c] for c in rng_p.integers(0, 4, 250))
            for s in range(10):
                seq = []
                for ch in base:
                    r = rng_p.random()
                    if r < 0.03:
                        seq.append("ACGT"[rng_p.integers(0, 4)])
                    elif r < 0.06:
                        seq.append(ch + "ACGT"[rng_p.integers(0, 4)])
                    elif r < 0.09:
                        pass
                    else:
                        seq.append(ch)
                out.append(f"s{'0' if s == 0 else '1'}_{b}_{s}\n"
                           + "".join(seq) + "\n")
        poa.write_text("".join(out))
    paths["poa"] = poa

    # abea: synthetic squiggles from the reference pore model (dumped
    # by build_oracles.sh); one seq_%d.txt/raw_%d.txt pair per read for
    # the harness bench mode + one npz both sides load
    abea_dir = TMP / "bench_abea"
    if not (abea_dir / "reads.npz").exists():
        model_txt = RB / "r94_model.txt"
        if not model_txt.exists():
            build_ref("abea_harness")
        sys.path.insert(0, str(REPO))
        from genarchbench_tpu.kernels.abea import kmer_ranks, load_model
        model = load_model(str(model_txt))
        abea_dir.mkdir(exist_ok=True)
        rng_a = np.random.default_rng(109)
        n_reads, seqlen = 256, 2000
        seqs, sigs = [], []
        for i in range(n_reads):
            seq = "".join("ACGT"[c] for c in rng_a.integers(0, 4, seqlen))
            levels = model["level_mean"][kmer_ranks(seq)]
            reps = rng_a.integers(4, 14, len(levels))
            sig = (np.repeat(levels, reps)
                   + rng_a.normal(0, 0.8, int(reps.sum()))
                   ).astype(np.float32)
            (abea_dir / f"seq_{i}.txt").write_text(seq + "\n")
            np.savetxt(abea_dir / f"raw_{i}.txt", sig, fmt="%.9g")
            seqs.append(seq)
            sigs.append(sig)
        np.savez(abea_dir / "reads.npz",
                 seqs=np.array(seqs),
                 **{f"sig_{i}": s for i, s in enumerate(sigs)})
    paths["abea"] = abea_dir
    paths["size_tag"] = "v2"
    return paths


# ---------------------------------------------------------------------------
# reference baselines (cached)
# ---------------------------------------------------------------------------

def build_ref(name: str) -> pathlib.Path:
    out = RB / name
    if not out.exists():
        subprocess.run(["bash", str(REPO / "tests/oracles/build_oracles.sh")],
                       check=True, capture_output=True)
    return out


def _grep_time(pattern, text):
    m = re.search(pattern, text)
    return float(m.group(1)) if m else float("nan")


def ref_time(kernel: str, paths, nthreads: int) -> float:
    """Kernel-ROI seconds of the reference binary (cached by input key)."""
    cache = json.loads(CACHE.read_text()) if CACHE.exists() else {}
    key = (f"{kernel}_t{nthreads}_"
           + os.environ.get("BENCH_SIZE", paths.get("size_tag", "v2")))
    if key in cache:
        return cache[key]
    env = dict(os.environ, OMP_NUM_THREADS=str(nthreads))
    if kernel == "kmer":
        fa, cfg = paths["kmer"]
        # migrate the old single-kernel cache if present
        legacy = sorted(RB.glob("kmer_baseline_*.json"))
        if legacy:
            secs = json.loads(legacy[0].read_text())["secs"]
        else:
            r = subprocess.run(
                [str(build_ref("kmercnt_ref")), "--reads", str(fa),
                 "--config", str(cfg), "--debug", "--threads",
                 str(nthreads)],
                capture_output=True, text=True, timeout=3600, env=env)
            secs = _grep_time(r"Kernel time: ([0-9.]+) sec",
                              r.stderr + r.stdout)
    elif kernel == "bpm":
        r = subprocess.run(
            [str(build_ref("bpm_ref")), "-a", "bpm-edit",
             "-i", str(paths["bpm"]), "-t", str(nthreads)],
            capture_output=True, text=True, timeout=1800, env=env)
        secs = _grep_time(r"Time.Benchmark\s+([0-9.]+)", r.stdout + r.stderr)
    elif kernel == "fastchain":
        r = subprocess.run(
            [str(build_ref("fastchain_ref")), "-i", str(paths["chain"]),
             "-o", str(TMP / "bench_chain_ref.out")],
            capture_output=True, text=True, timeout=1800, env=env)
        secs = _grep_time(r"Time in kernel: ([0-9.]+) sec",
                          r.stderr + r.stdout)
    elif kernel == "bsw":
        r = subprocess.run(
            [str(build_ref("bsw_ref")), "-pairs", str(paths["bsw"]),
             "-t", str(nthreads)],
            capture_output=True, text=True, timeout=1800, env=env)
        secs = _grep_time(r"Overall SW cycles.*?([0-9.]+) s",
                          r.stdout + r.stderr)
        if secs != secs:
            secs = _grep_time(r"runtime.*?([0-9.]+)", r.stdout + r.stderr)
    elif kernel == "wfa":
        r = subprocess.run(
            [str(build_ref("wfa_ref")), "-i", str(paths["wfa"]),
             "-o", str(TMP / "bench_wfa_ref.out"), "-t", str(nthreads)],
            capture_output=True, text=True, timeout=1800, env=env)
        secs = _grep_time(r"Time.Benchmark:?\s+([0-9.]+)",
                          r.stdout + r.stderr)
    elif kernel == "poa":
        r = subprocess.run(
            [str(build_ref("poa_ref")), "-s", str(paths["poa"]),
             "-t", str(nthreads)],
            capture_output=True, text=True, timeout=1800, env=env)
        secs = _grep_time(r"Runtime:?\s+([0-9.]+)", r.stdout + r.stderr)
        if secs != secs:     # spoa prints a stage breakdown instead
            secs = _grep_time(r"total.*?([0-9.]+)", r.stderr + r.stdout)
    elif kernel == "chain":
        r = subprocess.run(
            [str(build_ref("chain_ref")), "-i", str(paths["chain"]),
             "-o", str(TMP / "bench_chain_cref.out")],
            capture_output=True, text=True, timeout=1800, env=env)
        secs = _grep_time(r"Time in kernel: ([0-9.]+) sec",
                          r.stderr + r.stdout)
    elif kernel == "fmi":
        fa, fq = paths["fmi"]
        if not (fa.parent / (fa.name + ".bwt.2bit.64")).exists():
            subprocess.run([str(build_ref("fmi_index_builder")),
                            str(fa), str(fa)], check=True,
                           capture_output=True, timeout=1800)
        r = subprocess.run(
            [str(build_ref("fmi_ref")), str(fa), str(fq), "512", "19",
             str(nthreads)],
            capture_output=True, text=True, timeout=1800, env=env)
        secs = _grep_time(r"Computing time: ([0-9.eE+-]+) s",
                          r.stdout + r.stderr)
    elif kernel == "pileup":
        bam, region = paths["pileup"]
        r = subprocess.run(
            [str(build_ref("pileup_ref")), str(bam), region,
             str(nthreads)],
            capture_output=True, text=True, timeout=1800, env=env)
        secs = _grep_time(r"Kernel runtime: ([0-9.]+)",
                          r.stderr + r.stdout)
    elif kernel == "dbg":
        bam, region, fa = paths["dbg"]
        r = subprocess.run(
            [str(build_ref("dbg_ref")), str(bam), region, str(fa),
             str(nthreads), "0"],
            capture_output=True, text=True, timeout=1800, env=env)
        secs = _grep_time(r"Kernel runtime: ([0-9.]+)",
                          r.stderr + r.stdout)
    elif kernel == "abea":
        n_reads = len(np.load(paths["abea"] / "reads.npz")["seqs"])
        r = subprocess.run(
            [str(build_ref("abea_harness")), "bench",
             str(paths["abea"]), str(n_reads), str(nthreads)],
            capture_output=True, text=True, timeout=1800, env=env)
        secs = _grep_time(r"Data processing time: ([0-9.]+) sec",
                          r.stderr + r.stdout)
    elif kernel == "nn":
        # reference nn-base ROI = QuartzNet forward (bonito
        # basecall.py:653-658 'samples per second'); baseline is the
        # identical torch model on all host cores (bonito is torch).
        # SYNTHETIC baseline: the pinned bonito stack (torch 1.4 +
        # fast-ctc-decode wheel) does not run in this image, so the
        # in-repo torch reimplementation stands in on an identical
        # chunk batch — the detail row is labeled accordingly.
        import torch
        torch.set_num_threads(nthreads)
        sys.path.insert(0, str(REPO / "tests"))
        from test_basecall import _torch_quartznet
        from genarchbench_tpu.nn.basecall import DEFAULT_CONFIG
        tm = _torch_quartznet(DEFAULT_CONFIG).eval()
        x = torch.randn(NN_CHUNKS, 1, NN_CHUNKSIZE)
        with torch.no_grad():
            tm(x)                      # warm
            t0 = time.perf_counter()
            tm(x)
            secs = time.perf_counter() - t0
    else:
        raise KeyError(kernel)
    cache[key] = secs
    CACHE.write_text(json.dumps(cache))
    return secs


# ---------------------------------------------------------------------------
# our measurements (child process per kernel; TPU tunnel may flap)
# ---------------------------------------------------------------------------

def measure_child(kernel: str, platform: str):
    import jax
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    paths = gen_inputs()
    if kernel == "kmer":
        from genarchbench_tpu.io.fasta_io import read_fasta
        from genarchbench_tpu.kernels.kmer import count_distinct
        reads = read_fasta(str(paths["kmer"][0]), min_len=5000)
        count_distinct(reads, KMER_K)
        t0 = time.perf_counter()
        count_distinct(reads, KMER_K)
        dt = time.perf_counter() - t0
    elif kernel == "bpm":
        from genarchbench_tpu.io.seqpair_io import read_seqpairs
        from genarchbench_tpu.kernels.bpm import bpm_batch
        pairs = read_seqpairs(str(paths["bpm"]), swap_longer_first=True)
        bpm_batch(pairs)
        t0 = time.perf_counter()
        bpm_batch(pairs)
        dt = time.perf_counter() - t0
    elif kernel == "fastchain":
        from genarchbench_tpu.io import chain_io
        from genarchbench_tpu.kernels.fast_chain import fast_chain_batch
        records = chain_io.read_records_path(str(paths["chain"]))
        fast_chain_batch(records)
        t0 = time.perf_counter()
        fast_chain_batch(records)
        dt = time.perf_counter() - t0
    elif kernel == "bsw":
        from genarchbench_tpu.io.bsw_io import read_bsw_pairs
        from genarchbench_tpu.kernels.bsw import bsw_batch
        pairs = read_bsw_pairs(str(paths["bsw"]))
        bsw_batch(pairs)
        t0 = time.perf_counter()
        bsw_batch(pairs)
        dt = time.perf_counter() - t0
    elif kernel == "wfa":
        from genarchbench_tpu.io.seqpair_io import read_seqpairs
        from genarchbench_tpu.kernels.wfa import wfa_batch
        pairs = read_seqpairs(str(paths["wfa"]), swap_longer_first=False)
        wfa_batch(pairs)
        t0 = time.perf_counter()
        wfa_batch(pairs)
        dt = time.perf_counter() - t0
    elif kernel == "poa":
        from genarchbench_tpu.kernels.poa import (ConvexNWEngine,
                                                  consensus_for_batches,
                                                  read_batches)
        batches = read_batches(str(paths["poa"]))
        engine = ConvexNWEngine()
        consensus_for_batches(batches, engine)       # warm compile
        t0 = time.perf_counter()
        consensus_for_batches(batches, engine)
        dt = time.perf_counter() - t0
    elif kernel == "abea":
        from genarchbench_tpu.kernels.abea import (align_batch,
                                                   estimate_scalings,
                                                   get_events, load_model)
        model = load_model(str(RB / "r94_model.txt"))
        z = np.load(paths["abea"] / "reads.npz")
        seqs = [str(s) for s in z["seqs"]]
        sigs = [z[f"sig_{i}"] for i in range(len(seqs))]

        def pipeline():
            ets = [get_events(s) for s in sigs]
            return align_batch(seqs, ets, model)

        pipeline()                       # warm compile
        t0 = time.perf_counter()
        pipeline()
        dt = time.perf_counter() - t0
    elif kernel == "nn":
        from genarchbench_tpu.nn.basecall import Basecaller
        rng_n = np.random.default_rng(110)
        caller = Basecaller.init(chunksize=NN_CHUNKSIZE)
        x = rng_n.standard_normal(
            (NN_CHUNKS, NN_CHUNKSIZE, 1)).astype(np.float32)
        caller.forward(x)              # warm compile
        t0 = time.perf_counter()
        caller.forward(x)
        dt = time.perf_counter() - t0
    elif kernel in ("chain", "fmi", "pileup", "dbg"):
        import contextlib
        import io as io_mod

        def cli_time(mod_run, args, pattern):
            val = float("nan")
            for _ in range(2):            # 2nd run: compile cache warm
                so, se = io_mod.StringIO(), io_mod.StringIO()
                with contextlib.redirect_stdout(so), \
                        contextlib.redirect_stderr(se):
                    mod_run(args)
                m = re.search(pattern, so.getvalue() + se.getvalue())
                if m:
                    val = float(m.group(1))
            return val

        if kernel == "chain":
            from genarchbench_tpu.kernels.chain import run as krun
            dt = cli_time(krun, ["-i", str(paths["chain"]), "-o",
                                 str(TMP / "bench_chain_ours.out")],
                          r"Time in kernel: ([0-9.]+) sec")
        elif kernel == "fmi":
            from genarchbench_tpu.kernels.fmi import run as krun
            fa, fq = paths["fmi"]
            dt = cli_time(krun, [str(fa), str(fq), "512", "19", "1"],
                          r"Computing time: ([0-9.eE+-]+) s")
        elif kernel == "pileup":
            from genarchbench_tpu.kernels.pileup import run as krun
            bam, region = paths["pileup"]
            dt = cli_time(krun, [str(bam), region, "1"],
                          r"Kernel runtime: ([0-9.]+)")
        else:
            from genarchbench_tpu.kernels.dbg import run as krun
            bam, region, fa = paths["dbg"]
            dt = cli_time(krun, [str(bam), region, str(fa), "1", "0"],
                          r"Kernel runtime: ([0-9.]+)")
    else:
        raise KeyError(kernel)
    print(f"MEASURE {dt:.4f} {platform}")


def measure(kernel: str, platform: str, timeout: int):
    r = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--measure", kernel,
         platform],
        capture_output=True, text=True, timeout=timeout)
    m = re.search(r"MEASURE ([0-9.]+) (\w+)", r.stdout)
    if not m:
        raise RuntimeError((r.stderr or r.stdout)[-300:])
    return float(m.group(1)), m.group(2)


# ---------------------------------------------------------------------------
# resilient driver: the geomean JSON line MUST print no matter what the
# TPU tunnel does (BENCH_r03 was empty because one kernel burned its
# 900 s timeout and the driver killed the run before the JSON printed).
#   - per-kernel measurements persist to .refbuild/bench_ours.json and
#     are reused when a fresh measurement cannot be taken
#   - each kernel gets a bounded budget (BENCH_KERNEL_BUDGET, 300 s)
#     with one retry while the global deadline allows
#   - a global deadline (BENCH_GLOBAL_DEADLINE, 1500 s) stops fresh
#     measurement; remaining kernels fill from the cache
#   - kernels run cheapest-first so a mid-run kill loses the least
#   - SIGTERM/SIGINT print the JSON from whatever completed
# ---------------------------------------------------------------------------

OURS_CACHE = RB / "bench_ours.json"

# nominal DP cell counts for the cells/s detail (BASELINE.md north star)
_CELLS = {
    "bpm": 4096 * 480 * 480,        # full Myers matrix per pair
    "bsw": 16384 * 384 * 192,       # banded-SW matrix bound per pair
    "wfa": 8192 * 96 * 96,          # equivalent full-DP cells per pair
}

_emit_state = {"done": False, "detail": {}, "nthreads": 0}


def _load_ours():
    try:
        return json.loads(OURS_CACHE.read_text())
    except Exception:
        return {}


def _save_ours(cache):
    try:
        OURS_CACHE.write_text(json.dumps(cache))
    except Exception:
        pass


def emit():
    """Print the one-line JSON from whatever has completed (idempotent)."""
    if _emit_state["done"]:
        return
    _emit_state["done"] = True
    detail = _emit_state["detail"]
    sps = {k: d["speedup"] for k, d in detail.items()
           if d.get("speedup") and d["speedup"] > 0}
    if not sps:
        print(json.dumps({
            "metric": "geomean_speedup_vs_reference", "value": 0.0,
            "unit": "x (no kernel measured)", "vs_baseline": 0.0}))
        return
    geo = math.exp(sum(math.log(s) for s in sps.values()) / len(sps))
    plats = sorted({d["platform"] for d in detail.values()
                    if d.get("platform")})
    print(json.dumps({
        "metric": "geomean_speedup_vs_reference",
        "value": round(geo, 3),
        "unit": (f"x geomean over {len(sps)} kernels "
                 f"({','.join(sorted(sps))}) on {','.join(plats)} vs "
                 f"reference -O2 {_emit_state['nthreads']}t same host"),
        "vs_baseline": round(geo, 3),
        "detail": {k: {kk: (round(vv, 4) if isinstance(vv, float) else vv)
                       for kk, vv in d.items()}
                   for k, d in sorted(detail.items())},
    }))
    sys.stdout.flush()


def _sig_emit(signum, frame):
    emit()
    os._exit(0)


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--measure":
        measure_child(sys.argv[2], sys.argv[3])
        return

    import signal
    signal.signal(signal.SIGTERM, _sig_emit)
    signal.signal(signal.SIGINT, _sig_emit)

    t_start = time.monotonic()
    deadline = t_start + int(os.environ.get("BENCH_GLOBAL_DEADLINE", "1500"))
    budget_s = int(os.environ.get("BENCH_KERNEL_BUDGET", "300"))

    paths = gen_inputs()
    nthreads = os.cpu_count() or 1
    _emit_state["nthreads"] = nthreads
    # cheapest-first (expected warm wall seconds incl. compile)
    kernels = os.environ.get(
        "BENCH_KERNELS",
        "bpm,bsw,wfa,kmer,abea,fastchain,dbg,nn,pileup,chain,poa,fmi"
    ).split(",")
    size_tag = os.environ.get("BENCH_SIZE", paths.get("size_tag", "v2"))
    ours_cache = _load_ours()
    detail = _emit_state["detail"]

    # pre-fill from the on-disk caches so even a hard kill mid-measure
    # emits FULL kernel coverage (fresh measurements overwrite below)
    try:
        ref_cache = json.loads(CACHE.read_text()) if CACHE.exists() else {}
    except Exception:
        ref_cache = {}
    for k in kernels:
        oc = ours_cache.get(f"{k}_{size_tag}")
        rs = ref_cache.get(f"{k}_t{nthreads}_{size_tag}")
        if oc and rs and oc["secs"] > 0:
            d = {"ours_s": oc["secs"], "ref_s": rs,
                 "speedup": rs / oc["secs"],
                 "platform": oc["platform"], "cached": True}
            if k in _CELLS:
                d["gcells_per_s"] = _CELLS[k] / oc["secs"] / 1e9
            detail[k] = d

    try:
        for k in kernels:
            try:
                ref_s = ref_time(k, paths, nthreads)
            except Exception as e:
                print(f"# {k}: reference baseline failed ({e})",
                      file=sys.stderr)
                continue
            key = f"{k}_{size_tag}"
            cached = ours_cache.get(key)
            ours_s, plat, from_cache = None, None, False
            for attempt in range(2):
                remaining = deadline - time.monotonic()
                if remaining < 45:
                    break
                try:
                    ours_s, plat = measure(
                        k, "tpu", int(min(budget_s, remaining - 15)))
                    break
                except Exception as e:
                    print(f"# {k}: attempt {attempt + 1} failed "
                          f"({type(e).__name__})", file=sys.stderr)
            if ours_s is not None:
                ours_cache[key] = {"secs": ours_s, "platform": plat,
                                   "ts": time.time()}
                _save_ours(ours_cache)
            elif cached:
                ours_s, plat, from_cache = (cached["secs"],
                                            cached["platform"], True)
                print(f"# {k}: using cached measurement "
                      f"({ours_s:.2f}s)", file=sys.stderr)
            else:
                print(f"# {k}: no measurement and no cache - skipped",
                      file=sys.stderr)
                continue
            d = {"ours_s": ours_s, "ref_s": ref_s,
                 "speedup": ref_s / ours_s, "platform": plat,
                 "cached": from_cache}
            if k in _CELLS:
                d["gcells_per_s"] = _CELLS[k] / ours_s / 1e9
            if k == "nn":
                d["baseline"] = "synthetic-torch-reimpl"
            detail[k] = d
            print(f"# {k}: ours {ours_s:.2f}s on {plat}"
                  f"{' (cached)' if from_cache else ''} vs "
                  f"ref({nthreads}t) {ref_s:.2f}s -> "
                  f"{d['speedup']:.2f}x", file=sys.stderr)

        if not detail and deadline - time.monotonic() > 120:
            # total TPU outage and empty cache: one CPU-backend number
            ref_s = ref_time("bpm", paths, nthreads)
            try:
                ours_s, plat = measure(
                    "bpm", "cpu",
                    int(deadline - time.monotonic() - 15))
                detail["bpm"] = {"ours_s": ours_s, "ref_s": ref_s,
                                 "speedup": ref_s / ours_s,
                                 "platform": plat, "cached": False}
            except Exception as e:
                print(f"# cpu fallback failed ({type(e).__name__})",
                      file=sys.stderr)
    finally:
        emit()


if __name__ == "__main__":
    main()
