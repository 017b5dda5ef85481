"""dbg: window graph output parity vs the reference debruijn binary."""

import pathlib
import subprocess

import numpy as np
import pytest

from genarchbench_tpu.io import bam_io

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def dbg_ref():
    out = REPO / ".refbuild" / "dbg_ref"
    if not out.exists():
        hts = REPO / ".refbuild" / "htslib-1.9"
        if not (hts / "libhts.a").exists():
            r = subprocess.run(
                ["bash", "-c",
                 f"cd {REPO / '.refbuild'} && tar xjf /root/reference/"
                 f"benchmarks/abea/htslib.tar.bz2 && cd htslib-1.9 && "
                 f"./configure --disable-libcurl --disable-bz2 "
                 f"--disable-lzma && make -j8 lib-static"],
                capture_output=True, text=True, timeout=600)
            if r.returncode != 0:
                pytest.skip(f"htslib build failed: {r.stderr[-300:]}")
        src = "/root/reference/benchmarks/dbg/src"
        r = subprocess.run(
            ["bash", "-c",
             f"g++ -O2 -fopenmp -std=c++11 -I {hts} -I {src} -o {out} "
             f"{src}/debruijn.cpp {src}/common.cpp {hts}/libhts.a "
             f"-ldeflate -lz -lpthread -lm"],
            capture_output=True, text=True, timeout=300)
        if r.returncode != 0:
            pytest.skip(f"dbg_ref build failed: {r.stderr[-300:]}")
    return out


def make_case(tmp_path, rng, ref_len=5000, n_reads=50, read_len=150,
              err=0.03, low_qual_frac=0.2):
    ref = "".join("ACGT"[c] for c in rng.integers(0, 4, ref_len))
    fa = tmp_path / "ref.fa"
    with open(fa, "w") as f:
        f.write(">tig1\n")
        for i in range(0, ref_len, 70):
            f.write(ref[i:i + 70] + "\n")
    # .fai index for the reference binary's faidx
    with open(str(fa) + ".fai", "w") as f:
        f.write(f"tig1\t{ref_len}\t6\t70\t71\n")
    records = []
    for i in range(n_reads):
        pos = int(rng.integers(0, ref_len - read_len))
        s = list(ref[pos:pos + read_len])
        for _ in range(int(read_len * err)):
            j = int(rng.integers(0, read_len))
            s[j] = "ACGTN"[rng.integers(0, 5)]
        qual = rng.integers(10, 40, read_len).astype(np.uint8)
        if rng.random() < low_qual_frac:
            qual[rng.integers(0, read_len)] = 5     # kills windows
        cig = [(0, read_len)]
        if rng.random() < 0.3:
            sc = int(rng.integers(1, 10))
            cig = [(4, sc), (0, read_len - sc)]
        flag = 16 if rng.random() < 0.5 else 0
        if rng.random() < 0.05:
            flag |= 0x200                           # QC fail
        records.append(bam_io.BamRecord(
            f"r{i}", flag, 0, pos, 40, cig,
            "".join(s), qual))
    records.sort(key=lambda r: r.pos)
    bam = tmp_path / "r.bam"
    bam_io.write_bam(str(bam), [("tig1", ref_len)], records)
    return bam, fa


def run_ref(binary, bam, region, fa):
    r = subprocess.run([str(binary), str(bam), region, str(fa), "1", "1"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-400:]
    return sorted(ln for ln in r.stdout.splitlines() if ln.strip())


def run_ours(bam, region, fa):
    import io
    import sys as _sys
    from genarchbench_tpu.kernels import dbg as dbg_mod
    buf = io.StringIO()
    old = _sys.stdout
    _sys.stdout = buf
    try:
        dbg_mod.run([str(bam), region, str(fa), "1", "1"])
    finally:
        _sys.stdout = old
    return sorted(ln for ln in buf.getvalue().splitlines() if ln.strip())


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dbg_matches_reference(dbg_ref, tmp_path, seed):
    rng = np.random.default_rng(seed)
    bam, fa = make_case(tmp_path, rng)
    region = "tig1:1-5000"
    assert run_ours(bam, region, fa) == run_ref(dbg_ref, bam, region, fa)


def test_dbg_subregion(dbg_ref, tmp_path):
    rng = np.random.default_rng(7)
    bam, fa = make_case(tmp_path, rng, ref_len=8000, n_reads=80)
    region = "tig1:2001-6000"
    assert run_ours(bam, region, fa) == run_ref(dbg_ref, bam, region, fa)
