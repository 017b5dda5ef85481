"""kmer-cnt: distinct canonical k-mer count parity vs the reference
binary (small k so its 4^k flat counter stays fast) and a pure-python
model; multi-device sharded path on the virtual mesh."""

import re
import subprocess

import numpy as np
import pytest

from genarchbench_tpu.io.fasta_io import ReadSet, read_fasta
from genarchbench_tpu.kernels import kmer as km


def gen_fasta(rng, path, n_reads=6, min_len=5200, max_len=9000,
              with_ns=False):
    with open(path, "w") as f:
        for i in range(n_reads):
            L = int(rng.integers(min_len, max_len))
            s = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
            f.write(f">read_{i}\n")
            for j in range(0, L, 80):
                f.write(s[j:j + 80] + "\n")


def py_distinct(reads: ReadSet, k: int) -> int:
    seen = set()
    for s in reads.seqs:
        s = s.astype(np.int64)
        # reference IterKmers drops the final position (kmer.h:194-198)
        for i in range(len(s) - k):
            fwd = 0
            for c in s[i:i + k]:
                fwd = fwd * 4 + int(c)
            rc = 0
            t = fwd
            for _ in range(k):
                rc = rc * 4 + (3 - (t & 3))
                t >>= 2
            seen.add(min(fwd, rc))
    return len(seen)


@pytest.fixture(scope="module")
def kmer_ref(tmp_path_factory):
    import pathlib
    out = pathlib.Path(__file__).resolve().parent.parent / ".refbuild" / "kmercnt_ref"
    if not out.exists():
        ref = "/root/reference/benchmarks/kmer-cnt"
        cmd = (f"g++ -O2 -fopenmp -std=c++14 -I {ref} -I {ref}/libcuckoo "
               f"-o {out} {ref}/kmer_cnt.cpp {ref}/vertex_index.cpp "
               f"{ref}/sequence_container.cpp {ref}/sequence.cpp -lz")
        r = subprocess.run(["bash", "-c", cmd], capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"cannot build kmercnt_ref: {r.stderr[-400:]}")
    return out


def ref_count(binary, fasta, cfg_dir, k):
    cfg = cfg_dir / "t.cfg"
    cfg.write_text(f"kmer_size = {k}\nuse_minimizers = 0\n"
                   "assemble_kmer_sample = 1\n")
    r = subprocess.run([str(binary), "--reads", str(fasta), "--config",
                        str(cfg), "--debug", "--threads", "2"],
                       capture_output=True, text=True, timeout=300)
    m = re.search(r"Total k-mers (\d+)", r.stderr + r.stdout)
    assert m, (r.stdout + r.stderr)[-500:]
    return int(m.group(1))


def test_kmer_matches_reference_k11(kmer_ref, tmp_path):
    rng = np.random.default_rng(0)
    fasta = tmp_path / "reads.fasta"
    gen_fasta(rng, fasta, n_reads=6)
    reads = read_fasta(str(fasta), min_len=5000)
    ours = km.count_distinct(reads, 11)
    assert ours == ref_count(kmer_ref, fasta, tmp_path, 11)


def test_kmer_matches_python_k17(tmp_path):
    rng = np.random.default_rng(1)
    fasta = tmp_path / "reads.fasta"
    gen_fasta(rng, fasta, n_reads=3, min_len=600, max_len=900)
    reads = read_fasta(str(fasta), min_len=0)
    assert km.count_distinct(reads, 17) == py_distinct(reads, 17)


def test_kmer_repeats_and_palindromes(tmp_path):
    # repeated sequence: few distinct kmers; revcomp pair collapses
    reads = ReadSet(["a", "b"], [
        np.tile(np.array([0, 1, 2, 3], np.uint8), 50),
        np.array([0, 0, 1, 1, 2, 2, 3, 3] * 20, np.uint8)])
    assert km.count_distinct(reads, 5) == py_distinct(reads, 5)


def test_kmer_sharded_matches(tmp_path):
    import jax
    from jax.sharding import Mesh
    rng = np.random.default_rng(2)
    fasta = tmp_path / "reads.fasta"
    gen_fasta(rng, fasta, n_reads=4, min_len=2000, max_len=3000)
    reads = read_fasta(str(fasta), min_len=0)
    mesh = Mesh(np.array(jax.devices()[:8]), ("kspace",))
    want = km.count_distinct(reads, 15)
    assert km.count_distinct_sharded(reads, 15, mesh=mesh) == want


def test_min_length_filter(tmp_path):
    fasta = tmp_path / "r.fasta"
    fasta.write_text(">a\n" + "ACGT" * 300 + "\n>b\n" + "AC" * 100 + "\n")
    reads = read_fasta(str(fasta), min_len=1000)
    assert len(reads) == 1 and len(reads.seqs[0]) == 1200


def test_count_replicates_overflow_bug(kmer_ref, tmp_path):
    """A k-mer seen >256 times is re-counted on every 8-bit counter
    wrap (vertex_index.cpp:820-833) — Total k-mers must match."""
    rep = "ACGTACGTACGT"  # k=11 kmers repeat ~600x in the tandem read
    fasta = tmp_path / "rep.fasta"
    with open(fasta, "w") as f:
        f.write(">tandem\n")
        s = rep * 600
        for j in range(0, len(s), 80):
            f.write(s[j:j + 80] + "\n")
        # plus a normal read so the file is representative
        rng = np.random.default_rng(8)
        f.write(">normal\n")
        t = "".join("ACGT"[c] for c in rng.integers(0, 4, 6000))
        for j in range(0, len(t), 80):
            f.write(t[j:j + 80] + "\n")
    reads = read_fasta(str(fasta), min_len=0)
    ours = km.count_distinct(reads, 11)
    assert ours == ref_count(kmer_ref, fasta, tmp_path, 11)


@pytest.mark.parametrize("seed,k,w", [(0, 11, 5), (1, 15, 8), (2, 17, 3)])
def test_yield_minimizers_matches_reference(tmp_path, seed, k, w):
    import pathlib
    import subprocess as sp
    binary = pathlib.Path(__file__).resolve().parent.parent / \
        ".refbuild" / "kmer_mini_ref"
    if not binary.exists():
        ref = "/root/reference/benchmarks/kmer-cnt"
        r = sp.run(["bash", "-c",
                    f"g++ -O2 -std=c++14 -I {ref} -o {binary} "
                    f"{binary.parent}/kmer_build/mini_main.cpp "
                    f"{ref}/sequence.cpp"],
                   capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip("cannot build minimizer oracle")
    rng = np.random.default_rng(seed)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 3000))
    r = sp.run([str(binary), str(k), str(w)], input=seq + "\n",
               capture_output=True, text=True, timeout=120)
    assert r.returncode == 0
    ref_mins = [tuple(int(x) for x in ln.split())
                for ln in r.stdout.splitlines()]
    codes = np.array([{"A": 0, "C": 1, "G": 2, "T": 3}[c]
                      for c in seq], np.uint8)
    ours = []
    for (pos, fwd) in km.yield_minimizers(codes, k, w):
        rc = 0
        t = fwd
        for _ in range(k):
            rc = (rc << 2) | (3 - (t & 3))
            t >>= 2
        ours.append((pos, min(fwd, rc)))
    assert ours == ref_mins
