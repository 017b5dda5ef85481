"""pileup: TSV parity vs the reference medaka_counts binary (built with
PRINT_OUTPUT against the bundled htslib), on synthetic BAMs written by
our own BAM writer (also validates bam_io round-trip + BAI index)."""

import pathlib
import subprocess

import numpy as np
import pytest

from genarchbench_tpu.io import bam_io
from genarchbench_tpu.kernels import pileup as plp


def make_bam(path, rng, ref_len=2000, n_reads=40, with_indels=True,
             read_len=160):
    refs = [("tig1", ref_len), ("tig2", ref_len)]
    records = []
    for i in range(n_reads):
        pos = int(rng.integers(0, ref_len - read_len))
        flag = 16 if rng.random() < 0.5 else 0
        if rng.random() < 0.05:
            flag |= 0x100                        # secondary: filtered
        cig = []
        remaining = read_len
        qlen = 0
        if rng.random() < 0.3:
            s = int(rng.integers(1, 8))
            cig.append((4, s))                   # soft clip
            qlen += s
        while remaining > 0:
            m = int(rng.integers(min(5, remaining), remaining + 1))
            cig.append((0, m))
            qlen += m
            remaining -= m
            if remaining > 2 and with_indels:
                r = rng.random()
                if r < 0.35:
                    ln = int(rng.integers(1, 4))
                    cig.append((1, ln))          # insertion
                    qlen += ln
                elif r < 0.6:
                    ln = int(rng.integers(1, 4))
                    cig.append((2, min(ln, remaining)))  # deletion
                    remaining -= min(ln, remaining)
                elif r < 0.68:
                    ln = int(rng.integers(2, 6))
                    cig.append((3, min(ln, remaining)))  # refskip
                    remaining -= min(ln, remaining)
        seq = "".join("ACGTN"[c] for c in
                      rng.choice(5, size=qlen, p=[.24, .24, .24, .24, .04]))
        qual = rng.integers(0, 40, qlen).astype(np.uint8)
        mapq = int(rng.integers(0, 50))
        records.append(bam_io.BamRecord(
            f"read{i}", flag, int(rng.integers(0, 2)), pos, mapq,
            cig, seq, qual))
    records.sort(key=lambda r: (r.ref_id, r.pos))
    bam_io.write_bam(str(path), refs, records)
    return refs, records


@pytest.fixture(scope="module")
def pileup_ref():
    refbuild = pathlib.Path(__file__).resolve().parent.parent / ".refbuild"
    out = refbuild / "pileup_ref"
    if not out.exists():
        hts = refbuild / "htslib-1.9"
        if not (hts / "libhts.a").exists():
            r = subprocess.run(
                ["bash", "-c",
                 f"cd {refbuild} && tar xjf /root/reference/benchmarks/abea/"
                 f"htslib.tar.bz2 && cd htslib-1.9 && ./configure "
                 f"--disable-libcurl --disable-bz2 --disable-lzma && "
                 f"make -j8 lib-static"],
                capture_output=True, text=True, timeout=600)
            if r.returncode != 0:
                pytest.skip(f"htslib build failed: {r.stderr[-300:]}")
        src = "/root/reference/benchmarks/pileup/src"
        r = subprocess.run(
            ["bash", "-c",
             f"gcc -O2 -fopenmp -std=c99 -DPRINT_OUTPUT=1 "
             f"-Dsam_hdr_t=bam_hdr_t -Dsam_hdr_destroy=bam_hdr_destroy "
             f"-I {hts} -I {src} -o {out} {src}/medaka_counts.c "
             f"{src}/medaka_bamiter.c {src}/medaka_common.c "
             f"{hts}/libhts.a -ldeflate -lz -lpthread -lm"],
            capture_output=True, text=True, timeout=300)
        if r.returncode != 0:
            pytest.skip(f"pileup_ref build failed: {r.stderr[-300:]}")
    return out


def run_ref(binary, bam, region):
    r = subprocess.run([str(binary), str(bam), region, "1"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-500:]
    return r.stdout


def run_ours(bam, region, capsys=None):
    import io
    import sys as _sys
    buf = io.StringIO()
    old = _sys.stdout
    _sys.stdout = buf
    try:
        plp.run([str(bam), region, "1"])
    finally:
        _sys.stdout = old
    return buf.getvalue()


def test_bam_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    bam = tmp_path / "t.bam"
    refs, records = make_bam(bam, rng, n_reads=10)
    refs2, records2 = bam_io.read_bam(str(bam))
    assert refs2 == refs
    assert len(records2) == len(records)
    for a, b in zip(records, records2):
        assert (a.qname, a.flag, a.ref_id, a.pos, a.mapq) == \
            (b.qname, b.flag, b.ref_id, b.pos, b.mapq)
        assert a.cigar == b.cigar
        assert a.seq == b.seq
        assert np.array_equal(a.qual, b.qual)


@pytest.mark.parametrize("seed,region", [
    (1, "tig1:1-2000"),
    (2, "tig2:100-1500"),
    (3, "tig1:1-2000"),
])
def test_pileup_matches_reference(pileup_ref, tmp_path, seed, region):
    rng = np.random.default_rng(seed)
    bam = tmp_path / "t.bam"
    make_bam(bam, rng, n_reads=60)
    assert run_ours(bam, region) == run_ref(pileup_ref, bam, region)


def test_pileup_multi_chunk(pileup_ref, tmp_path):
    """Region longer than the 100kb chunk split."""
    rng = np.random.default_rng(4)
    bam = tmp_path / "t.bam"
    refs = [("big", 250000)]
    records = []
    for i in range(50):
        pos = int(rng.integers(0, 250000 - 200))
        seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 200))
        records.append(bam_io.BamRecord(
            f"r{i}", 0 if i % 2 else 16, 0, pos, 30, [(0, 200)], seq,
            rng.integers(0, 40, 200).astype(np.uint8)))
    records.sort(key=lambda r: r.pos)
    bam_io.write_bam(str(bam), refs, records)
    region = "big:1-250000"
    assert run_ours(bam, region) == run_ref(pileup_ref, bam, region)


def test_pileup_dense_chunk_boundary(pileup_ref, tmp_path):
    """Reads covering the 100k chunk boundary exercise the reference's
    overlapping-chunk re-parse quirk."""
    rng = np.random.default_rng(5)
    bam = tmp_path / "t.bam"
    refs = [("big", 220000)]
    records = []
    for i in range(30):
        pos = 99000 + int(rng.integers(0, 2000))
        seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 500))
        records.append(bam_io.BamRecord(
            f"r{i}", 0 if i % 2 else 16, 0, pos, 30, [(0, 500)], seq,
            rng.integers(0, 40, 500).astype(np.uint8)))
    records.sort(key=lambda r: r.pos)
    bam_io.write_bam(str(bam), refs, records)
    region = "big:1-220000"
    assert run_ours(bam, region) == run_ref(pileup_ref, bam, region)


def test_native_bgzf_matches_python(tmp_path):
    """The C BGZF decoder and the pure-Python path produce identical
    bytes (bam_io uses native when the toolchain exists)."""
    import importlib
    import struct
    import zlib
    from genarchbench_tpu import native
    rng = np.random.default_rng(11)
    bam = tmp_path / "t.bam"
    make_bam(bam, rng, n_reads=30)
    raw = bam.read_bytes()
    nat = native.bgzf_decompress(raw)
    if nat is None:
        pytest.skip("no C toolchain for native bgzf")
    # pure-python decode (mirror of bam_io's fallback)
    out = []
    pos = 0
    while pos < len(raw):
        xlen = struct.unpack("<H", raw[pos + 10:pos + 12])[0]
        extra = raw[pos + 12:pos + 12 + xlen]
        e = 0
        bsize = None
        while e < len(extra):
            si1, si2 = extra[e], extra[e + 1]
            slen = struct.unpack("<H", extra[e + 2:e + 4])[0]
            if si1 == 66 and si2 == 67:
                bsize = struct.unpack("<H", extra[e + 4:e + 6])[0] + 1
            e += 4 + slen
        payload = raw[pos + 12 + xlen:pos + bsize - 8]
        out.append(zlib.decompress(payload, -15))
        pos += bsize
    assert nat == b"".join(out)
