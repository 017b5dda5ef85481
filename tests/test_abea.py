"""abea: event detection, scaling estimation, and adaptive banded
alignment parity vs a harness built from the reference's own
align.c/events.c/model.c (.refbuild/abea_harness)."""

import pathlib
import subprocess

import numpy as np
import pytest

from genarchbench_tpu.kernels import abea

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def harness():
    h = REPO / ".refbuild" / "abea_harness"
    if not h.exists():
        pytest.skip("abea harness not built (.refbuild/abea_build)")
    return h


@pytest.fixture(scope="module")
def model(harness, tmp_path_factory):
    p = REPO / ".refbuild" / "r94_model.txt"
    if not p.exists():
        r = subprocess.run([str(harness), "model"], capture_output=True,
                           text=True, timeout=60)
        assert r.returncode == 0
        p.write_text(r.stdout)
    return abea.load_model(str(p))


def synth_signal(rng, model, seq, epk_lo=4, epk_hi=14, noise=0.8):
    ranks = abea.kmer_ranks(seq)
    levels = model["level_mean"][ranks]
    parts = [np.full(int(rng.integers(epk_lo, epk_hi)), lv)
             for lv in levels]
    sig = np.concatenate(parts).astype(np.float64)
    sig += rng.normal(0, noise, len(sig))
    return sig.astype(np.float32)


def ref_events(harness, sig, tmp_path):
    f = tmp_path / "raw.txt"
    np.savetxt(f, sig, fmt="%.9g")
    r = subprocess.run([str(harness), "events", str(f)],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0
    lines = r.stdout.splitlines()
    n = int(lines[0])
    return np.array([[float(x) for x in ln.split()]
                     for ln in lines[1:n + 1]])


def kmer_col_diffs(ours, ref):
    """The benchmark's acceptance semantics: rows whose kmer column
    differs (abea/scripts/regression_small.sh:79-88 compares columns
    3+10 and allows <= 10 mismatching lines).  XLA's FMA contraction
    can flip float32-tied trace decisions, shifting EVENT indices by
    one without changing the kmer column."""
    diffs = abs(len(ours) - len(ref))
    diffs += sum(1 for a, b in zip(ours, ref) if a[0] != b[0])
    return diffs


def ref_align(harness, seq, sig, tmp_path):
    fs = tmp_path / "seq.txt"
    fs.write_text(seq + "\n")
    f = tmp_path / "raw.txt"
    np.savetxt(f, sig, fmt="%.9g")
    r = subprocess.run([str(harness), "align", str(fs), str(f)],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0
    lines = r.stdout.splitlines()
    _, shift, scale = lines[0].split()
    n = int(lines[1])
    pairs = [tuple(int(x) for x in ln.split()) for ln in lines[2:n + 2]]
    return float(shift), float(scale), pairs


@pytest.mark.parametrize("seed,nsamp", [(0, 2000), (1, 5000)])
def test_events_match_reference(harness, tmp_path, seed, nsamp):
    rng = np.random.default_rng(seed)
    lv = rng.normal(90, 10, 60)
    reps = rng.integers(10, 40, 60)
    sig = (np.repeat(lv, reps) + rng.normal(0, 1.2, int(reps.sum()))
           ).astype(np.float32)[:nsamp]
    ours = abea.get_events(sig)
    ref = ref_events(harness, sig, tmp_path)
    assert len(ours) == len(ref), (len(ours), len(ref))
    np.testing.assert_array_equal(ours[:, 0], ref[:, 0])       # starts
    np.testing.assert_allclose(ours[:, 2], ref[:, 2], atol=2e-4)


def test_scalings_match_reference(harness, model, tmp_path):
    rng = np.random.default_rng(2)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 300))
    sig = synth_signal(rng, model, seq)
    sh_ref, sc_ref, _ = ref_align(harness, seq, sig, tmp_path)
    et = abea.get_events(sig)
    sh, sc = abea.estimate_scalings(seq, et, model)
    assert abs(sh - sh_ref) < 2e-3
    assert abs(sc - sc_ref) < 2e-4


@pytest.mark.parametrize("seed,seqlen", [(3, 200), (4, 400), (5, 300)])
def test_align_matches_reference(harness, model, tmp_path, seed, seqlen):
    rng = np.random.default_rng(seed)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, seqlen))
    sig = synth_signal(rng, model, seq)
    _, _, ref_pairs = ref_align(harness, seq, sig, tmp_path)
    et = abea.get_events(sig)
    ours = abea.align_batch([seq], [et], model)[0]
    assert ref_pairs, "reference alignment failed QC"
    assert ours, "our alignment failed QC but reference passed"
    assert kmer_col_diffs(ours, ref_pairs) <= 10


def test_align_batched_multiple(harness, model, tmp_path):
    rng = np.random.default_rng(6)
    seqs, sigs, refs = [], [], []
    for i in range(4):
        seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 150 + 40 * i))
        sig = synth_signal(rng, model, seq)
        seqs.append(seq)
        sigs.append(sig)
        refs.append(ref_align(harness, seq, sig, tmp_path)[2])
    ets = [abea.get_events(s) for s in sigs]
    ours = abea.align_batch(seqs, ets, model)
    for o, r in zip(ours, refs):
        assert kmer_col_diffs(o, r) <= 10


def test_fast5_readdb_cli_matches_npy(harness, model, tmp_path):
    """End-to-end driver: the f5c-style fast5+readdb input path
    (-r reads.fastq with <reads>.index.readdb beside it) must produce
    byte-identical eventalign TSV to the .npy signals-dir path."""
    from genarchbench_tpu.io import bam_io
    from genarchbench_tpu.io.fast5_io import (Fast5Index, write_fast5,
                                              write_readdb)
    from genarchbench_tpu.kernels.abea import run

    rng = np.random.default_rng(11)
    ref_seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 800))
    ref_fa = tmp_path / "ref.fa"
    ref_fa.write_text(">tig1\n" + ref_seq + "\n")

    dig, off, rng_pa = 8192.0, 10.0, 1467.6
    unit = rng_pa / dig
    npy_dir = tmp_path / "npy"
    npy_dir.mkdir()
    records, fast5_reads = [], []
    for i in range(5):
        pos = int(rng.integers(0, 500))
        L = int(rng.integers(150, 280))
        seq = ref_seq[pos:pos + L]
        sig = synth_signal(rng, model, seq)
        dac = np.round(sig.astype(np.float64) / unit - off)
        pa = ((dac.astype(np.float32) + np.float32(off))
              * np.float32(unit))            # what Fast5Index returns
        np.save(npy_dir / f"fr{i}.npy", pa)
        fast5_reads.append((f"fr{i}", pa))
        records.append(bam_io.BamRecord(
            f"fr{i}", 0, 0, pos, 60, [(0, L)], seq,
            np.full(L, 30, np.uint8)))
    records.sort(key=lambda r: (r.ref_id, r.pos))
    bam = tmp_path / "reads.bam"
    bam_io.write_bam(str(bam), [("tig1", len(ref_seq))], records)

    f5 = tmp_path / "sig.fast5"
    write_fast5(str(f5), fast5_reads, dig, off, rng_pa)
    reads_fq = tmp_path / "reads.fastq"
    reads_fq.write_text("")                  # only the index matters
    write_readdb(str(reads_fq) + ".index.readdb",
                 [(f"fr{i}", str(f5)) for i in range(5)])

    # fast5 signal must round-trip the calibration exactly
    idx = Fast5Index.for_reads(str(reads_fq))
    np.testing.assert_array_equal(idx.signal("fr0"), fast5_reads[0][1])

    mpath = str(REPO / ".refbuild" / "r94_model.txt")
    out_npy, out_f5 = tmp_path / "npy.tsv", tmp_path / "f5.tsv"
    assert run(["-b", str(bam), "-g", str(ref_fa), "-r", str(npy_dir),
                "--kmer-model", mpath, "-o", str(out_npy), "-K", "3"]) == 0
    assert run(["-b", str(bam), "-g", str(ref_fa), "-r", str(reads_fq),
                "--kmer-model", mpath, "-o", str(out_f5), "-K", "3"]) == 0
    npy_text = out_npy.read_text()
    assert npy_text == out_f5.read_text()
    assert len(npy_text.splitlines()) > 5    # real rows, not header-only
