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
