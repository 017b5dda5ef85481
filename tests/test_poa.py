"""poa: consensus parity vs the reference msa_spoa_omp binary (built
against the bundled spoa via its own cmake)."""

import pathlib
import subprocess

import numpy as np
import pytest

from genarchbench_tpu.kernels import poa as poa_mod

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def poa_ref():
    out = REPO / ".refbuild" / "poa_ref"
    if not out.exists():
        pytest.skip("poa oracle not built (needs spoa cmake build)")
    return out


def gen_batches(rng, n_batches=4, n_seqs=8, length=120, err=0.1):
    text = []
    for b in range(n_batches):
        base = "".join("ACGT"[c] for c in rng.integers(0, 4, length))
        for s in range(n_seqs):
            seq = []
            for ch in base:
                r = rng.random()
                if r < err / 3:
                    seq.append("ACGT"[rng.integers(0, 4)])
                elif r < 2 * err / 3:
                    seq.append(ch + "ACGT"[rng.integers(0, 4)])
                elif r < err:
                    pass
                else:
                    seq.append(ch)
            text.append(f">{b}0_{s}\n")       # 2nd char '0' on first only
            text.append("".join(seq) + "\n")
    # reference format: batch starts when header's 2nd char == '0';
    # build it properly: first seq header per batch has 2nd char '0',
    # others '1'
    out = []
    i = 0
    for b in range(n_batches):
        for s in range(n_seqs):
            mark = "0" if s == 0 else "1"
            out.append(f"s{mark}_{b}_{s}\n")
            out.append(text[2 * i + 1])
            i += 1
    return "".join(out)


def run_ref(binary, path):
    r = subprocess.run([str(binary), "-s", str(path), "-t", "1"],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-400:]
    return [ln for ln in r.stdout.splitlines() if ln and ln[0] != ">"]


def run_ours(path):
    batches = poa_mod.read_batches(str(path))
    eng = poa_mod.ConvexNWEngine()
    return [poa_mod.consensus_for_batch(seqs, eng) for seqs in batches]


@pytest.mark.parametrize("seed,n_seqs,length,err", [
    (0, 6, 80, 0.08),
    (1, 8, 120, 0.15),
    (2, 4, 60, 0.03),
])
def test_poa_matches_reference(poa_ref, tmp_path, seed, n_seqs, length,
                               err):
    rng = np.random.default_rng(seed)
    path = tmp_path / "seq.fa"
    path.write_text(gen_batches(rng, n_batches=3, n_seqs=n_seqs,
                                length=length, err=err))
    assert run_ours(path) == run_ref(poa_ref, path)


def test_poa_identical_seqs(poa_ref, tmp_path):
    path = tmp_path / "seq.fa"
    path.write_text("s0_0\nACGTACGTGG\ns1_1\nACGTACGTGG\n"
                    "s1_2\nACGTACGTGG\n")
    assert run_ours(path) == run_ref(poa_ref, path)
