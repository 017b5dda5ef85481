"""wfa kernel: CIGAR parity vs the compiled reference align_benchmark
(complete-wavefronts mode, default penalties)."""

import subprocess

import numpy as np
import pytest

from genarchbench_tpu.kernels import wfa as wfa_mod
from genarchbench_tpu.io.seqpair_io import read_seqpairs
from tests.synth import gen_seqpair_dataset


def ref_lines(binary, input_text, tmp_path, extra=()):
    inp = tmp_path / "pairs.txt"
    outp = tmp_path / "ref.out"
    inp.write_text(input_text)
    r = subprocess.run([str(binary), "-i", str(inp), "-o", str(outp),
                       *extra], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-500:]
    return sorted(outp.read_text().splitlines())


def our_lines(input_text, tmp_path, x=4, o=6, e=2):
    inp = tmp_path / "pairs.txt"
    inp.write_text(input_text)
    pairs = read_seqpairs(str(inp), swap_longer_first=False)
    cigars = wfa_mod.wfa_batch(pairs, x=x, o=o, e=e)
    return sorted(f"id={i} {c}" for i, c in enumerate(cigars))


@pytest.mark.parametrize("seed,n,length,err", [
    (0, 32, 100, 0.05),
    (1, 48, 100, 0.20),
    (2, 16, 60, 0.02),
    (3, 24, 150, 0.10),
])
def test_wfa_matches_reference(wfa_ref, tmp_path, seed, n, length, err):
    rng = np.random.default_rng(seed)
    text = gen_seqpair_dataset(rng, n_pairs=n, length=length, error_rate=err)
    assert our_lines(text, tmp_path) == ref_lines(wfa_ref, text, tmp_path)


def test_wfa_scap_retry(wfa_ref, tmp_path):
    """Pairs needing a score above the initial cap exercise the retry."""
    rng = np.random.default_rng(9)
    text = gen_seqpair_dataset(rng, n_pairs=8, length=120, error_rate=0.45)
    ours = our_lines(text, tmp_path)
    assert ours == ref_lines(wfa_ref, text, tmp_path)


def test_wfa_identical_pair(wfa_ref, tmp_path):
    text = ">ACGTACGTAC\n<ACGTACGTAC\n>AC\n<TG\n"
    assert our_lines(text, tmp_path) == ref_lines(wfa_ref, text, tmp_path)


@pytest.mark.parametrize("seed,n,length,err,mlen,mdist", [
    (5, 32, 100, 0.10, 10, 50),
    (6, 24, 150, 0.20, 10, 25),
    (7, 16, 80, 0.05, 5, 10),
])
def test_wfa_adaptive_reduction_matches_reference(wfa_ref, tmp_path,
                                                  seed, n, length, err,
                                                  mlen, mdist):
    """Adaptive wavefront reduction (affine_wavefront_extend.c:85-156)
    parity: --minimum-wavefront-length/--maximum-difference-distance."""
    rng = np.random.default_rng(seed)
    text = gen_seqpair_dataset(rng, n_pairs=n, length=length,
                               error_rate=err)
    inp = tmp_path / "pairs.txt"
    inp.write_text(text)
    pairs = read_seqpairs(str(inp), swap_longer_first=False)
    cigars = wfa_mod.wfa_batch(pairs, red_len=mlen, red_dist=mdist)
    ours = sorted(f"id={i} {c}" for i, c in enumerate(cigars))
    want = ref_lines(wfa_ref, text, tmp_path,
                     extra=["--minimum-wavefront-length", str(mlen),
                            "--maximum-difference-distance", str(mdist)])
    assert ours == want
