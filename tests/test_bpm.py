"""bpm kernel: edit-distance parity vs the compiled reference binary
(order-insensitive, like the reference regression's sorted diff)."""

import subprocess

import numpy as np
import pytest

from genarchbench_tpu.kernels import bpm as bpm_mod
from tests.synth import gen_seqpair_dataset


def run_ref_bpm(binary, input_text, tmp_path):
    inp = tmp_path / "pairs.txt"
    out = tmp_path / "ref.file"
    inp.write_text(input_text)
    r = subprocess.run([str(binary), "-a", "bpm-edit", "-i", str(inp),
                        "-o", str(out)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return sorted(out.read_text().splitlines())


def run_ours_bpm(input_text, tmp_path):
    inp = tmp_path / "pairs.txt"
    out = tmp_path / "tpu.file"
    inp.write_text(input_text)
    bpm_mod.run(["-a", "bpm-edit", "-i", str(inp), "-o", str(out)])
    return sorted(out.read_text().splitlines())


@pytest.mark.parametrize("seed,n,length,err", [
    (0, 50, 100, 0.05),
    (1, 40, 100, 0.30),     # high error rate
    (2, 30, 300, 0.10),     # multi-word patterns
    (3, 20, 20, 0.50),      # short, heavy edits
])
def test_bpm_matches_reference(bpm_ref, tmp_path, seed, n, length, err):
    rng = np.random.default_rng(seed)
    text = gen_seqpair_dataset(rng, n_pairs=n, length=length, error_rate=err)
    assert run_ours_bpm(text, tmp_path) == run_ref_bpm(bpm_ref, text, tmp_path)


def test_bpm_mixed_lengths(bpm_ref, tmp_path):
    rng = np.random.default_rng(9)
    parts = [gen_seqpair_dataset(rng, n_pairs=10, length=L, error_rate=0.2)
             for L in (10, 64, 65, 128, 200, 500)]
    text = "".join(parts)
    assert run_ours_bpm(text, tmp_path) == run_ref_bpm(bpm_ref, text, tmp_path)


def test_bpm_pallas_backend_matches_xla(tmp_path):
    """Pallas inner loop (interpreted off-TPU) == XLA path == reference."""
    from genarchbench_tpu.io.seqpair_io import read_seqpairs
    rng = np.random.default_rng(9)
    text = gen_seqpair_dataset(rng, n_pairs=30, length=90, error_rate=0.15)
    f = tmp_path / "pairs.txt"
    f.write_text(text)
    pairs = read_seqpairs(str(f), swap_longer_first=True)
    xla = bpm_mod.bpm_batch(pairs, backend="xla")
    pal = bpm_mod.bpm_batch(pairs, backend="pallas")
    np.testing.assert_array_equal(xla, pal)


@pytest.mark.parametrize("alg,seed,n,length,err", [
    ("bitpal-edit", 0, 32, 100, 0.1),
    ("bitpal-edit", 1, 24, 300, 0.25),
    ("bitpal-scored", 2, 32, 100, 0.1),
    ("bitpal-scored", 3, 24, 300, 0.25),
])
def test_bitpal_matches_reference(bpm_ref, tmp_path, alg, seed, n,
                                  length, err):
    """BitPAL variants (bitpal/bitpal.m0.x1.g1.c, m1.x4.g2.c): global
    linear-gap alignment scores."""
    import subprocess

    from genarchbench_tpu.kernels import bpm as bpm_mod
    rng = np.random.default_rng(seed)
    text = gen_seqpair_dataset(rng, n_pairs=n, length=length,
                               error_rate=err)
    inp = tmp_path / "pairs.txt"
    inp.write_text(text)
    outp = tmp_path / "ref.out"
    r = subprocess.run([str(bpm_ref), "-a", alg, "-i", str(inp),
                        "-o", str(outp)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-300:]
    want = sorted(outp.read_text().splitlines())

    ourp = tmp_path / "ours.out"
    bpm_mod.run(["-a", alg, "-i", str(inp), "-o", str(ourp)])
    assert sorted(ourp.read_text().splitlines()) == want
