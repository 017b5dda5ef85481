"""chain kernel: bit-exact parity vs the compiled reference binary."""

import subprocess

import numpy as np
import pytest

from genarchbench_tpu.kernels import chain as chain_mod
from tests.synth import gen_chain_input


def run_ref(binary, input_text, tmp_path):
    inp = tmp_path / "in.txt"
    out = tmp_path / "out_ref.txt"
    inp.write_text(input_text)
    r = subprocess.run([str(binary), "-i", str(inp), "-o", str(out)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return out.read_text()


def run_ours(input_text, tmp_path):
    inp = tmp_path / "in.txt"
    out = tmp_path / "out_tpu.txt"
    inp.write_text(input_text)
    chain_mod.run(["-i", str(inp), "-o", str(out)])
    return out.read_text()


@pytest.mark.parametrize("seed,n_records,max_anchors,n_segs", [
    (0, 10, 100, 1),
    (1, 25, 400, 1),
    (2, 8, 300, 2),
])
def test_chain_matches_reference(chain_ref, tmp_path, seed, n_records,
                                 max_anchors, n_segs):
    rng = np.random.default_rng(seed)
    text = gen_chain_input(rng, n_records=n_records, max_anchors=max_anchors,
                           n_segs=n_segs)
    ref_out = run_ref(chain_ref, text, tmp_path)
    our_out = run_ours(text, tmp_path)
    assert our_out == ref_out


def test_chain_skip_break_stress(chain_ref, tmp_path):
    """Dense low-score runs in front of each high-score anchor drive
    n_skip past MAX_SKIP BEFORE the true best predecessor is reached —
    the break changes scores/parents (verified: with_heuristics flips
    the result on this input), exercising the break-point (j*)
    computation of the dense scan (host_kernel.cpp:85-88)."""
    out = []
    for rec in range(6):
        xs, qs = [], []
        for k in range(1, 11):
            qa0 = 1000 * k - 500 - 200 * (k % 2)
            xa0 = 1000 * k - 100 - rec
            for j in range(35):
                xs.append(xa0 + 2 * j)
                qs.append(qa0 + 2 * j)
            xs.append(1000 * k)
            qs.append(1000 * k)
        x = np.array(xs, np.uint64)
        q = np.array(qs, np.uint64)
        y = (np.uint64(15) << np.uint64(32)) | q
        out.append(f"{len(x)} 23.5 5000 5000 5000 1\n")
        out.extend(f"{int(xi)} {int(yi)}\n" for xi, yi in zip(x, y))
        out.append("EOR\n")
    text = "".join(out)
    ref_out = run_ref(chain_ref, text, tmp_path)
    our_out = run_ours(text, tmp_path)
    assert our_out == ref_out


def test_chain_empty_and_single(chain_ref, tmp_path):
    rng = np.random.default_rng(7)
    text = gen_chain_input(rng, n_records=3, max_anchors=2)
    ref_out = run_ref(chain_ref, text, tmp_path)
    our_out = run_ours(text, tmp_path)
    assert our_out == ref_out


def test_chain_blob_single_device_path(chain_ref, tmp_path):
    """mesh=None takes the single-transfer blob wrapper (the TPU bench
    path); must stay bit-exact vs the reference binary."""
    import io as io_mod
    from genarchbench_tpu.io import chain_io
    rng = np.random.default_rng(4)
    text = gen_chain_input(rng, n_records=50, max_anchors=300)
    ref_out = run_ref(chain_ref, text, tmp_path)
    records = list(chain_io.read_records(io_mod.StringIO(text)))
    results = chain_mod.chain_batch(records, mesh=None)
    out = io_mod.StringIO()
    chain_io.write_returns(out, [(s, p) for s, p, _ in results])
    assert out.getvalue() == ref_out
