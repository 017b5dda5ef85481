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


def test_gap_corr_native_matches_dense_scan():
    """The native candidate-enumeration correction scan
    (readers.c::chain_gap_corr) must find exactly the dd values where
    the device's two-op f32 gap product truncates differently from the
    reference's f64 one (host_kernel.cpp:74) — verified against an
    exhaustive dense scan over a wide avg_qspan range including the
    tiny-avg dense-fallback branch and the SAFE_PROD deferral."""
    from genarchbench_tpu import native
    from genarchbench_tpu.kernels.chain import CORR_K, SAFE_PROD
    rng = np.random.default_rng(0)
    avgs = np.concatenate(
        [rng.uniform(2.0, 400.0, 120), rng.uniform(0.2, 2.0, 20),
         [10.0, 25.5, 39.99, 655.0]]).astype(np.float32)
    t_size = 5001
    res = native.chain_gap_corr_native(avgs, t_size, CORR_K, SAFE_PROD)
    if res is None:
        pytest.skip("native library unavailable")
    cdd, cdel, over = res
    for r, a32 in enumerate(avgs):
        av = float(a32)
        if av * (t_size - 1) * 0.01 > SAFE_PROD:
            assert over[r]
            continue
        dd64 = np.arange(t_size, dtype=np.float64)
        exact = (dd64 * 0.01 * av).astype(np.int32)
        appr = ((np.arange(t_size, dtype=np.float32)
                 * np.float32(0.01)) * a32).astype(np.int32)
        mism = np.nonzero(appr != exact)[0]
        if len(mism) > CORR_K:
            assert over[r]
            continue
        assert not over[r]
        got = cdd[r][cdd[r] >= 0]
        assert set(got.tolist()) == set(mism.tolist())
        for d_, del_ in zip(cdd[r], cdel[r]):
            if d_ >= 0:
                assert exact[d_] - appr[d_] == del_
