"""Native C readers vs the pure-Python parsers: byte-identical outputs
on every input format, including gzip, filtering, and edge cases."""

import gzip

import numpy as np
import pytest

from genarchbench_tpu import native
from tests.synth import gen_bsw_input, gen_chain_input, gen_seqpair_dataset

pytestmark = pytest.mark.skipif(native.readers_lib() is None,
                                reason="no C compiler for native readers")


def _check_fasta(path, min_len=0):
    from genarchbench_tpu.io.fasta_io import _read_fasta_py
    py = _read_fasta_py(str(path), min_len)
    nat = native.fasta_native(str(path), min_len, table=0)
    assert nat is not None
    names, seqs = nat
    assert names == py.names
    assert len(seqs) == len(py.seqs)
    for a, b in zip(seqs, py.seqs):
        np.testing.assert_array_equal(a, b)


def test_fasta_native_matches_py(tmp_path):
    rng = np.random.default_rng(0)
    f = tmp_path / "r.fasta"
    with open(f, "w") as fh:
        for i in range(25):
            L = int(rng.integers(5, 400))
            s = "".join("ACGTNacgtn"[c] for c in rng.integers(0, 10, L))
            fh.write(f">read_{i} extra comment\n")
            for j in range(0, L, 60):
                fh.write(s[j:j + 60] + "\n")
    _check_fasta(f)
    _check_fasta(f, min_len=100)


def test_fasta_native_gz(tmp_path):
    rng = np.random.default_rng(1)
    f = tmp_path / "r.fasta.gz"
    with gzip.open(f, "wt") as fh:
        for i in range(8):
            s = "".join("ACGT"[c] for c in rng.integers(0, 4, 200))
            fh.write(f">g{i}\n{s}\n")
    _check_fasta(f)


def test_fastq_native_matches_py(tmp_path):
    rng = np.random.default_rng(2)
    f = tmp_path / "r.fastq"
    with open(f, "w") as fh:
        for i in range(20):
            L = int(rng.integers(10, 300))
            s = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
            fh.write(f"@q{i} d\n{s}\n+\n{'I' * L}\n")
    _check_fasta(f)
    _check_fasta(f, min_len=150)


def test_seqpair_native_matches_py(tmp_path):
    from genarchbench_tpu.io.seqpair_io import _read_seqpairs_py
    rng = np.random.default_rng(3)
    f = tmp_path / "p.txt"
    f.write_text(gen_seqpair_dataset(rng, n_pairs=40, length=120,
                                     error_rate=0.2))
    for swap in (False, True):
        py = _read_seqpairs_py(str(f), swap)
        nat = native.seqpair_native(str(f), swap)
        assert nat is not None
        pats, txts = nat
        assert len(pats) == len(py.patterns)
        for a, b in zip(pats, py.patterns):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(txts, py.texts):
            np.testing.assert_array_equal(a, b)


def test_bsw_native_matches_py(tmp_path):
    from genarchbench_tpu.io.bsw_io import _read_bsw_pairs_py
    rng = np.random.default_rng(4)
    f = tmp_path / "b.txt"
    f.write_text(gen_bsw_input(rng, n_pairs=30, ref_len=150, query_len=90))
    py = _read_bsw_pairs_py(str(f))
    nat = native.bsw_native(str(f))
    assert nat is not None
    h0, refs, qrs = nat
    np.testing.assert_array_equal(h0, py.h0)
    for a, b in zip(refs, py.refs):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(qrs, py.quers):
        np.testing.assert_array_equal(a, b)


def test_chain_native_matches_py(tmp_path):
    import io as _io
    from genarchbench_tpu.io import chain_io
    rng = np.random.default_rng(5)
    text = gen_chain_input(rng, n_records=12, max_anchors=80)
    f = tmp_path / "c.txt"
    f.write_text(text)
    py = list(chain_io.read_records(_io.StringIO(text)))
    nat = chain_io.read_records_path(str(f))
    assert len(nat) == len(py)
    for a, b in zip(nat, py):
        assert (a.n, a.avg_qspan, a.max_dist_x, a.max_dist_y, a.bw,
                a.n_segs) == (b.n, b.avg_qspan, b.max_dist_x,
                              b.max_dist_y, b.bw, b.n_segs)
        np.testing.assert_array_equal(a.x, b.x)
        np.testing.assert_array_equal(a.y, b.y)


def test_native_reader_used_by_readers(tmp_path):
    """The public read_* entry points produce the same types either way."""
    from genarchbench_tpu.io.fasta_io import read_fasta
    rng = np.random.default_rng(6)
    f = tmp_path / "r.fasta"
    s = "".join("ACGT"[c] for c in rng.integers(0, 4, 100))
    f.write_text(f">a\n{s}\n")
    rs = read_fasta(str(f))
    assert rs.names == ["a"] and len(rs.seqs[0]) == 100
    assert rs.seqs[0].dtype == np.uint8


def test_sais_matches_doubling():
    """native SA-IS vs prefix doubling vs brute force, random texts."""
    from genarchbench_tpu import native
    rng = np.random.default_rng(5)
    for n, K in [(1, 4), (2, 4), (7, 2), (64, 4), (257, 4),
                 (1000, 4), (5000, 2), (3000, 4)]:
        codes = rng.integers(0, K, n).astype(np.uint8)
        sa = native.sais_native(codes)
        if sa is None:
            pytest.skip("no C toolchain")
        s = codes.tobytes()
        want = sorted(range(n), key=lambda i: s[i:])
        assert list(sa) == want, (n, K)
