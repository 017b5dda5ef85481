"""Data-parallel mesh paths: each aligner kernel must produce identical
results sharded over the 8-device virtual mesh as on one device (the
reference's 1/2/4-thread determinism regression, SURVEY.md §4)."""

import numpy as np
import pytest

from genarchbench_tpu.sharding.mesh import (data_mesh, devices_from_env,
                                            mesh_size, pad_batch, shard_args)
from tests.synth import gen_chain_input, gen_seqpair_dataset


def test_mesh_helpers(monkeypatch):
    m = data_mesh(8)
    assert mesh_size(m) == 8
    assert data_mesh(1) is None and mesh_size(None) == 1
    assert pad_batch(5, m) == 8 and pad_batch(8, m) == 8
    assert pad_batch(9, None) == 9
    monkeypatch.setenv("GENARCH_DEVICES", "4")
    assert devices_from_env() == 4
    a, = shard_args(m, np.arange(16.0).reshape(8, 2))
    assert np.allclose(np.asarray(a), np.arange(16.0).reshape(8, 2))


def test_chain_sharded_matches_single():
    from genarchbench_tpu.io import chain_io
    from genarchbench_tpu.kernels.chain import chain_batch
    import io

    rng = np.random.default_rng(11)
    text = gen_chain_input(rng, n_records=10, max_anchors=60)
    records = list(chain_io.read_records(io.StringIO(text)))
    single = chain_batch(records)
    sharded = chain_batch(records, mesh=data_mesh(8))
    for (s1, p1, _), (s2, p2, _) in zip(single, sharded):
        np.testing.assert_array_equal(s1, s2)
        np.testing.assert_array_equal(p1, p2)


def test_bpm_sharded_matches_single(tmp_path):
    from genarchbench_tpu.io.seqpair_io import read_seqpairs
    from genarchbench_tpu.kernels.bpm import bpm_batch

    rng = np.random.default_rng(12)
    f = tmp_path / "pairs.txt"
    f.write_text(gen_seqpair_dataset(rng, n_pairs=24, length=70,
                                     error_rate=0.12))
    pairs = read_seqpairs(str(f), swap_longer_first=True)
    np.testing.assert_array_equal(
        bpm_batch(pairs), bpm_batch(pairs, mesh=data_mesh(8)))


def test_bsw_sharded_matches_single(tmp_path):
    from tests.synth import gen_bsw_input
    from genarchbench_tpu.io.bsw_io import read_bsw_pairs
    from genarchbench_tpu.kernels.bsw import bsw_batch

    rng = np.random.default_rng(13)
    f = tmp_path / "pairs.txt"
    f.write_text(gen_bsw_input(rng, n_pairs=20, ref_len=90, query_len=80))
    pairs = read_bsw_pairs(str(f))
    np.testing.assert_array_equal(
        bsw_batch(pairs), bsw_batch(pairs, mesh=data_mesh(8)))


def test_wfa_sharded_matches_single(tmp_path):
    from genarchbench_tpu.io.seqpair_io import read_seqpairs
    from genarchbench_tpu.kernels.wfa import wfa_batch

    rng = np.random.default_rng(14)
    f = tmp_path / "pairs.txt"
    f.write_text(gen_seqpair_dataset(rng, n_pairs=16, length=60,
                                     error_rate=0.08))
    pairs = read_seqpairs(str(f), swap_longer_first=False)
    assert wfa_batch(pairs) == wfa_batch(pairs, mesh=data_mesh(8))


def test_fmi_sharded_matches_single():
    """Reads data-parallel + replicated occ tables == single device."""
    from genarchbench_tpu.kernels.fmi import (FMISearch, build_index,
                                              search_reads)
    rng = np.random.default_rng(15)
    ref = rng.integers(0, 4, 600).astype(np.uint8)
    index = build_index(ref)
    reads = []
    for _ in range(12):
        p = int(rng.integers(0, 500))
        L = int(rng.integers(30, 80))
        r = ref[p:p + L].copy()
        nmut = max(1, L // 20)
        idx = rng.integers(0, L, nmut)
        r[idx] = rng.integers(0, 4, nmut)
        reads.append(r)
    single = search_reads(FMISearch(index), reads, 8, 19)
    sharded = search_reads(FMISearch(index, mesh=data_mesh(8)),
                           reads, 8, 19)
    assert len(single) == len(sharded)
    for a, b in zip(single, sharded):
        for ca, cb in zip(a, b):
            assert np.array_equal(ca, cb)


def test_abea_sharded_matches_single():
    from genarchbench_tpu.kernels import abea
    import pathlib
    model_path = pathlib.Path(".refbuild/r94_model.txt")
    if not model_path.exists():
        pytest.skip("pore model dump not built")
    model = abea.load_model(str(model_path))
    rng = np.random.default_rng(16)
    seqs, evs = [], []
    for _ in range(5):
        L = int(rng.integers(80, 140))
        s = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
        ranks = abea.kmer_ranks(s)
        means = model["level_mean"][ranks]
        n_ev = int(len(ranks) * 1.4)
        idx = np.sort(rng.integers(0, len(ranks), n_ev))
        sig = means[idx] + rng.normal(0, 1.0, n_ev)
        et = np.zeros((n_ev, 4), np.float64)
        et[:, 2] = sig
        et[:, 3] = 1.0
        seqs.append(s)
        evs.append(et)
    single = abea.align_batch(seqs, evs, model)
    sharded = abea.align_batch(seqs, evs, model, mesh=data_mesh(8))
    assert single == sharded
