"""Umbrella CLI: list, run dispatch, and the regression harness's
device-count sweep + golden check (the run_wrapper.sh equivalent)."""

import io
import sys

import numpy as np
import pytest

from genarchbench_tpu import cli
from tests.synth import gen_seqpair_dataset


def test_list(capsys):
    assert cli.main(["list"]) == 0
    out = capsys.readouterr().out
    for name in ("chain", "bsw", "wfa", "kmer-cnt", "abea", "nn-base"):
        assert name in out


def test_run_dispatch(tmp_path, capsys):
    rng = np.random.default_rng(0)
    inp = tmp_path / "pairs.txt"
    inp.write_text(gen_seqpair_dataset(rng, n_pairs=8, length=60,
                                       error_rate=0.05))
    rc = cli.main(["run", "bpm", "-i", str(inp), "-o",
                   str(tmp_path / "out.txt")])
    assert rc == 0
    lines = (tmp_path / "out.txt").read_text().splitlines()
    assert len(lines) == 8 and all("score=" in ln for ln in lines)


def test_regress_sweep_and_golden(tmp_path):
    rng = np.random.default_rng(1)
    inp = tmp_path / "pairs.txt"
    inp.write_text(gen_seqpair_dataset(rng, n_pairs=12, length=50,
                                       error_rate=0.1))
    out1 = tmp_path / "o1.txt"
    # produce the golden with a direct run
    assert cli.main(["run", "bpm", "-i", str(inp), "-o", str(out1)]) == 0
    rc = cli.cmd_regress("bpm", ["-i", str(inp), "-o", str(out1)],
                         golden=None, devices=[1, 2], platform="cpu",
                         check_rule=None)
    assert rc == 0


def test_regress_scaling_table(tmp_path, capsys):
    """The device sweep emits the scaling artifact (BASELINE.md: items/s
    per device count + parallel efficiency)."""
    rng = np.random.default_rng(3)
    inp = tmp_path / "pairs.txt"
    inp.write_text(gen_seqpair_dataset(rng, n_pairs=12, length=50,
                                       error_rate=0.1))
    rc = cli.cmd_regress("wfa", ["-i", str(inp), "-o",
                                 str(tmp_path / "o.txt")],
                         golden=None, devices=[1, 2], platform="cpu",
                         check_rule=None)
    out = capsys.readouterr().out
    assert rc == 0
    line = next(ln for ln in out.splitlines()
                if ln.startswith("[wfa] scaling:"))
    assert "1dev" in line and "2dev" in line
    assert "pairs/s" in line and "eff" in line


def test_regress_detects_mismatch(tmp_path):
    rng = np.random.default_rng(2)
    inp = tmp_path / "pairs.txt"
    inp.write_text(gen_seqpair_dataset(rng, n_pairs=6, length=40,
                                       error_rate=0.1))
    golden = tmp_path / "bad_golden.txt"
    golden.write_text("this is wrong\n")
    out = tmp_path / "o.txt"
    # bpm CLI writes scores to -o, stdout carries nothing comparable;
    # use chain-style stdout kernels via a synthetic failing check:
    rc = cli.cmd_regress("bpm", ["-i", str(inp), "-o", str(out)],
                         golden=str(golden), devices=[1],
                         platform="cpu", check_rule="exact")
    assert rc == 1
