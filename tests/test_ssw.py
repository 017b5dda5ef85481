"""SSW parity vs the compiled reference ssw.c (the Clair3 realigner's
aligner, preprocess/realign/ssw.c)."""

import pathlib
import subprocess

import numpy as np
import pytest

from genarchbench_tpu.nn.ssw import SswAligner

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def ssw_ref():
    out = REPO / ".refbuild" / "ssw_ref"
    if not out.exists():
        pytest.skip("ssw oracle not built")
    return out


def mutate(rng, s, err):
    out = []
    for ch in s:
        r = rng.random()
        if r < err / 3:
            out.append("ACGT"[rng.integers(0, 4)])
        elif r < 2 * err / 3:
            out.append(ch + "ACGT"[rng.integers(0, 4)])
        elif r < err:
            pass
        else:
            out.append(ch)
    return "".join(out)


@pytest.mark.parametrize("seed,n,rdlen,rflen,err", [
    (0, 24, 40, 80, 0.05),
    (1, 24, 100, 160, 0.12),
    (2, 16, 30, 30, 0.25),
])
def test_ssw_matches_reference(ssw_ref, seed, n, rdlen, rflen, err):
    rng = np.random.default_rng(seed)
    pairs = []
    for i in range(n):
        ref = "".join("ACGT"[c] for c in rng.integers(0, 4, rflen))
        lo = int(rng.integers(0, max(rflen - rdlen, 1)))
        read = mutate(rng, ref[lo:lo + rdlen], err)
        if not read:
            read = "A"
        pairs.append((read, ref))

    inp = "".join(f"{rd} {rf}\n" for rd, rf in pairs)
    r = subprocess.run([str(ssw_ref)], input=inp, capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0
    want = [ln.split() for ln in r.stdout.splitlines()]

    al = SswAligner()
    got = al.align_batch([rd for rd, _ in pairs],
                         [rf for _, rf in pairs])
    for i, (w, g) in enumerate(zip(want, got)):
        ours = [g.score1, g.score2, g.ref_begin1, g.ref_end1,
                g.read_begin1, g.read_end1, g.ref_end2]
        theirs = [int(x) for x in w[:7]]
        cig_ref = w[7] if len(w) > 7 else ""
        assert ours == theirs, (i, pairs[i], ours, theirs)
        assert g.cigar_string() == cig_ref, (i, pairs[i],
                                             g.cigar_string(), cig_ref)
