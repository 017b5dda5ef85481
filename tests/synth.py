"""Synthetic input generators mimicking the reference dataset formats."""

from __future__ import annotations

import numpy as np


def gen_chain_input(rng: np.random.Generator, n_records: int = 20,
                    max_anchors: int = 400, n_segs: int = 1,
                    rid_base: int = 0) -> str:
    """Generate a chain-format text input (minimap2-like sorted anchors)."""
    out = []
    for _ in range(n_records):
        n = int(rng.integers(1, max_anchors))
        avg_qspan = float(np.float32(rng.uniform(10.0, 40.0)))
        mdx, mdy, bw = 5000, 5000, 500
        # anchors sorted by x: random walk of reference positions
        rid = rid_base + int(rng.integers(0, 3))
        steps = rng.integers(0, 200, size=n).astype(np.uint64)
        pos = np.cumsum(steps) + 100
        x = (np.uint64(rid) << np.uint64(32)) | pos.astype(np.uint64)
        qpos = np.cumsum(rng.integers(0, 150, size=n)).astype(np.uint64) + 50
        span = np.uint64(15)
        sid = rng.integers(0, n_segs, size=n).astype(np.uint64)
        y = (sid << np.uint64(48)) | (span << np.uint64(32)) | (qpos & np.uint64(0xFFFFFFFF))
        out.append(f"{n} {avg_qspan:.6f} {mdx} {mdy} {bw} {n_segs}\n")
        out.extend(f"{int(xi)} {int(yi)}\n" for xi, yi in zip(x, y))
        out.append("EOR\n")
    return "".join(out)


DNA = np.array(list("ACGT"))


def random_dna(rng: np.random.Generator, length: int) -> str:
    return "".join(DNA[rng.integers(0, 4, size=length)])


def mutate(rng: np.random.Generator, seq: str, error_rate: float) -> str:
    """Introduce substitutions/insertions/deletions at error_rate."""
    out = []
    for ch in seq:
        r = rng.random()
        if r < error_rate / 3:
            out.append("ACGT"[rng.integers(0, 4)])        # substitution
        elif r < 2 * error_rate / 3:
            out.append(ch + "ACGT"[rng.integers(0, 4)])   # insertion
        elif r < error_rate:
            pass                                           # deletion
        else:
            out.append(ch)
    return "".join(out) or "A"


def gen_seqpair_dataset(rng: np.random.Generator, n_pairs: int = 100,
                        length: int = 100, error_rate: float = 0.05) -> str:
    """bpm/wfa '>pattern\\n<text' dataset format (wfa/README.md:28-41)."""
    out = []
    for _ in range(n_pairs):
        a = random_dna(rng, length)
        b = mutate(rng, a, error_rate)
        out.append(f">{a}\n<{b}\n")
    return "".join(out)


def gen_bsw_input(rng: np.random.Generator, n_pairs: int = 128,
                  ref_len: int = 200, query_len: int = 100,
                  error_rate: float = 0.1) -> str:
    """bsw 3-line format: h0 seed score, ref seq, query seq; bases '0'..'3'
    (bsw/src/main_banded.cpp:154-206)."""
    out = []
    for _ in range(n_pairs):
        h0 = int(rng.integers(10, 50))
        rl = int(rng.integers(query_len, ref_len))
        ql = int(rng.integers(10, query_len))
        ref = rng.integers(0, 4, size=rl)
        query = ref[:ql].copy()
        nmut = max(1, int(ql * error_rate))
        idx = rng.integers(0, ql, size=nmut)
        query[idx] = rng.integers(0, 4, size=nmut)
        out.append(f"{h0}\n")
        out.append("".join(str(c) for c in ref) + "\n")
        out.append("".join(str(c) for c in query) + "\n")
    return "".join(out)
