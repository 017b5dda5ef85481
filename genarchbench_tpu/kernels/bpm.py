"""Bit-Parallel Myers (BPM) edit distance — TPU-native batched kernel.

Reference semantics: bpm/edit/edit_bpm.c (`BPM_ADVANCE_BLOCK` :47-67,
`edit_bpm_compute_matrix` :190-270): Myers' 1999 blocked bit-vector
recurrence; the driver (tools/align_benchmark.c:444) reports the global
edit distance of pattern (longer seq) vs text per pair.

TPU-first design:
  * 32-bit machine words instead of the reference's uint64 (TPUs are
    int32-native); word size only changes blocking, never the distance.
  * pairs are batched across VPU lanes: every bit-operation of the
    advance-block recurrence is a (batch,)-wide uint32 op, the word loop
    (W = ceil(plen/32), static per bucket) is unrolled, and the text loop
    is a `lax.fori_loop`.
  * Eq lookup (PEQ[text_char]) is a 4-way select instead of a gather.
  * no score cutoff: the driver calls with max_distance = pattern_length
    (benchmark/benchmark_edit.c:44-46) so the reference's block cutoff is
    purely a CPU work-saving device; dense blocks give identical scores.

Only the bit at each pair's last pattern row (top_mask) feeds the score,
so per-pair pattern lengths inside one bucket are handled by masks.
"""

from __future__ import annotations

import sys
from collections import defaultdict
from functools import partial
from typing import List, Sequence

import jax
from jax import lax
import jax.numpy as jnp
import numpy as np

from genarchbench_tpu.core.roi import ROITimer
from genarchbench_tpu.io.seqpair_io import SeqPairs, read_seqpairs
from genarchbench_tpu.sharding.batching import next_pow2

W32 = 32
MSB = np.uint32(0x80000000)


def compile_peq(patterns: Sequence[np.ndarray], W: int) -> np.ndarray:
    """Host-side PEQ build: (B, W, 4) uint32 match-bit masks.

    Padding rows (>= plen) are set for every character, mirroring
    edit_bpm_pattern_compile (edit_bpm.c:108-116); they cannot influence
    the score bit (carries only propagate upward) but keep parity.
    """
    B = len(patterns)
    P = W * W32
    codes = np.full((B, P), 4, np.uint8)
    for i, p in enumerate(patterns):
        codes[i, :len(p)] = p
    pos = np.arange(P)
    bits = (np.uint32(1) << (pos % W32).astype(np.uint32))
    onehot = (codes[:, :, None] == np.arange(4, dtype=np.uint8)) | (codes[:, :, None] == 4)
    contrib = np.where(onehot, bits[None, :, None], np.uint32(0))
    return np.bitwise_or.reduce(
        contrib.reshape(B, W, W32, 4), axis=2).astype(np.uint32)


@partial(jax.jit, static_argnames=("W",))
def _bpm_distance_device(peq, plen, text, tlen, W):
    """Batched Myers distance. peq (B,W,4) u32; text (B,T) i32; returns (B,) i32."""
    B, T = text.shape
    u32 = jnp.uint32
    Pv0 = jnp.full((B, W), 0xFFFFFFFF, u32)
    Mv0 = jnp.zeros((B, W), u32)
    top_mask = (jnp.ones(B, u32) << ((plen - 1) % W32).astype(u32))

    def step(t, carry):
        Pv, Mv, score = carry
        tc = text[:, t]
        valid = t < tlen
        # Eq via 4-way select (VPU-friendly; avoids per-lane gather)
        def eq_of(w):
            cols = peq[:, w, :]
            return jnp.where(tc == 0, cols[:, 0],
                   jnp.where(tc == 1, cols[:, 1],
                   jnp.where(tc == 2, cols[:, 2],
                   jnp.where(tc == 3, cols[:, 3], jnp.zeros(B, u32)))))

        PHin = jnp.ones(B, u32)
        MHin = jnp.zeros(B, u32)
        newPv, newMv = [], []
        delta = None
        for w in range(W):
            Eq = eq_of(w)
            pv, mv = Pv[:, w], Mv[:, w]
            Xv = Eq | mv
            _Eq = Eq | MHin
            Xh = (((_Eq & pv) + pv) ^ pv) | _Eq
            Ph = mv | ~(Xh | pv)
            Mh = pv & Xh
            mask = top_mask if w == W - 1 else MSB
            PHout = ((Ph & mask) != 0)
            MHout = ((Mh & mask) != 0)
            if w == W - 1:
                delta = PHout.astype(jnp.int32) - MHout.astype(jnp.int32)
            Ph = (Ph << 1) | PHin
            Mh = (Mh << 1) | MHin
            newPv.append(Mh | ~(Xv | Ph))
            newMv.append(Ph & Xv)
            PHin = PHout.astype(u32)
            MHin = MHout.astype(u32)
        Pv = jnp.stack(newPv, axis=1)
        Mv = jnp.stack(newMv, axis=1)
        score = score + jnp.where(valid, delta, 0)
        return (Pv, Mv, score)

    _, _, score = jax.lax.fori_loop(0, T, step, (Pv0, Mv0, plen.astype(jnp.int32)))
    return score


def _use_pallas(backend: str) -> bool:
    from genarchbench_tpu.core.backend import use_pallas
    return use_pallas(backend)


def bpm_batch(pairs: SeqPairs, max_batch: int = 8192,
              mesh=None, backend: str = "auto") -> np.ndarray:
    """Edit distance for every pair; returns (n,) int32 in input order.
    With a mesh, pairs shard data-parallel along the batch axis (the
    reference's static-interleaved OMP distribution,
    bpm/tools/align_benchmark.c:169-204).  On TPU the inner Myers
    recurrence runs as a Pallas kernel (bpm_pallas.py) with loop state
    VMEM-resident; `backend` ("auto"|"pallas"|"xla", or env
    GENARCH_BACKEND) overrides."""
    from genarchbench_tpu.sharding.mesh import mesh_size, pad_batch, shard_args

    use_pallas = _use_pallas(backend) and mesh_size(mesh) == 1
    n = len(pairs)
    out = np.zeros(n, np.int32)
    # bucket by (word count, padded text length)
    buckets = defaultdict(list)
    for i in range(n):
        W = max(1, -(-len(pairs.patterns[i]) // W32))
        T = next_pow2(max(len(pairs.texts[i]), 1), 16)
        buckets[(W, T)].append(i)
    for (W, T), idxs in sorted(buckets.items()):
        for lo in range(0, len(idxs), max_batch):
            chunk = idxs[lo:lo + max_batch]
            B = pad_batch(next_pow2(len(chunk), 8), mesh)
            pats = [pairs.patterns[i] for i in chunk]
            pats += [np.zeros(1, np.uint8)] * (B - len(chunk))
            peq = compile_peq(pats, W)
            plen = np.array([len(p) for p in pats], np.int32)
            text = np.zeros((B, T), np.int32)
            tlen = np.zeros(B, np.int32)
            for b, i in enumerate(chunk):
                t = pairs.texts[i]
                text[b, :len(t)] = t
                tlen[b] = len(t)
            if use_pallas:
                from genarchbench_tpu.kernels.bpm_pallas import (
                    bpm_distance_pallas)
                score = bpm_distance_pallas(
                    peq, plen, text, tlen, W,
                    interpret=jax.default_backend() != "tpu")
            else:
                peq, plen, text, tlen = shard_args(
                    mesh, peq, plen, text, tlen)
                score = np.asarray(
                    _bpm_distance_device(peq, plen, text, tlen, W))
            out[chunk] = score[:len(chunk)]
    return out


@partial(jax.jit, static_argnames=("L", "m_sc", "x_sc", "g_sc"))
def _bitpal_device(pat, txt, plen, tlen, L, m_sc, x_sc, g_sc):
    """Batched GLOBAL alignment score with linear gaps — the quantity
    BitPAL's delta-packed last-row accumulation computes
    (bitpal/bitpal.m0.x1.g1.c returns -edit distance; m1.x4.g2 the
    match=1/mismatch=-4/gap=-2 score).  Row scan over the pattern; the
    in-row chain H[i][j-1]+g closes into ONE running-max scan of
    pre[j'] - j'*g (same trick as the SSW column sweep)."""
    B = pat.shape[0]
    i32 = jnp.int32
    jidx = jnp.arange(L + 1, dtype=i32)
    NEGB = jnp.int32(-(1 << 28))
    H0 = jnp.where(jidx[None, :] <= tlen[:, None],
                   jidx[None, :] * g_sc, NEGB)

    def row(i, H):
        pb = pat[:, i][:, None]                        # (B,1)
        s = jnp.where(txt == pb, m_sc, x_sc)           # (B,L)
        diag = H[:, :-1] + s                           # -> cells j=1..L
        up = H[:, 1:] + g_sc
        pre = jnp.maximum(diag, up)
        pre0 = jnp.full((B, 1), (i + 1) * g_sc, i32)   # column 0
        pre = jnp.concatenate([pre0, pre], axis=1)     # (B, L+1)
        t = pre - jidx[None, :] * g_sc
        cm = lax.associative_scan(jnp.maximum, t, axis=1)
        Hn = cm + jidx[None, :] * g_sc
        Hn = jnp.where(jidx[None, :] <= tlen[:, None], Hn, NEGB)
        return jnp.where(i < plen[:, None], Hn, H)

    H = lax.fori_loop(0, L, row, H0)
    return jnp.take_along_axis(H, tlen[:, None], axis=1)[:, 0]


def bitpal_batch(pairs: SeqPairs, m_sc: int, x_sc: int, g_sc: int,
                 max_batch: int = 8192, mesh=None) -> np.ndarray:
    """Scores for the bitpal-edit / bitpal-scored algorithms
    (benchmark_bitpal.c:30-52), batched with length bucketing."""
    from genarchbench_tpu.sharding.mesh import pad_batch, shard_args
    n = len(pairs)
    out = np.zeros(n, np.int64)
    order = np.argsort([max(len(pairs.patterns[i]), len(pairs.texts[i]))
                        for i in range(n)], kind="stable")
    for lo in range(0, n, max_batch):
        chunk = order[lo:lo + max_batch]
        L = 1 << max(int(max(
            max(len(pairs.patterns[i]), len(pairs.texts[i]))
            for i in chunk)) - 1, 1).bit_length()
        B = pad_batch(1 << max(len(chunk) - 1, 1).bit_length(), mesh)
        pat = np.full((B, L), 254, np.int32)
        txt = np.full((B, L), 255, np.int32)
        plen = np.zeros(B, np.int32)
        tlen = np.zeros(B, np.int32)
        for b, i in enumerate(chunk):
            p_, t_ = pairs.patterns[i], pairs.texts[i]
            pat[b, :len(p_)] = p_
            txt[b, :len(t_)] = t_
            plen[b], tlen[b] = len(p_), len(t_)
        pat, txt, plen, tlen = shard_args(mesh, pat, txt, plen, tlen)
        sc = np.asarray(_bitpal_device(pat, txt, plen, tlen, L=L,
                                       m_sc=m_sc, x_sc=x_sc,
                                       g_sc=g_sc))
        out[chunk] = sc[:len(chunk)]
    return out


def cell_updates(pairs: SeqPairs) -> int:
    return sum(len(p) * len(t) for p, t in zip(pairs.patterns, pairs.texts))


def run(argv: Sequence[str]) -> int:
    """CLI compatible with the reference align_benchmark (bpm):
    -a bpm-edit -i input -o output -t threads."""
    import argparse
    p = argparse.ArgumentParser(prog="bpm")
    p.add_argument("-a", dest="algorithm", default="bpm-edit",
                   choices=["bpm-edit", "bitpal-edit", "bitpal-scored"])
    p.add_argument("-i", dest="input", required=True)
    p.add_argument("-o", dest="output", default=None)
    p.add_argument("-t", dest="threads", type=int, default=1)
    args = p.parse_args(argv)

    from genarchbench_tpu.sharding.mesh import data_mesh
    pairs = read_seqpairs(args.input, swap_longer_first=True)
    roi = ROITimer("bpm", "=> Time.Benchmark      {t:.2f} s")
    with roi:
        if args.algorithm == "bitpal-edit":
            scores = bitpal_batch(pairs, 0, -1, -1, mesh=data_mesh())
        elif args.algorithm == "bitpal-scored":
            scores = bitpal_batch(pairs, 1, -4, -2, mesh=data_mesh())
        else:
            scores = bpm_batch(pairs, mesh=data_mesh())
        roi.sync(scores)
    print("[Benchmark]", file=sys.stderr)
    print(f"=> Total.reads            {len(pairs)}", file=sys.stderr)
    roi.report()
    cells = cell_updates(pairs)
    if roi.elapsed > 0:
        print(f"=> CellUpdates            {cells} "
              f"({cells / roi.elapsed:.3e} cells/s)", file=sys.stderr)

    if args.output:
        # bpm-edit prints the NEGATED edit distance (benchmark_edit.c:49);
        # the bitpal algorithms print their scores directly
        neg = args.algorithm == "bpm-edit"
        with open(args.output, "w") as f:
            f.writelines(f"[{i}] score={-s if neg else s}\n"
                         for i, s in enumerate(scores))
    return 0


if __name__ == "__main__":
    sys.exit(run(sys.argv[1:]))
