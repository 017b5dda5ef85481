"""Banded affine-gap Smith-Waterman (BWA-MEM2 seed extension) — TPU-native.

Reference semantics: the int16 vector path the benchmark actually runs
(bsw/src/bandedSWA.cpp: getScores16 :3478, smithWatermanBatchWrapper16
:3510-3760, smithWaterman128_16 :3766-4150, MAIN_CODE16 :3396), including
its adaptive per-lane head/tail band, group-shared beg/end narrowing,
z-drop (the vector variant WITHOUT the e_del/e_ins scaling of the scalar
code), per-row early exits, and the SORT_PAIRS=1 batch pipeline
(counting-sort by reference length, groups of SIMD width, re-sort by id).

TPU-first design:
  * the reference vectorizes 8 pairs across SSE lanes and loops serially
    over DP cells; here a whole (groups, 8, columns) tensor advances one
    row per step — every op is a full VPU tile, and the only sequential
    dimension is the row loop.
  * the in-row E-gap chain e' = max(m - oe_ins, e - e_ins) is a max-plus
    prefix scan; it is computed for all columns at once with
    `lax.associative_scan` on m + j*e_ins (log-depth instead of serial).
  * the reference's early-break scalar loops (band trimming, head/tail
    zero-run scans, beg/end narrowing) become masked reductions (argmin /
    argmax of zero-runs), preserving their exact break semantics.
  * groups stay 8 lanes wide (SIMD_WIDTH16) so the group-shared band
    state matches the reference bit-for-bit.

int16 wraparound never occurs for valid inputs (scores < 2^15), so the
kernel computes in int32, the TPU's native integer width.
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from genarchbench_tpu.core.roi import ROITimer
from genarchbench_tpu.io.bsw_io import BswPairs, read_bsw_pairs, DUMMY1, DUMMY2
from genarchbench_tpu.sharding.batching import next_pow2

LANES = 8            # SIMD_WIDTH16 of the reference SSE2 build
NEG = -(1 << 28)
# 4-bit on-wire base codes: bases 0-3, DUMMY1/DUMMY2 ref/query padding
# (standing in for the reference's 99/100 — only their mutual inequality
# matters), 15 = ambiguous (reference 0xFFFF).  Two bases pack per byte
# so a batch crosses the host->device link at 8x fewer bytes than i32;
# the kernel unpacks to int32 on device.
NIB_DUMMY1 = 13
NIB_DUMMY2 = 14
AMBIG_SENTINEL = 15


def _unpack_nibbles(p):
    """(G, L, N//2) uint8 -> (G, L, N) int32, low nibble first."""
    p = p.astype(jnp.int32)
    lo = p & 15
    hi = (p >> 4) & 15
    G, L, H = p.shape
    return jnp.stack([lo, hi], axis=-1).reshape(G, L, 2 * H)


def _pack_nibbles(a):
    """(..., N) uint8 nibble codes -> (..., N//2) uint8."""
    return (a[..., 0::2] | (a[..., 1::2] << 4)).astype(np.uint8)


def fill_scmat(match: int, mismatch: int, ambig: int):
    """Default BWA scoring (main_banded.cpp:95-102): +match / -mismatch,
    ambig for any pairing with an ambiguous base."""
    return match, -mismatch, ambig


def _prefix_max(x):
    """Inclusive prefix max along the last axis via log-doubling shifts
    (== lax.associative_scan(jnp.maximum): max is associative and
    idempotent, so the combination order cannot change the result).
    Written with concat+slice so it lowers both in XLA and in Mosaic."""
    n = x.shape[-1]
    sh = 1
    while sh < n:
        pad = jnp.full(x.shape[:-1] + (sh,), NEG, x.dtype)
        shifted = jnp.concatenate([pad, x[..., :-sh]], axis=-1)
        x = jnp.maximum(x, shifted)
        sh *= 2
    return x


def _any_axis1(m):
    """any/all over the lane axis, via int32: Mosaic cannot truncate the
    i8-typed bool reductions jnp.any/jnp.all lower to back to i1."""
    return jnp.max(m.astype(jnp.int32), axis=1, keepdims=True) != 0


def _all_axis1(m):
    return jnp.min(m.astype(jnp.int32), axis=1, keepdims=True) != 0


def _row_factory(seq1_col, seq2, len1, len2, h0, myband,
                 match, mismatch, ambig,
                 o_del, e_del, o_ins, e_ins, zdrop, w):
    """Build (initial_state, row_step) for the banded-SW row loop.
    Shared by the XLA path (_bsw_device) and the Pallas kernel
    (bsw_pallas.py) so their semantics are one implementation.

    ALL arrays are rank-3 — lane scalars (G, L, 1), group scalars
    (G, 1, 1), row state (G, L, C2) — with keepdims reductions and
    broadcasts only, never rank-changing reshapes: Mosaic's layout
    inference rejects 1-D->3-D shape casts but handles same-rank
    broadcasts and multi_reductions natively.

    Inputs: seq2 (G, L, C2); len1/len2/h0/myband (G, L, 1) int32.
    seq1_col: callable i -> (G, L, 1) column of the reference
    sequences — an accessor because Mosaic cannot dynamic-slice loaded
    VALUES; the Pallas kernel indexes its ref, the XLA path slices the
    array."""
    G, L, C2 = seq2.shape
    i32 = jnp.int32
    oe_ins = o_ins + e_ins
    oe_del = o_del + e_del

    cols = lax.broadcasted_iota(i32, (1, 1, C2), 2)           # column index
    nrow = jnp.max(len1, axis=1, keepdims=True)               # (G,1,1)
    ncol = jnp.max(len2, axis=1, keepdims=True)               # (G,1,1)
    qlen = len2                                               # (G,L,1)
    mlen = jnp.minimum(qlen + myband, len1)

    # H row-0 boundary (wrapper :3680-3694): H[0]=h0, H[k]=max(h0-oe_ins-(k-1)e_ins,0)
    H_h = jnp.where(cols == 0, h0,
                    jnp.maximum(h0 - oe_ins - (cols - 1) * e_ins, 0))
    H_h = jnp.where(cols < ncol, H_h, 0).astype(i32)
    H_h = jnp.broadcast_to(H_h, (G, L, C2))
    F = jnp.zeros((G, L, C2), i32)

    zeros_l = jnp.zeros((G, L, 1), i32)
    state = dict(
        H_h=H_h, F=F,
        head=zeros_l, tail=qlen.astype(i32),
        exit0=jnp.ones((G, L, 1), i32),   # 0/1; Mosaic dislikes carried i1
        maxScore=h0.astype(i32),
        x=zeros_l, y=zeros_l,
        max_off=zeros_l,
        gscore=jnp.full((G, L, 1), -1, i32),
        max_ie=zeros_l,
        beg=jnp.zeros((G, 1, 1), i32), end=ncol.astype(i32),
        nbeg=jnp.zeros((G, 1, 1), i32), nend=ncol.astype(i32),
        alive=jnp.ones((G, 1, 1), i32),
    )

    def row(i, st):
        H_h, F = st["H_h"], st["F"]
        head, tail = st["head"], st["tail"]
        exit0i = st["exit0"]                                   # (G,L,1) 0/1
        act_g = (st["alive"] != 0) & (i < nrow)                # (G,1,1)

        # group-shared banding (kernel :3846-3852)
        beg = jnp.maximum(st["nbeg"], i - w)                   # (G,1,1)
        end = jnp.minimum(jnp.minimum(st["nend"], i + w + 1), ncol)

        # per-lane adaptive band head/tail (kernel :3866-3876)
        phead, ptail = head, tail
        head = jnp.where(act_g, jnp.maximum(head, i - myband), head)
        tail = jnp.where(act_g, jnp.minimum(jnp.minimum(tail, i + 1 + myband), qlen), tail)

        # band-trim zeroing loop (kernel :3878-3902): runs only if any lane
        # changed, over l in [beg, min(end, max(head))), zeroing cells with
        # head>l or l>=tail
        changed = _any_axis1((head != phead) | (tail != ptail))  # (G,1,1)
        maxhead = jnp.max(head, axis=1, keepdims=True)         # (G,1,1)
        zrange = (cols >= beg) & (cols < jnp.minimum(end, maxhead))
        zcond = zrange & ((head > cols) | (cols + 1 > tail))
        zcond = zcond & changed & act_g
        H_h = jnp.where(zcond, 0, H_h)
        F = jnp.where(zcond, 0, F)

        # per-lane exit conditions (kernel :3906-3915)
        dead = (i + 1 > mlen) | (tail == head) | (head > tail)
        # bool-valued selects lower to i8 trunci, which Mosaic rejects:
        # exit0 stays int32 0/1 and conditions fold into the predicate
        exit0i = jnp.where(act_g & dead, 0, exit0i)

        # ---- whole-row DP (kernel j-loop :3921-3993 vectorized) ----
        s1 = seq1_col(i)                                       # (G,L,1)
        s2 = seq2
        sbt = jnp.where(s1 == s2, match, mismatch)
        sbt = jnp.where(jnp.maximum(s1, s2) == AMBIG_SENTINEL, ambig, sbt)
        h00 = H_h
        m11 = jnp.where(h00 == 0, 0, h00 + sbt)

        jmask = (cols >= beg) & (cols < end)
        # E chain: e' = max(max(m - oe_ins, 0), e - e_ins), e(beg) = 0
        A = jnp.maximum(m11 - oe_ins, 0)
        B = jnp.where(jmask, A + cols * e_ins, NEG)
        S_inc = _prefix_max(B)
        S_exc = jnp.concatenate(
            [jnp.full((G, L, 1), NEG, i32), S_inc[:, :, :-1]], axis=2)
        e11 = jnp.where(cols == beg, 0, S_exc - (cols - 1) * e_ins)
        e11 = jnp.maximum(e11, NEG // 2)

        f11 = F
        h11 = jnp.maximum(jnp.maximum(m11, e11), f11)
        f21 = jnp.maximum(jnp.maximum(m11 - oe_del, 0), f11 - e_del)

        # masked stores: H_h[j] = h11[j-1] (boundary h10 at j=beg), zeroed
        # outside [head, tail]; F[j] = f21 with the same zeroing
        h10_init = jnp.where(beg == 0,
                             jnp.maximum(h0 - o_del - (i + 1) * e_del, 0),
                             0).astype(i32)                    # (G,L,1)
        sh = jnp.concatenate([jnp.zeros((G, L, 1), i32), h11[:, :, :-1]], axis=2)
        sh = jnp.where(cols == beg, h10_init, sh)
        zstore = (head > cols) | (cols > tail)
        wmask = jmask & act_g
        H_h = jnp.where(wmask, jnp.where(zstore, 0, sh), H_h)
        F = jnp.where(wmask, jnp.where(zstore, 0, f21), F)
        # trailing store at j=end (kernel :3994-3995): raw h11[end-1] (or the
        # boundary value if the band was empty), F[end]=0.  The single-
        # element pick is a masked max (exact), not a gather — gathers
        # don't lower in Mosaic and are slow on the VPU anyway.
        idx_end = jnp.maximum(end - 1, 0)                      # (G,1,1)
        h_endval = jnp.max(jnp.where(cols == idx_end, h11, NEG),
                           axis=2, keepdims=True)              # (G,L,1)
        h_endval = jnp.where(end > beg, h_endval, h10_init)
        endmask = (cols == end) & act_g
        H_h = jnp.where(endmask, h_endval, H_h)
        F = jnp.where(endmask, 0, F)

        # row max + its (last) column, restricted to j < tail (kernel :3958-3969)
        mmask = jmask & (cols < tail)
        hm = jnp.where(mmask, h11, NEG)
        maxRS = jnp.maximum(jnp.max(hm, axis=2, keepdims=True), 0)   # (G,L,1)
        qual = mmask & (h11 == maxRS)
        y1 = jnp.max(jnp.where(qual, cols + 1, 0), axis=2, keepdims=True)

        # gscore at each lane's last query column (kernel :3975-3993);
        # masked-max single-element pick, as above
        qidx = jnp.maximum(qlen - 1, 0)                        # (G,L,1)
        h11q = jnp.max(jnp.where(cols == qidx, h11, NEG),
                       axis=2, keepdims=True)
        gupd = act_g & (qlen - 1 >= beg) & (qlen - 1 < end) \
            & (exit0i != 0) & (qlen <= tail)
        gscore, max_ie = st["gscore"], st["max_ie"]
        max_ie = jnp.where(gupd & ~(gscore > h11q), i + 1, max_ie)
        gscore = jnp.where(gupd, jnp.maximum(gscore, h11q), gscore)

        # whole-group zero row => break before the post-row updates
        # (kernel :3999-4003)
        allzero = _all_axis1(maxRS == 0) & act_g           # (G,1,1)
        alive = (st["alive"] != 0) & ~allzero
        post = act_g & ~allzero                                # (G,1,1)

        exit0i = jnp.where(post & (maxRS == 0), 0, exit0i)
        bmax = st["maxScore"]
        maxScore = jnp.where(post & (exit0i != 0),
                             jnp.maximum(bmax, maxRS), bmax)
        inc = post & (maxScore > bmax)
        x = jnp.where(inc, i + 1, st["x"])
        y = jnp.where(inc, y1, st["y"])
        off = jnp.abs(y1 - (i + 1))
        max_off = jnp.where(inc, jnp.maximum(st["max_off"], off), st["max_off"])
        # z-drop, vector variant (ZSCORE16 :3380-3394: no gap-extension scaling)
        tmpi = (i + 1) - x
        tmpj = y1 - y
        zd = (maxScore - maxRS) - jnp.abs(tmpi - tmpj)
        exit0i = jnp.where(post & (zd > zdrop), 0, exit0i)

        # ---- band narrowing from the zero structure of F|H ----
        FH0 = (F == 0) & (H_h == 0)                            # (G,L,C2)
        allz = _all_axis1(FH0)                             # (G,1,C2)
        # nbeg: leading all-zero run over [beg, end) (kernel :4015-4027)
        rng = (cols >= beg) & (cols < end)
        first_not = jnp.min(jnp.where(rng & ~allz, cols, 1 << 28),
                            axis=2, keepdims=True)             # (G,1,1)
        c_lead = jnp.minimum(first_not, end) - beg
        nbeg = jnp.where(post & (c_lead >= 1), beg + c_lead - 1, st["nbeg"])
        # nend: first non-all-zero from the top of [beg, end] (kernel :4029-4040)
        rng2 = (cols >= beg) & (cols <= end)
        l_stop = jnp.max(jnp.where(rng2 & ~allz, cols, -1),
                         axis=2, keepdims=True)
        l_stop = jnp.maximum(l_stop, beg - 1)
        nend = jnp.where(post, jnp.minimum(l_stop + 2, ncol), st["nend"])
        # head: per-lane leading zero-run among active lanes (kernel :4044-4070)
        zeroact = FH0 & (exit0i != 0)
        fnl = jnp.min(jnp.where(rng & ~zeroact, cols, 1 << 28),
                      axis=2, keepdims=True)                   # (G,L,1)
        run = jnp.minimum(fnl, end) - beg
        head = jnp.where(post & (run >= 1), beg + run, head)
        # tail: per-lane trailing zero-run over [beg, end] (kernel :4074-4110)
        lnq = jnp.max(jnp.where(rng2 & ~zeroact, cols, -1),
                      axis=2, keepdims=True)
        lnq = jnp.maximum(lnq, beg - 1)
        run5 = end - lnq
        index = jnp.where(run5 >= 1, lnq, tail)
        tail = jnp.where(post, jnp.minimum(index + 2, qlen), tail)

        return dict(H_h=H_h, F=F, head=head, tail=tail,
                    exit0=exit0i,
                    maxScore=maxScore, x=x, y=y, max_off=max_off,
                    gscore=gscore, max_ie=max_ie,
                    beg=beg, end=end, nbeg=nbeg, nend=nend,
                    alive=alive.astype(i32))

    return state, row


@partial(jax.jit, static_argnames=(
    "R", "match", "mismatch", "ambig",
    "o_del", "e_del", "o_ins", "e_ins", "zdrop", "w"))
def _bsw_device(seq1, seq2, len1, len2, h0, myband,
                R, match, mismatch, ambig,
                o_del, e_del, o_ins, e_ins, zdrop, w):
    """Batched banded SW. seq1 (G,L,R//2), seq2 (G,L,C2//2) uint8
    nibble-packed (DUMMY-padded, ambig = 15); len1/len2/h0/myband (G,L)
    int32.  C2 is sized a multiple of 128 (exact VPU lane tiles) and must
    exceed every len2.
    Returns (score, tle, qle, max_off, gscore, gtle) each (G,L) int32."""
    seq1 = _unpack_nibbles(seq1)
    seq2 = _unpack_nibbles(seq2)
    state, row = _row_factory(
        lambda i: lax.dynamic_slice_in_dim(seq1, i, 1, axis=2),
        seq2, len1[:, :, None], len2[:, :, None],
        h0[:, :, None], myband[:, :, None],
        match, mismatch, ambig,
        o_del, e_del, o_ins, e_ins, zdrop, w)
    st = lax.fori_loop(0, R, row, state)
    return (st["maxScore"][:, :, 0], st["x"][:, :, 0], st["y"][:, :, 0],
            st["max_off"][:, :, 0], st["gscore"][:, :, 0],
            st["max_ie"][:, :, 0])


def _myband(len2: np.ndarray, match: int, end_bonus: int,
            o_ins: int, e_ins: int, o_del: int, e_del: int, w: int) -> np.ndarray:
    """Per-pair band limit (wrapper :3696-3718, double math, int16 temps)."""
    qlen = (len2 * match).astype(np.int64)
    t1 = (qlen + (end_bonus - o_ins)).astype(np.uint16).astype(np.float64)
    mi = np.maximum((t1 / e_ins + 1.0).astype(np.int64), 1)
    band = np.minimum(w, mi)
    t2 = (qlen + (end_bonus - o_del)).astype(np.uint16).astype(np.float64)
    md = np.maximum((t2 / e_del + 1.0).astype(np.int64), 1)
    return np.minimum(band, md).astype(np.int32)


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def bsw_batch(pairs: BswPairs, batch_size: int = 512,
              match: int = 1, mismatch: int = 4, ambig: int = -1,
              o_del: int = 6, e_del: int = 1, o_ins: int = 6, e_ins: int = 1,
              zdrop: int = 100, w: int = 100, end_bonus: int = 5,
              mesh=None, backend: str = "auto",
              lanes: int = LANES) -> np.ndarray:
    """Scores for all pairs in input order, replicating the reference's
    batch -> sort-by-len1 -> groups-of-8 pipeline.

    `lanes` is the reference's SIMD group width, which determines group
    membership and hence the group-shared band: SIMD_WIDTH16 = 8 for
    the int16 path (default), SIMD_WIDTH8 = 16 for the int8 path
    (bandedSWA.h:79-80, SSE build) — see run()'s -i8 flag.

    Group membership (which determines the group-shared band, hence the
    scores) is formed per `batch_size` slice exactly like the reference's
    counting sort.  Device execution then departs from the reference: ALL
    groups across ALL batches that share a padded (R, C2) shape bucket run
    in ONE device call, so each sequential DP row advances tens of
    thousands of lanes at once instead of 8."""
    n = len(pairs)
    _, mis, amb = fill_scmat(match, mismatch, ambig)
    scores = np.zeros(n, np.int32)
    if batch_size <= 0:
        batch_size = ((n + lanes - 1) // lanes) * lanes

    all_len1 = np.fromiter((len(r) for r in pairs.refs), np.int32, n)
    all_len2 = np.fromiter((len(q) for q in pairs.quers), np.int32, n)

    # bucket key -> list of (lane -> source pair index, -1 pad) group rows
    buckets: defaultdict = defaultdict(list)
    for b0 in range(0, n, batch_size):
        idx = np.arange(b0, min(b0 + batch_size, n))
        nb = len(idx)
        pad = _round_up(nb, lanes) - nb
        len1p = np.concatenate([all_len1[idx], np.zeros(pad, np.int32)])
        len2p = np.concatenate([all_len2[idx], np.zeros(pad, np.int32)])
        srcp = np.concatenate([idx, np.full(pad, -1)])
        order = np.argsort(len1p, kind="stable")                # counting sort
        for members in order.reshape(-1, lanes):
            r = _round_up(max(int(len1p[members].max()), 1), 64)
            c2 = _round_up(int(len2p[members].max()) + 1, 128)
            buckets[(r, c2)].append(srcp[members])

    myband_all = _myband(all_len2, match, end_bonus, o_ins, e_ins,
                         o_del, e_del, w)

    from genarchbench_tpu.sharding.mesh import pad_batch, shard_args

    # flat nibble-coded pools for vectorized gather fills (one C-speed
    # concatenate instead of a Python loop over every pair)
    flat_r = np.minimum(np.concatenate(pairs.refs), AMBIG_SENTINEL
                        ).astype(np.uint8) if n else np.zeros(0, np.uint8)
    flat_q = np.minimum(np.concatenate(pairs.quers), AMBIG_SENTINEL
                        ).astype(np.uint8) if n else np.zeros(0, np.uint8)
    off_r = np.zeros(n + 1, np.int64)
    off_q = np.zeros(n + 1, np.int64)
    np.cumsum(all_len1, out=off_r[1:])
    np.cumsum(all_len2, out=off_q[1:])
    flat_r = np.concatenate([flat_r, np.zeros(1, np.uint8)])   # clamp slot
    flat_q = np.concatenate([flat_q, np.zeros(1, np.uint8)])

    from genarchbench_tpu.core.backend import pallas_interpret

    def fill(flat, off, src, safe, valid, lens, width, dummy):
        from genarchbench_tpu import native
        out = native.nib_fill_pack(flat, off, src.ravel().astype(np.int64),
                                   lens.ravel(), width, dummy)
        if out is not None:
            return out.reshape(src.shape[0], lanes, width // 2)
        idx = off[safe][:, :, None] + np.arange(width)[None, None, :]
        vals = flat[np.minimum(idx, len(flat) - 1)]
        inb = valid[:, :, None] & (np.arange(width)[None, None, :]
                                   < lens[:, :, None])
        return _pack_nibbles(np.where(inb, vals, dummy).astype(np.uint8))

    # coalesce shape buckets into ONE device call when the padding waste
    # is bounded: through the remote-TPU tunnel, per-call latency dwarfs
    # the (sub-ms) DP compute, so fewer/bigger dispatches win
    if len(buckets) > 1:
        true_cells = sum(len(rows) * R * C2
                         for (R, C2), rows in buckets.items())
        Rmax = max(R for R, _ in buckets)
        C2max = max(C2 for _, C2 in buckets)
        gtot = sum(len(rows) for rows in buckets.values())
        if gtot * Rmax * C2max <= 4 * true_cells:
            merged = []
            for key in sorted(buckets):
                merged.extend(buckets[key])
            buckets = {(Rmax, C2max): merged}

    pending = []
    for (R, C2), rows in sorted(buckets.items()):
        src = np.stack(rows)                                   # (G, LANES)
        Gp = pad_batch(src.shape[0], mesh)                     # data-parallel
        if Gp > src.shape[0]:                                  # pad groups
            src = np.concatenate(
                [src, np.full((Gp - src.shape[0], lanes), -1)])
        valid = src >= 0
        safe = np.where(valid, src, 0)
        L1 = np.where(valid, all_len1[safe], 0).astype(np.int32)
        L2 = np.where(valid, all_len2[safe], 0).astype(np.int32)
        H0 = np.where(valid, pairs.h0[safe], 0).astype(np.int32)
        MB = np.where(valid, myband_all[safe],
                      _myband(np.zeros(1, np.int32), match, end_bonus,
                              o_ins, e_ins, o_del, e_del, w)[0]).astype(np.int32)
        s1 = fill(flat_r, off_r, src, safe, valid, L1, R, NIB_DUMMY1)
        s2 = fill(flat_q, off_q, src, safe, valid, L2, C2, NIB_DUMMY2)
        # Pallas on explicit opt-in (GENARCH_BACKEND=pallas); the XLA
        # formulation stays the measured-fastest default on this
        # hardware (see verify skill notes), mesh runs always XLA
        from genarchbench_tpu.core.backend import use_pallas
        if (backend == "pallas"
                or os.environ.get("GENARCH_BACKEND") == "pallas") \
                and mesh is None:
            from genarchbench_tpu.kernels.bsw_pallas import _bsw_pallas
            out = _bsw_pallas(s1, s2, L1, L2, H0, MB, R=R,
                              match=match, mismatch=mis, ambig=amb,
                              o_del=o_del, e_del=e_del, o_ins=o_ins,
                              e_ins=e_ins, zdrop=zdrop, w=w,
                              interpret=pallas_interpret())
        else:
            s1, s2, L1, L2, H0, MB = shard_args(mesh, s1, s2, L1, L2,
                                                H0, MB)
            out = _bsw_device(s1, s2, L1, L2, H0, MB, R=R,
                              match=match, mismatch=mis, ambig=amb,
                              o_del=o_del, e_del=e_del, o_ins=o_ins,
                              e_ins=e_ins, zdrop=zdrop, w=w)
        # collect later: keeping every bucket's call in flight lets the
        # runtime overlap host->device transfers with compute
        pending.append((out, src, valid))
    for out, src, valid in pending:
        sc = np.asarray(out[0]).ravel()
        flat_src = src.ravel()
        scores[flat_src[valid.ravel()]] = sc[valid.ravel()]
    return scores


def cell_updates(pairs: BswPairs, w: int = 100) -> int:
    """Banded DP cells (2w+1 band, like the reference's numCellsComputed)."""
    return sum(min(2 * w + 1, len(q)) * len(r)
               for r, q in zip(pairs.refs, pairs.quers))


def run(argv: Sequence[str]) -> int:
    """CLI compatible with the reference bsw binary (main_banded.cpp:222):
    -pairs file [-t n] [-b batch] [-match/-mismatch/-gapo/-gape/-ambig/-h0]."""
    import argparse
    p = argparse.ArgumentParser(prog="bsw", prefix_chars="-")
    p.add_argument("-pairs", dest="pairs", required=True)
    p.add_argument("-t", dest="threads", type=int, default=1)
    p.add_argument("-b", dest="batch", type=int, default=0)
    p.add_argument("-match", type=int, default=1)
    p.add_argument("-mismatch", type=int, default=4)
    p.add_argument("-gapo", type=int, default=6)
    p.add_argument("-gape", type=int, default=1)
    p.add_argument("-ambig", type=int, default=-1)
    p.add_argument("-i8", dest="i8", action="store_true",
                   help="int8 kernel semantics (getScores8, "
                        "bandedSWA.cpp:428+): SIMD_WIDTH8=16-lane "
                        "grouping; inputs must fit the reference's "
                        "8-bit row/column indices")
    args = p.parse_args(argv)

    from genarchbench_tpu.sharding.mesh import data_mesh
    pairs = read_bsw_pairs(args.pairs)
    lanes = LANES
    if args.i8:
        # the reference int8 kernel walks rows/cols with int8_t
        # counters and uint8 lengths (smithWaterman128_8,
        # bandedSWA.cpp:5649+): sequences beyond 127 bases or scores
        # reaching 128 would wrap there — refuse such inputs rather
        # than diverge silently
        lmax = max(max((len(r) for r in pairs.refs), default=0),
                   max((len(q) for q in pairs.quers), default=0))
        smax = max((int(h) for h in pairs.h0), default=0) \
            + args.match * lmax
        if lmax > 127 or smax > 127:
            raise ValueError(
                f"-i8: input exceeds the int8 kernel's range "
                f"(max len {lmax}, score bound {smax}; both must be "
                "<= 127)")
        lanes = 16                     # SIMD_WIDTH8, SSE build
    print(f"Number of input pairs: {len(pairs)}")
    roi = ROITimer("bsw", "Overall SW cycles = 0, {t:.2f} s")
    with roi:
        scores = bsw_batch(pairs, batch_size=args.batch,
                           match=args.match, mismatch=args.mismatch,
                           ambig=args.ambig, o_del=args.gapo, e_del=args.gape,
                           o_ins=args.gapo, e_ins=args.gape, mesh=data_mesh(),
                           lanes=lanes)
        roi.sync(scores)
    for i, s in enumerate(scores):
        print(f"[{i}] score={s}", file=sys.stderr)
    roi.report(file=sys.stdout)
    cells = cell_updates(pairs)
    if roi.elapsed > 0:
        print(f"numCellsComputed = {cells} "
              f"({cells / roi.elapsed:.3e} cells/s)")
    print(f"Total Pairs processed: {len(pairs)}")
    return 0


if __name__ == "__main__":
    sys.exit(run(sys.argv[1:]))
