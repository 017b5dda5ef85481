"""Striped Smith-Waterman (SSW) — the Clair3 realigner's aligner,
TPU-native.

Reference semantics: nn-variant/Clair3/preprocess/realign/ssw.c —
`ssw_align` (:762-855): forward pass finds (score1, ref_end1,
read_end1) plus the masked second-best column (:300-325); a reverse
pass over the reversed prefixes, terminated at score1, yields
(ref_begin1, read_begin1) (:820-833); `banded_sw` (:532-717) then
produces the cigar over the bounded window.  The realigner drives it
with match=4, mismatch=6, gapO=8, gapE=2 (realigner.cpp:64-73) and
maskLen = read length.

TPU-first design: the forward/reverse column sweeps run BATCHED on
device (vmap over pairs).  Per reference column the coupled H/F
recurrence is closed-form: SSW's lazy-F loop never reopens a gap from
an F-dominated cell (its own "disallow adjacent insertion then
deletion" revision, ssw.c:228), so
    F[j] = max_{j'<j} (Hpre[j'] - gapO - (j-1-j') * gapE)
is ONE running-max scan of Hpre[j'] + j'*gapE — no in-column serial
loop.  E likewise opens from Hpre only.  The tiny banded cigar DP runs
on host (exact port of banded_sw's direction encoding and traceback
priority)."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_ENC = np.full(256, 4, np.int8)
for _i, _c in enumerate("ACGT"):
    _ENC[ord(_c)] = _i
    _ENC[ord(_c.lower())] = _i


def default_matrix(match: int, mismatch: int) -> np.ndarray:
    """ssw_cpp BuildDefaultMatrix: (5,5) with N rows/cols scoring 0."""
    m = np.full((5, 5), -mismatch, np.int32)
    np.fill_diagonal(m, match)
    m[4, :] = 0
    m[:, 4] = 0
    return m


@dataclasses.dataclass
class SswAlignment:
    score1: int
    score2: int
    ref_begin1: int
    ref_end1: int
    read_begin1: int
    read_end1: int
    ref_end2: int
    cigar: List[Tuple[int, str]]        # [(length, op)] ops M/I/D

    def cigar_string(self) -> str:
        return "".join(f"{n}{op}" for n, op in self.cigar)


@partial(jax.jit, static_argnames=("Lref", "Lread", "gapO", "gapE",
                                   "reverse"))
def _sweep(refs, reads, ref_len, read_len, mat, terminate,
           Lref, Lread, gapO, gapE, reverse):
    """Batched SSW column sweep (sw_sse2_* math, exact max/tie rules).
    reverse=True iterates ref columns high->low and stops (per lane)
    once a column max reaches `terminate` (the reverse-prefix pass).
    Returns (best score, best ref col, best read row, maxColumn)."""
    B = refs.shape[0]
    i32 = jnp.int32
    jidx = jnp.arange(Lread, dtype=i32)

    def step(i, carry):
        Hprev, E, best, best_i, Hbest, maxcol, stop = carry
        col = (Lref - 1 - i) if reverse else i
        live = (~stop) & (col < ref_len) if not reverse \
            else (~stop) & (col >= Lref - ref_len)
        # reversed lanes index their ref from the END (seq_reverse of
        # the prefix == suffix of the padded-right-aligned array); the
        # caller pre-reverses instead, so col semantics stay forward
        rbase = refs[:, col]                              # (B,)
        s = jnp.take_along_axis(
            mat[rbase], reads, axis=1)                    # (B, Lread)
        diag = jnp.concatenate(
            [jnp.zeros((B, 1), i32), Hprev[:, :-1]], axis=1)
        valid = jidx[None, :] < read_len[:, None]
        Hpre = jnp.maximum(jnp.maximum(diag + s, E), 0)
        Hpre = jnp.where(valid, Hpre, 0)
        g = Hpre + gapE * jidx[None, :]
        cm = lax.associative_scan(jnp.maximum, g, axis=1)
        F = jnp.concatenate(
            [jnp.full((B, 1), -(1 << 30), i32), cm[:, :-1]], axis=1) \
            - gapO - gapE * (jidx[None, :] - 1)
        F = jnp.maximum(F, 0)
        H = jnp.where(valid, jnp.maximum(Hpre, F), 0)
        En = jnp.maximum(jnp.maximum(E - gapE, Hpre - gapO), 0)

        cmax = jnp.max(H, axis=1)
        upd = live & (cmax > best)                        # strict: first col
        best = jnp.where(upd, cmax, best)
        best_i = jnp.where(upd, col, best_i)
        Hbest = jnp.where(upd[:, None], H, Hbest)
        maxcol = maxcol.at[:, col].set(
            jnp.where(live, cmax, maxcol[:, col]))
        stop = stop | (live & (terminate > 0) & (cmax == terminate))
        Hprev = jnp.where(live[:, None], H, Hprev)
        E = jnp.where(live[:, None], En, E)
        return (Hprev, E, best, best_i, Hbest, maxcol, stop)

    z = jnp.zeros((B, Lread), i32)
    carry = (z, z, jnp.zeros((B,), i32), jnp.full((B,), -1, i32),
             z, jnp.zeros((B, Lref), i32), jnp.zeros((B,), bool))
    (_, _, best, best_i, Hbest, maxcol, _) = lax.fori_loop(
        0, Lref, step, carry)
    # read end: SMALLEST j attaining the max in the best column
    # (ssw.c:285-291 takes min over the striped scan)
    hit = (Hbest == best[:, None]) & (jidx[None, :] < read_len[:, None])
    end_read = jnp.min(jnp.where(hit, jidx[None, :], Lread + 1), axis=1)
    end_read = jnp.where(best > 0, end_read, read_len - 1)
    return best, best_i, end_read, maxcol


def _second_best(maxcol: np.ndarray, end_ref: int, mask_len: int,
                 ref_len: int) -> Tuple[int, int]:
    """bests[1] (ssw.c:310-325): best column outside the maskLen window
    around end_ref, strict > keeps the first."""
    score2, ref2 = 0, 0
    edge = max(end_ref - mask_len, 0)
    for i in range(edge):
        if maxcol[i] > score2:
            score2, ref2 = int(maxcol[i]), i
    edge = min(end_ref + mask_len, ref_len)
    for i in range(edge + 1, ref_len):
        if maxcol[i] > score2:
            score2, ref2 = int(maxcol[i]), i
    return score2, ref2


def _banded_sw(ref: np.ndarray, read: np.ndarray, score: int,
               gapO: int, gapE: int, band_width: int,
               mat: np.ndarray) -> List[Tuple[int, str]]:
    """Exact banded_sw port (ssw.c:532-717): direction codes 1=M,
    2=E-ext, 3=E-open, 4=F-ext, 5=F-open; traceback from the last cell
    with its h/e/f state machine; band doubling until max >= score."""
    refLen, readLen = len(ref), len(read)
    while True:
        width = band_width * 2 + 3
        width_d = band_width * 2 + 1
        h_b = np.zeros(width, np.int64)
        e_b = np.zeros(width, np.int64)
        h_c = np.zeros(width, np.int64)
        direction = np.zeros((readLen, width_d * 3), np.int8)
        maxv = 0
        for i in range(readLen):
            beg = max(0, i - band_width)
            end = min(refLen - 1, i + band_width)
            edge = min(end + 1, width - 1)
            f = 0
            h_b[0] = e_b[0] = h_b[edge] = e_b[edge] = h_c[0] = 0
            dline = direction[i]
            x0 = max(i - band_width, 0)
            x1 = max(i - 1 - band_width, 0)
            u_last = 0
            for j in range(beg, end + 1):
                u = j - x0 + 1
                e_ = j - x1 + 1
                b = j - 1 - x0 + 1
                d = j - 1 - x1 + 1
                de, df, dh = (j - x0) * 3, (j - x0) * 3 + 1, \
                    (j - x0) * 3 + 2
                t1 = -gapO if i == 0 else h_b[e_] - gapO
                t2 = -gapE if i == 0 else e_b[e_] - gapE
                e_b[u] = max(t1, t2)
                dline[de] = 3 if t1 > t2 else 2
                t1 = h_c[b] - gapO
                t2 = f - gapE
                f = max(t1, t2)
                dline[df] = 5 if t1 > t2 else 4
                e1 = max(e_b[u], 0)
                f1 = max(f, 0)
                t1 = max(e1, f1)
                t2 = h_b[d] + mat[ref[j], read[i]]
                h_c[u] = max(t1, t2)
                maxv = max(maxv, h_c[u])
                if t1 <= t2:
                    dline[dh] = 1
                else:
                    dline[dh] = dline[de] if e1 > f1 else dline[df]
                u_last = u
            h_b[1:u_last + 1] = h_c[1:u_last + 1]
        if maxv >= score:
            break
        band_width *= 2

    # traceback (ssw.c:621-666)
    i, j = readLen - 1, refLen - 1
    e = 0
    ops: List[Tuple[int, str]] = []
    op = prev_op = "M"
    state = 2
    while i > 0:
        x = max(i - band_width, 0)
        code = direction[i][(j - x) * 3 + state]
        if code == 1:
            i -= 1
            j -= 1
            state = 2
            op = "M"
        elif code == 2:
            i -= 1
            state = 0
            op = "I"
        elif code == 3:
            i -= 1
            state = 2
            op = "I"
        elif code == 4:
            j -= 1
            state = 1
            op = "D"
        elif code == 5:
            j -= 1
            state = 2
            op = "D"
        else:
            return []                       # "not consensus" path
        if op == prev_op:
            e += 1
        else:
            ops.append((e, prev_op))
            prev_op = op
            e = 1
    if op == "M":
        ops.append((e + 1, op))
    else:
        ops.append((e, op))
        ops.append((1, "M"))
    ops.reverse()
    return ops


class SswAligner:
    """Batched ssw_align with the realigner's scoring defaults
    (realigner.cpp:64-73)."""

    def __init__(self, match: int = 4, mismatch: int = 6,
                 gap_open: int = 8, gap_extend: int = 2):
        self.match, self.mismatch = match, mismatch
        self.gapO, self.gapE = gap_open, gap_extend
        self.mat = default_matrix(match, mismatch)
        self._matj = jnp.asarray(self.mat)

    def align_batch(self, reads: List[str], refs: List[str],
                    mask_len: Optional[int] = None,
                    with_cigar: bool = True) -> List[SswAlignment]:
        """ssw_align for every (read, ref) pair: batched device forward
        pass, batched reverse pass over the best prefixes, host banded
        cigar."""
        B = len(reads)
        if B == 0:
            return []
        rd = [_ENC[np.frombuffer(s.encode(), np.uint8)] for s in reads]
        rf = [_ENC[np.frombuffer(s.encode(), np.uint8)] for s in refs]
        Lread = _pow2(max(len(s) for s in rd))
        Lref = _pow2(max(len(s) for s in rf))
        reads_a = np.full((B, Lread), 4, np.int8)
        refs_a = np.full((B, Lref), 4, np.int8)
        rdl = np.zeros(B, np.int32)
        rfl = np.zeros(B, np.int32)
        for b in range(B):
            reads_a[b, :len(rd[b])] = rd[b]
            refs_a[b, :len(rf[b])] = rf[b]
            rdl[b], rfl[b] = len(rd[b]), len(rf[b])

        best, best_i, end_read, maxcol = _sweep(
            jnp.asarray(refs_a, jnp.int32), jnp.asarray(reads_a, jnp.int32),
            jnp.asarray(rfl), jnp.asarray(rdl), self._matj,
            jnp.zeros(B, jnp.int32),
            Lref=Lref, Lread=Lread, gapO=self.gapO, gapE=self.gapE,
            reverse=False)
        best = np.asarray(best)
        best_i = np.asarray(best_i)
        end_read = np.asarray(end_read)
        maxcol = np.asarray(maxcol)

        # reverse pass: reversed read prefix vs reversed ref prefix,
        # terminated at score1 (ssw.c:820-833)
        rev_reads = np.full((B, Lread), 4, np.int8)
        rev_refs = np.full((B, Lref), 4, np.int8)
        rev_rdl = np.zeros(B, np.int32)
        rev_rfl = np.zeros(B, np.int32)
        for b in range(B):
            er, err = int(best_i[b]), int(end_read[b])
            rev_reads[b, :err + 1] = rd[b][err::-1]
            rev_refs[b, :er + 1] = rf[b][er::-1]
            rev_rdl[b], rev_rfl[b] = err + 1, er + 1
        rscore, rbest_i, rend_read, _ = _sweep(
            jnp.asarray(rev_refs, jnp.int32),
            jnp.asarray(rev_reads, jnp.int32),
            jnp.asarray(rev_rfl), jnp.asarray(rev_rdl), self._matj,
            jnp.asarray(best),
            Lref=Lref, Lread=Lread, gapO=self.gapO, gapE=self.gapE,
            reverse=False)
        rbest_i = np.asarray(rbest_i)
        rend_read = np.asarray(rend_read)

        out = []
        for b in range(B):
            ml = mask_len if mask_len is not None else len(rd[b])
            score1 = int(best[b])
            ref_end = int(best_i[b])
            read_end = int(end_read[b])
            # reversed coordinates back to forward (ssw.c:830-832)
            ref_begin = ref_end - int(rbest_i[b])
            read_begin = read_end - int(rend_read[b])
            if ml >= 15:
                score2, ref2 = _second_best(maxcol[b], ref_end, ml,
                                            int(rfl[b]))
            else:
                score2, ref2 = 0, -1
            cig: List[Tuple[int, str]] = []
            if with_cigar and score1 > 0:
                sub_ref = rf[b][ref_begin:ref_end + 1]
                sub_read = rd[b][read_begin:read_end + 1]
                bw = abs(len(sub_ref) - len(sub_read)) + 1
                cig = _banded_sw(sub_ref, sub_read, score1,
                                 self.gapO, self.gapE, bw, self.mat)
            out.append(SswAlignment(
                score1=score1, score2=score2,
                ref_begin1=ref_begin, ref_end1=ref_end,
                read_begin1=read_begin, read_end1=read_end,
                ref_end2=ref2, cigar=cig))
        return out

    def align(self, read: str, ref: str, **kw) -> SswAlignment:
        return self.align_batch([read], [ref], **kw)[0]


def _pow2(v: int, lo: int = 16) -> int:
    p = lo
    while p < v:
        p *= 2
    return p
