"""Gap-affine Wavefront Alignment (WFA) — TPU-native batched kernel.

Reference semantics: wfa/gap_affine/ — the score-increasing loop of
extend + compute (affine_wavefront_align.c:325-361), offset recurrences
with OFFSET_NULL=-10 sentinel arithmetic (affine_wavefront.h:48,
affine_wavefront_align.c:120-199), kernel specialization by I/D
allocation (:283-321), wavefront limits lo-1/hi+1 (:87-110), exact
diagonal extension (affine_wavefront_extend.c:237-255), and the
backtrace if-chain priority del_ext > del_open > ins_ext > ins_open >
mismatch with valid-location gap handling
(affine_wavefront_backtrace.c:280-387).  Driver I/O and defaults
(x=4,o=6,e=2, complete wavefronts) per tools/align_benchmark.c:83-97;
output lines "id=N <rle-cigar>" (:501-504).

TPU-first design:
  * one score step advances a whole BATCH of pairs in lock-step: every
    wavefront recurrence is a (B, D) vector op over all diagonals of all
    lanes at once (the reference computes one pair, one k at a time).
  * wavefront history lives in HBM as dense (B, Scap, D) int32 arrays
    updated in place through the `lax.while_loop` carry; per-score lo/hi
    bounds + existence flags reproduce the reference's sparse wavefront
    allocation exactly (NULL cells = -10 sentinel, same arithmetic).
  * exact extension compares 4 bases per iteration with masked gathers
    (the vector analogue of the reference's SVE 4-byte gather + clz,
    affine_wavefront_extend.c:173-236).
  * the backtrace also runs on device, all lanes stepping together with
    masks; emitted (gap, matches, op) step records are assembled into
    RLE CIGARs on the host.
"""

from __future__ import annotations

import sys
from collections import defaultdict
from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from genarchbench_tpu.core.roi import ROITimer
from genarchbench_tpu.io.seqpair_io import SeqPairs, read_seqpairs

NULL = -10              # AFFINE_WAVEFRONT_OFFSET_NULL (affine_wavefront.h:48)
NEG = -(1 << 29)        # "absent term" for masked maxes (never observable)
OP_NONE, OP_D, OP_I, OP_X = 0, 1, 2, 3
BT_M, BT_I, BT_D = 0, 1, 2


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@partial(jax.jit, static_argnames=("K0", "D", "Scap", "x", "o", "e"))
def _wfa_forward(pattern, text, plen, tlen, K0, D, Scap, x, o, e):
    """Forward wavefronts for a batch.

    pattern (B,Lp) / text (B,Lt) int32, plen/tlen (B,) int32.  Diagonal k
    is stored at index j = k + K0.  Returns history arrays + per-lane
    final score and done flag."""
    B = pattern.shape[0]
    Lp, Lt = pattern.shape[1], text.shape[1]
    i32 = jnp.int32
    oe = o + e

    jj = lax.broadcasted_iota(i32, (1, D), 1)               # diag index
    kk = jj - K0                                            # diag value
    ak = (tlen - plen)[:, None]                             # (B,1) align diag
    jak = (tlen - plen + K0)                                # (B,) align index

    Mh = jnp.full((B, Scap, D), NULL, i32)
    Ih = jnp.full((B, Scap, D), NULL, i32)
    Dh = jnp.full((B, Scap, D), NULL, i32)
    # m[0] = {k=0: 0}
    Mh = Mh.at[:, 0, K0].set(0)
    lo_init = jnp.full((B, Scap), 1, i32)
    hi_init = jnp.full((B, Scap), -1, i32)
    mlo = lo_init.at[:, 0].set(0)
    mhi = hi_init.at[:, 0].set(0)
    ilo, ihi = lo_init, hi_init
    dlo, dhi = lo_init, hi_init
    mex = jnp.zeros((B, Scap), bool).at[:, 0].set(True)
    iex = jnp.zeros((B, Scap), bool)
    dex = jnp.zeros((B, Scap), bool)

    def fetch_row(H, s):
        """(B,D) offsets at score s (NULL row when s<0)."""
        t = jnp.maximum(s, 0)
        row = lax.dynamic_slice(H, (0, t, 0), (B, 1, D))[:, 0, :]
        return jnp.where(s >= 0, row, NULL)

    def bounds(ex, lo, hi, s):
        """Source-wavefront lo/hi/null at score s (wavefront_null else)."""
        t = jnp.maximum(s, 0)
        e_ = (s >= 0) & ex[:, t]
        l = jnp.where(e_, lo[:, t], 1)
        h = jnp.where(e_, hi[:, t], -1)
        return e_, l, h

    def extend_rows(Ms, act0):
        """Exact diagonal extension, 4 bases per iteration."""
        def gather(seq, idx, n):
            take = jnp.take_along_axis(
                seq, jnp.clip(idx, 0, seq.shape[1] - 1), axis=1)
            return take, (idx >= 0) & (idx < n[:, None])

        def body(carry):
            off, active = carry
            v = off - kk
            h = off
            run = jnp.zeros_like(off)
            good = active
            for i in range(4):
                pc, pv = gather(pattern, v + i, plen)
                tc, tv = gather(text, h + i, tlen)
                good = good & pv & tv & (pc == tc)
                run = run + good.astype(i32)
            off = jnp.where(active, off + run, off)
            return off, active & (run == 4)

        def cond(carry):
            return jnp.any(carry[1])

        off, _ = lax.while_loop(cond, body, (Ms, act0))
        return off

    def step(carry):
        (Mh, Ih, Dh, mlo, mhi, ilo, ihi, dlo, dhi, mex, iex, dex,
         s, done, fscore) = carry

        # ---- extend m[s] (affine_wavefront_extend.c:237-255) ----
        live = ~done
        mex_s, mlo_s, mhi_s = bounds(mex, mlo, mhi, s)
        Ms = fetch_row(Mh, s)
        act = live[:, None] & mex_s[:, None] & (jj >= mlo_s[:, None] + K0) \
            & (jj <= mhi_s[:, None] + K0)
        Ms = extend_rows(Ms, act)
        Mh = lax.dynamic_update_slice(Mh, Ms[:, None, :], (0, s, 0))

        # ---- end condition (affine_wavefront_utils.c:85-103) ----
        at_ak = jnp.take_along_axis(Ms, jak[:, None], axis=1)[:, 0]
        reach = mex_s & (mlo_s <= ak[:, 0]) & (ak[:, 0] <= mhi_s) \
            & (at_ak >= tlen)
        newly = live & reach
        fscore = jnp.where(newly, s, fscore)
        done = done | newly
        live = ~done

        # ---- compute wavefront s+1 (affine_wavefront_align.c:283-321) ----
        sn = s + 1
        sub_ex, sub_lo, sub_hi = bounds(mex, mlo, mhi, sn - x)
        gap_ex, gap_lo, gap_hi = bounds(mex, mlo, mhi, sn - oe)
        ie_ex, ie_lo, ie_hi = bounds(iex, ilo, ihi, sn - e)
        de_ex, de_lo, de_hi = bounds(dex, dlo, dhi, sn - e)
        any_src = sub_ex | gap_ex | ie_ex | de_ex
        compute = live & any_src

        lo = jnp.minimum(jnp.minimum(sub_lo, gap_lo),
                         jnp.minimum(ie_lo, de_lo)) - 1
        hi = jnp.maximum(jnp.maximum(sub_hi, gap_hi),
                         jnp.maximum(ie_hi, de_hi)) + 1
        i_alloc = compute & (gap_ex | ie_ex)
        d_alloc = compute & (gap_ex | de_ex)

        Msub = fetch_row(Mh, sn - x)
        Mgap = fetch_row(Mh, sn - oe)
        Iext = fetch_row(Ih, sn - e)
        Dext = fetch_row(Dh, sn - e)

        def condfetch(row, ex, lo_, hi_, shift):
            """COND_FETCH of row[k+shift] (align_benchmark macro :117)."""
            if shift == -1:
                sh = jnp.concatenate(
                    [jnp.full((B, 1), NULL, i32), row[:, :-1]], axis=1)
            elif shift == 1:
                sh = jnp.concatenate(
                    [row[:, 1:], jnp.full((B, 1), NULL, i32)], axis=1)
            else:
                sh = row
            inb = ex[:, None] & (kk + shift >= lo_[:, None]) \
                & (kk + shift <= hi_[:, None])
            return jnp.where(inb, sh, NULL)

        ins_g = condfetch(Mgap, gap_ex, gap_lo, gap_hi, -1)
        ins_i = condfetch(Iext, ie_ex, ie_lo, ie_hi, -1)
        ins = jnp.maximum(ins_g, ins_i) + 1
        del_g = condfetch(Mgap, gap_ex, gap_lo, gap_hi, 1)
        del_d = condfetch(Dext, de_ex, de_lo, de_hi, 1)
        dl = jnp.maximum(del_g, del_d)
        sub = condfetch(Msub, sub_ex, sub_lo, sub_hi, 0)
        sub = jnp.where(sub == NULL, NULL, sub + 1)
        mnew = jnp.maximum(sub,
                           jnp.maximum(
                               jnp.where(i_alloc[:, None], ins, NEG),
                               jnp.where(d_alloc[:, None], dl, NEG)))

        krange = (jj >= lo[:, None] + K0) & (jj <= hi[:, None] + K0)
        wm = krange & compute[:, None]
        Msn = jnp.where(wm, mnew, NULL)
        Isn = jnp.where(krange & i_alloc[:, None], ins, NULL)
        Dsn = jnp.where(krange & d_alloc[:, None], dl, NULL)
        Mh = lax.dynamic_update_slice(Mh, Msn[:, None, :], (0, sn, 0))
        Ih = lax.dynamic_update_slice(Ih, Isn[:, None, :], (0, sn, 0))
        Dh = lax.dynamic_update_slice(Dh, Dsn[:, None, :], (0, sn, 0))

        def setcol(arr, val, mask):
            col = jnp.where(mask, val, arr[:, sn])
            return lax.dynamic_update_slice(
                arr, col[:, None], (0, sn))

        mlo = setcol(mlo, lo, compute)
        mhi = setcol(mhi, hi, compute)
        ilo = setcol(ilo, lo, i_alloc)
        ihi = setcol(ihi, hi, i_alloc)
        dlo = setcol(dlo, lo, d_alloc)
        dhi = setcol(dhi, hi, d_alloc)
        mex = setcol(mex, jnp.ones((B,), bool), compute)
        iex = setcol(iex, jnp.ones((B,), bool), i_alloc)
        dex = setcol(dex, jnp.ones((B,), bool), d_alloc)

        return (Mh, Ih, Dh, mlo, mhi, ilo, ihi, dlo, dhi, mex, iex, dex,
                sn, done, fscore)

    def cond(carry):
        s, done = carry[12], carry[13]
        return (~jnp.all(done)) & (s < Scap - 1)

    carry = (Mh, Ih, Dh, mlo, mhi, ilo, ihi, dlo, dhi, mex, iex, dex,
             jnp.asarray(0, i32), jnp.zeros((B,), bool),
             jnp.zeros((B,), i32))
    (Mh, Ih, Dh, mlo, mhi, ilo, ihi, dlo, dhi, mex, iex, dex,
     s, done, fscore) = lax.while_loop(cond, step, carry)

    # ---- backtrace (affine_wavefront_backtrace.c:280-387) ----
    jak = (tlen - plen + K0)
    flatM = Mh.reshape(B, Scap * D)
    flatI = Ih.reshape(B, Scap * D)
    flatD = Dh.reshape(B, Scap * D)

    def hist_at(flat, ex, lo, hi, s_, j_, plus1):
        """offsets[k] at score s_ with lo_base/hi_base check; NULL else."""
        t = jnp.clip(s_, 0, Scap - 1)
        inb = (s_ >= 0) & jnp.take_along_axis(ex, t[:, None], 1)[:, 0] \
            & (j_ - K0 >= jnp.take_along_axis(lo, t[:, None], 1)[:, 0]) \
            & (j_ - K0 <= jnp.take_along_axis(hi, t[:, None], 1)[:, 0])
        idx = jnp.clip(t * D + jnp.clip(j_, 0, D - 1), 0, Scap * D - 1)
        val = jnp.take_along_axis(flat, idx[:, None], 1)[:, 0]
        val = val + (1 if plus1 else 0)
        return jnp.where(inb, val, NULL)

    score0 = fscore
    j0 = jak
    off0 = jnp.take_along_axis(
        flatM, (jnp.clip(score0, 0, Scap - 1) * D + j0)[:, None], 1)[:, 0]
    MAXSTEP = Scap

    def validloc(j_, off_):
        v = off_ - (j_ - K0)
        h = off_
        return (v > 0) & (v <= plen) & (h > 0) & (h <= tlen)

    gaps = jnp.zeros((B, MAXSTEP), i32)
    nmats = jnp.zeros((B, MAXSTEP), i32)
    opsr = jnp.zeros((B, MAXSTEP), i32)

    def bt_step(carry):
        (sc, j_, off, bty, valid, fin, t, gaps, nmats, opsr) = carry
        v = off - (j_ - K0)
        h = off
        act = ~fin & (v > 0) & (h > 0) & (sc > 0)
        fin = fin | ~act

        nowv = validloc(j_, off)
        trans = act & ~valid & nowv
        gap = jnp.where(trans, j_ - jak, 0)     # >0 => 'D' run, <0 => 'I'
        valid = valid | (act & nowv)

        de = jnp.where(bty != BT_I,
                       hist_at(flatD, dex, dlo, dhi, sc - e, j_ + 1, False), NULL)
        do = jnp.where(bty != BT_I,
                       hist_at(flatM, mex, mlo, mhi, sc - oe, j_ + 1, False), NULL)
        ie = jnp.where(bty != BT_D,
                       hist_at(flatI, iex, ilo, ihi, sc - e, j_ - 1, True), NULL)
        io = jnp.where(bty != BT_D,
                       hist_at(flatM, mex, mlo, mhi, sc - oe, j_ - 1, True), NULL)
        mm = jnp.where(bty == BT_M,
                       hist_at(flatM, mex, mlo, mhi, sc - x, j_, True), NULL)
        mx = jnp.maximum(mm, jnp.maximum(jnp.maximum(de, do),
                                         jnp.maximum(ie, io)))

        ism = act & (bty == BT_M)
        nm = jnp.where(ism, off - mx, 0)
        off = jnp.where(ism, mx, off)

        is_de = act & (mx == de)
        is_do = act & ~is_de & (mx == do)
        is_ie = act & ~is_de & ~is_do & (mx == ie)
        is_io = act & ~is_de & ~is_do & ~is_ie & (mx == io)
        is_x = act & ~is_de & ~is_do & ~is_ie & ~is_io & (mx == mm)

        op = jnp.where(is_de | is_do, OP_D,
             jnp.where(is_ie | is_io, OP_I,
             jnp.where(is_x, OP_X, OP_NONE)))
        op = jnp.where(valid, op, OP_NONE)      # ops suppressed when invalid
        sc = jnp.where(is_de | is_ie, sc - e,
             jnp.where(is_do | is_io, sc - oe,
             jnp.where(is_x, sc - x, sc)))
        j_ = jnp.where(is_de | is_do, j_ + 1,
             jnp.where(is_ie | is_io, j_ - 1, j_))
        off = jnp.where(is_ie | is_io | is_x, off - 1, off)
        bty = jnp.where(is_de, BT_D,
              jnp.where(is_ie, BT_I,
              jnp.where(is_do | is_io | is_x, BT_M, bty)))

        gaps = lax.dynamic_update_slice(gaps, gap[:, None], (0, t))
        nmats = lax.dynamic_update_slice(nmats, nm[:, None], (0, t))
        opsr = lax.dynamic_update_slice(opsr, op[:, None], (0, t))
        return (sc, j_, off, bty, valid, fin, t + 1, gaps, nmats, opsr)

    def bt_cond(carry):
        fin, t = carry[5], carry[6]
        return (~jnp.all(fin)) & (t < MAXSTEP)

    valid0 = validloc(j0, off0)
    carry = (score0, j0, off0, jnp.zeros((B,), i32), valid0,
             jnp.zeros((B,), bool), jnp.asarray(0, i32),
             gaps, nmats, opsr)
    (sc_f, j_f, off_f, _, _, _, nsteps, gaps, nmats, opsr) = \
        lax.while_loop(bt_cond, bt_step, carry)

    v_f = off_f - (j_f - K0)
    h_f = off_f
    final_m = jnp.where(sc_f == 0, off_f, 0)
    final_d = jnp.where(sc_f != 0, jnp.maximum(v_f, 0), 0)
    final_i = jnp.where(sc_f != 0, jnp.maximum(h_f, 0), 0)

    return (done, fscore, nsteps, gaps, nmats, opsr,
            final_m, final_d, final_i)


_OPCHAR = {OP_D: "D", OP_I: "I", OP_X: "X"}


def _assemble_cigar(gaps, nmats, ops, fm, fd, fi, nsteps) -> str:
    """Reverse the emission-order records into the final RLE CIGAR
    (the reference writes ops backwards into the buffer,
    affine_wavefront_backtrace.c:259,310-370, edit_cigar.c:184-200)."""
    parts: List[str] = []
    for t in range(nsteps):
        g = int(gaps[t])
        if g > 0:
            parts.append("D" * g)
        elif g < 0:
            parts.append("I" * (-g))
        nm = int(nmats[t])
        if nm > 0:
            parts.append("M" * nm)
        op = int(ops[t])
        if op != OP_NONE:
            parts.append(_OPCHAR[op])
    if fm > 0:
        parts.append("M" * int(fm))
    if fd > 0:
        parts.append("D" * int(fd))
    if fi > 0:
        parts.append("I" * int(fi))
    chars = "".join(parts)[::-1]
    if not chars:
        return ""
    out = []
    last, cnt = chars[0], 1
    for c in chars[1:]:
        if c == last:
            cnt += 1
        else:
            out.append(f"{cnt}{last}")
            last, cnt = c, 1
    out.append(f"{cnt}{last}")
    return "".join(out)


def wfa_batch(pairs: SeqPairs, x: int = 4, o: int = 6, e: int = 2,
              max_batch: int = 128, scap0: int = 64, mesh=None) -> List[str]:
    """RLE CIGAR per pair in input order (complete-wavefronts mode).
    With a mesh, pairs shard data-parallel along the batch axis; the
    lock-step score loop's global `any(active)` condition becomes an
    all-reduce XLA inserts automatically."""
    from genarchbench_tpu.sharding.mesh import pad_batch, shard_args

    n = len(pairs)
    out: List[str] = [""] * n
    buckets = defaultdict(list)
    for i in range(n):
        Lp = _round_up(max(len(pairs.patterns[i]), 1), 32)
        Lt = _round_up(max(len(pairs.texts[i]), 1), 32)
        buckets[(Lp, Lt)].append(i)

    for (Lp, Lt), idxs in sorted(buckets.items()):
        pending = idxs
        scap = scap0
        while pending:
            retry: List[int] = []
            for lo_i in range(0, len(pending), max_batch):
                chunk = pending[lo_i:lo_i + max_batch]
                B = pad_batch(_round_up(len(chunk), 8), mesh)
                pat = np.full((B, Lp), 250, np.int32)
                txt = np.full((B, Lt), 251, np.int32)
                plen = np.zeros(B, np.int32)
                tlen = np.zeros(B, np.int32)
                for b, i in enumerate(chunk):
                    p_, t_ = pairs.patterns[i], pairs.texts[i]
                    pat[b, :len(p_)] = p_
                    txt[b, :len(t_)] = t_
                    plen[b], tlen[b] = len(p_), len(t_)
                K0 = max(Lp, scap + 2)
                D = _round_up(K0 + max(Lt, scap + 2) + 2, 128)
                pat, txt, plen, tlen = shard_args(mesh, pat, txt, plen, tlen)
                res = _wfa_forward(pat, txt, plen, tlen, K0=K0, D=D,
                                   Scap=scap, x=x, o=o, e=e)
                (done, fscore, nsteps, gaps, nmats, opsr,
                 fm, fd, fi) = [np.asarray(r) for r in res]
                for b, i in enumerate(chunk):
                    if not done[b]:
                        retry.append(i)
                        continue
                    out[i] = _assemble_cigar(
                        gaps[b], nmats[b], opsr[b],
                        fm[b], fd[b], fi[b], int(nsteps))
            pending = retry
            scap *= 2
            if scap > (1 << 16):
                raise RuntimeError("wfa: score cap exceeded")
    return out


def cell_updates(pairs: SeqPairs) -> int:
    """Equivalent-DP-matrix cells (n*m per pair), the cross-platform
    counter BASELINE.md uses for wfa throughput."""
    return sum(len(p) * len(t) for p, t in zip(pairs.patterns, pairs.texts))


def run(argv: Sequence[str]) -> int:
    """CLI compatible with the reference wfa align_benchmark
    (tools/align_benchmark.c:195-298): -i input [-o output] [-t threads]
    [-x|-g|-G penalties]."""
    import argparse
    p = argparse.ArgumentParser(prog="wfa")
    p.add_argument("-i", dest="input", required=True)
    p.add_argument("-o", dest="output", default=None)
    p.add_argument("-t", dest="threads", type=int, default=1)
    p.add_argument("-x", dest="mismatch", type=int, default=4)
    p.add_argument("-g", dest="gap_opening", type=int, default=6)
    p.add_argument("-G", dest="gap_extension", type=int, default=2)
    args = p.parse_args(argv)

    from genarchbench_tpu.sharding.mesh import data_mesh
    pairs = read_seqpairs(args.input, swap_longer_first=False)
    roi = ROITimer("wfa", "Time.Alignment: {t:f} s")
    with roi:
        cigars = wfa_batch(pairs, x=args.mismatch, o=args.gap_opening,
                           e=args.gap_extension, mesh=data_mesh())
    print(f"Total.reads: {len(pairs)}")
    roi.report(file=sys.stdout)
    cells = cell_updates(pairs)
    if roi.elapsed > 0:
        print(f"CellUpdates: {cells} ({cells / roi.elapsed:.3e} cells/s)",
              file=sys.stderr)
    if args.output:
        with open(args.output, "w") as f:
            f.writelines(f"id={i} {c}\n" for i, c in enumerate(cigars))
    return 0


if __name__ == "__main__":
    sys.exit(run(sys.argv[1:]))
