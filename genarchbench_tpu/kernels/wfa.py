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
  * compute state is a RING of the last max(x, o+e)+1 wavefronts — the
    only scores the recurrences ever read — so the per-step working set
    is (B, 9, D) regardless of how high scores go.
  * instead of dense offset histories, the forward pass records a
    COMPACT BACKTRACE STORE: one byte of op codes (which of the five
    backtrace candidates de/do/ie/io/mm wins under the reference's
    priority, plus the I- and D-cell binary choices) and one int16 of
    exact-extension run length per (score, diagonal) cell.  That is 3
    bytes/cell versus 12 for the three offset planes, and the decisions
    are *precomputed with the reference's exact comparison semantics*,
    so the backtrace never re-derives offsets.
  * the score cap grows by RESUMING: all loop state (ring, stores,
    bounds, score) round-trips through the jit carry, so when some lanes
    exceed the cap the stores are padded (device-side) and the same
    while_loop continues — finished lanes idle under their masks, no
    work is re-done.
  * exact extension compares 4 bases per iteration with masked gathers
    (the vector analogue of the reference's SVE 4-byte gather + clz,
    affine_wavefront_extend.c:173-236).
  * the backtrace also runs on device, all lanes stepping together,
    reading only the op/extension stores; emitted (gap, matches, op)
    step records are assembled into RLE CIGARs on the host.
"""

from __future__ import annotations

import sys
from collections import defaultdict
from functools import partial
from typing import List, Sequence

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
# op codes stored per M cell (backtrace candidate priority order,
# affine_wavefront_backtrace.c:310-370)
C_DE, C_DO, C_IE, C_IO, C_MM = 0, 1, 2, 3, 4


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _ring_size(x: int, o: int, e: int) -> int:
    return max(x, o + e) + 1


@partial(jax.jit, static_argnames=("K0", "D", "Scap", "x", "o", "e"))
def _wfa_forward(pattern, text, plen, tlen, state, K0, D, Scap, x, o, e):
    """Advance the batched score loop until every lane completes or the
    score cap is hit.  `state` is the full resumable carry (see
    `_init_state`); diagonal k is stored at index j = k + K0."""
    B = pattern.shape[0]
    i32 = jnp.int32
    oe = o + e
    RS = _ring_size(x, o, e)

    jj = lax.broadcasted_iota(i32, (1, D), 1)               # diag index
    kk = jj - K0                                            # diag value
    ak = (tlen - plen)[:, None]                             # (B,1) align diag
    jak = jnp.clip(tlen - plen + K0, 0, D - 1)              # (B,) align index

    def ring_row(H, s):
        """(B,D) ring row holding wavefront s (garbage when s<0 or
        older than RS — callers mask those via `bounds`)."""
        t = lax.rem(jnp.maximum(s, 0), jnp.asarray(RS, i32))
        return lax.dynamic_slice(H, (0, t, 0), (B, 1, D))[:, 0, :]

    def fetch_row(H, s):
        row = ring_row(H, s)
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

    def step(st):
        (Mh, Ih, Dh, mlo, mhi, ilo, ihi, dlo, dhi, mex, iex, dex,
         ops, ext, s, done, fscore, foff) = st

        # ---- extend m[s] (affine_wavefront_extend.c:237-255) ----
        live = ~done
        mex_s, mlo_s, mhi_s = bounds(mex, mlo, mhi, s)
        Ms0 = fetch_row(Mh, s)
        act = live[:, None] & mex_s[:, None] & (jj >= mlo_s[:, None] + K0) \
            & (jj <= mhi_s[:, None] + K0)
        Ms = extend_rows(Ms0, act)
        tr = lax.rem(s, jnp.asarray(RS, i32))
        Mh = lax.dynamic_update_slice(Mh, Ms[:, None, :], (0, tr, 0))
        # extension run length -> nm of the backtrace's M-cell visit
        # (nm = off - mx, affine_wavefront_backtrace.c:330-340: the
        # post-extend offset minus the winning candidate = the run)
        ext = lax.dynamic_update_slice(
            ext, (Ms - Ms0).astype(jnp.int16)[:, None, :], (0, s, 0))

        # ---- end condition (affine_wavefront_utils.c:85-103) ----
        at_ak = jnp.take_along_axis(Ms, jak[:, None], axis=1)[:, 0]
        reach = mex_s & (mlo_s <= ak[:, 0]) & (ak[:, 0] <= mhi_s) \
            & (at_ak >= tlen)
        newly = live & reach
        fscore = jnp.where(newly, s, fscore)
        foff = jnp.where(newly, at_ak, foff)
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
            """COND_FETCH of row[k+shift] (align_benchmark macro :117);
            also returns the in-bounds mask for backtrace-exact +1
            candidates (hist semantics: NULL when out of bounds, but
            stored-NULL + 1 when in bounds)."""
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
            return jnp.where(inb, sh, NULL), inb, sh

        ins_g, inb_ig, raw_ig = condfetch(Mgap, gap_ex, gap_lo, gap_hi, -1)
        ins_i, inb_ii, raw_ii = condfetch(Iext, ie_ex, ie_lo, ie_hi, -1)
        ins = jnp.maximum(ins_g, ins_i) + 1
        del_g, inb_dg, raw_dg = condfetch(Mgap, gap_ex, gap_lo, gap_hi, 1)
        del_d, inb_dd, raw_dd = condfetch(Dext, de_ex, de_lo, de_hi, 1)
        dl = jnp.maximum(del_g, del_d)
        sub, inb_s, raw_s = condfetch(Msub, sub_ex, sub_lo, sub_hi, 0)
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
        trn = lax.rem(sn, jnp.asarray(RS, i32))
        Mh = lax.dynamic_update_slice(Mh, Msn[:, None, :], (0, trn, 0))
        Ih = lax.dynamic_update_slice(Ih, Isn[:, None, :], (0, trn, 0))
        Dh = lax.dynamic_update_slice(Dh, Dsn[:, None, :], (0, trn, 0))

        # ---- backtrace op codes, with the backtrace's OWN candidate
        # values (hist_at applies +1 BEFORE the bounds mask, so an
        # in-bounds stored NULL reads as -9 there while the forward's
        # masked fetch gives -10; at any visited cell the winner is
        # >= 0, so the corner never flips a choice, but we replicate it
        # exactly anyway, affine_wavefront_backtrace.c:320-333) ----
        de_c = del_d
        do_c = del_g
        ie_c = jnp.where(inb_ii, raw_ii + 1, NULL)
        io_c = jnp.where(inb_ig, raw_ig + 1, NULL)
        mm_c = jnp.where(inb_s, raw_s + 1, NULL)
        mx = jnp.maximum(mm_c, jnp.maximum(jnp.maximum(de_c, do_c),
                                           jnp.maximum(ie_c, io_c)))
        opm = jnp.where(mx == de_c, C_DE,
              jnp.where(mx == do_c, C_DO,
              jnp.where(mx == ie_c, C_IE,
              jnp.where(mx == io_c, C_IO, C_MM))))
        opi = (jnp.maximum(ie_c, io_c) != ie_c).astype(i32)   # 0=ie, 1=io
        opd = (jnp.maximum(de_c, do_c) != de_c).astype(i32)   # 0=de, 1=do
        code = (opm | (opi << 3) | (opd << 4)).astype(jnp.uint8)
        ops = lax.dynamic_update_slice(ops, code[:, None, :], (0, sn, 0))

        def setcol(arr, val, mask):
            col = jnp.where(mask, val, arr[:, sn])
            return lax.dynamic_update_slice(arr, col[:, None], (0, sn))

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
                ops, ext, sn, done, fscore, foff)

    def cond(st):
        s, done = st[14], st[15]
        return (~jnp.all(done)) & (s < Scap - 1)

    return lax.while_loop(cond, step, state)


def _init_state(B, D, Scap, RS):
    """Fresh device-resident loop state: m[0] = {k=0: 0} at j=K0 —
    written by the caller (K0 is shape-dependent)."""
    i32 = jnp.int32
    Mh = jnp.full((B, RS, D), NULL, i32)
    Ih = jnp.full((B, RS, D), NULL, i32)
    Dh = jnp.full((B, RS, D), NULL, i32)
    lo_init = jnp.full((B, Scap), 1, i32)
    hi_init = jnp.full((B, Scap), -1, i32)
    mlo = lo_init.at[:, 0].set(0)
    mhi = hi_init.at[:, 0].set(0)
    mex = jnp.zeros((B, Scap), bool).at[:, 0].set(True)
    zex = jnp.zeros((B, Scap), bool)
    ops = jnp.zeros((B, Scap, D), jnp.uint8)
    ext = jnp.zeros((B, Scap, D), jnp.int16)
    return [Mh, Ih, Dh, mlo, mhi, lo_init, hi_init, lo_init, hi_init,
            mex, zex, zex, ops, ext, jnp.asarray(0, jnp.int32),
            jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.int32)]


def _grow_state(state, K0_old, K0, D, Scap):
    """Pad a finished-at-cap state to (Scap, D) with the diagonal origin
    moved to K0 — device-side pads, nothing re-computed on resume."""
    (Mh, Ih, Dh, mlo, mhi, ilo, ihi, dlo, dhi, mex, iex, dex,
     ops, ext, s, done, fscore, foff) = state
    dl = K0 - K0_old
    dr = D - Mh.shape[2] - dl
    dS = Scap - mlo.shape[1]

    def pad_d(a, fill):
        return jnp.pad(a, ((0, 0), (0, 0), (dl, dr)), constant_values=fill)

    def pad_sd(a, fill):
        return jnp.pad(a, ((0, 0), (0, dS), (dl, dr)), constant_values=fill)

    def pad_s(a, fill):
        return jnp.pad(a, ((0, 0), (0, dS)), constant_values=fill)

    return [pad_d(Mh, NULL), pad_d(Ih, NULL), pad_d(Dh, NULL),
            pad_s(mlo, 1), pad_s(mhi, -1), pad_s(ilo, 1), pad_s(ihi, -1),
            pad_s(dlo, 1), pad_s(dhi, -1),
            pad_s(mex, False), pad_s(iex, False), pad_s(dex, False),
            pad_sd(ops, 0), pad_sd(ext, 0), s, done, fscore, foff]


@partial(jax.jit, static_argnames=("K0", "D", "Scap", "x", "o", "e"))
def _wfa_backtrace(ops, ext, fscore, foff, plen, tlen, K0, D, Scap,
                   x, o, e):
    """Lock-step backtrace over the compact store
    (affine_wavefront_backtrace.c:280-387): every op decision was
    precomputed by the forward pass with the reference's candidate
    priority, so each step is a 2-gather walk."""
    B = fscore.shape[0]
    i32 = jnp.int32
    oe = o + e
    jak = jnp.clip(tlen - plen + K0, 0, D - 1)
    flat_ops = ops.reshape(B, Scap * D)
    flat_ext = ext.reshape(B, Scap * D)
    MAXSTEP = Scap

    def validloc(j_, off_):
        v = off_ - (j_ - K0)
        h = off_
        return (v > 0) & (v <= plen) & (h > 0) & (h <= tlen)

    gaps = jnp.zeros((B, MAXSTEP), i32)
    nmats = jnp.zeros((B, MAXSTEP), jnp.int16)
    opsr = jnp.zeros((B, MAXSTEP), jnp.int8)

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

        idx = jnp.clip(sc, 0, Scap - 1) * D + jnp.clip(j_, 0, D - 1)
        code = jnp.take_along_axis(flat_ops, idx[:, None], 1)[:, 0] \
            .astype(i32)
        extv = jnp.take_along_axis(flat_ext, idx[:, None], 1)[:, 0] \
            .astype(i32)
        opm = code & 7
        opi = (code >> 3) & 1
        opd = (code >> 4) & 1

        isM = bty == BT_M
        isI = bty == BT_I
        isD = bty == BT_D
        ism = act & isM
        nm = jnp.where(ism, extv, 0)
        off = jnp.where(ism, off - extv, off)

        is_de = act & ((isM & (opm == C_DE)) | (isD & (opd == 0)))
        is_do = act & ((isM & (opm == C_DO)) | (isD & (opd == 1)))
        is_ie = act & ((isM & (opm == C_IE)) | (isI & (opi == 0)))
        is_io = act & ((isM & (opm == C_IO)) | (isI & (opi == 1)))
        is_x = act & isM & (opm == C_MM)

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
        nmats = lax.dynamic_update_slice(
            nmats, nm.astype(jnp.int16)[:, None], (0, t))
        opsr = lax.dynamic_update_slice(
            opsr, op.astype(jnp.int8)[:, None], (0, t))
        return (sc, j_, off, bty, valid, fin, t + 1, gaps, nmats, opsr)

    def bt_cond(carry):
        fin, t = carry[5], carry[6]
        return (~jnp.all(fin)) & (t < MAXSTEP)

    valid0 = validloc(jak, foff)
    carry = (fscore, jak, foff, jnp.zeros((B,), i32), valid0,
             jnp.zeros((B,), bool), jnp.asarray(0, i32),
             gaps, nmats, opsr)
    (sc_f, j_f, off_f, _, _, _, nsteps, gaps, nmats, opsr) = \
        lax.while_loop(bt_cond, bt_step, carry)

    v_f = off_f - (j_f - K0)
    h_f = off_f
    final_m = jnp.where(sc_f == 0, off_f, 0)
    final_d = jnp.where(sc_f != 0, jnp.maximum(v_f, 0), 0)
    final_i = jnp.where(sc_f != 0, jnp.maximum(h_f, 0), 0)
    return nsteps, gaps, nmats, opsr, final_m, final_d, final_i


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


def _geometry(Lp: int, Lt: int, scap: int):
    """Diagonal-origin/width for a score cap: unclamped complete-mode
    wavefronts spread by one diagonal per score, so only min(L, scap)
    diagonals each side can ever hold data."""
    K0 = min(Lp, scap) + 2
    D = _round_up(K0 + min(Lt, scap) + 3, 128)
    return K0, D


def wfa_batch(pairs: SeqPairs, x: int = 4, o: int = 6, e: int = 2,
              max_batch: int = 512, scap0: int = 64, mesh=None) -> List[str]:
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
    RS = _ring_size(x, o, e)

    for (Lp, Lt), idxs in sorted(buckets.items()):
        for lo_i in range(0, len(idxs), max_batch):
            chunk = idxs[lo_i:lo_i + max_batch]
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
            pat, txt, plen, tlen = shard_args(mesh, pat, txt, plen, tlen)

            scap = scap0
            K0, D = _geometry(Lp, Lt, scap)
            state = _init_state(B, D, scap, RS)
            state[0] = state[0].at[:, 0, K0].set(0)    # m[0] = {k=0: 0}
            while True:
                state = list(_wfa_forward(pat, txt, plen, tlen,
                                          tuple(state), K0=K0, D=D,
                                          Scap=scap, x=x, o=o, e=e))
                if bool(jnp.all(state[15])):
                    break
                if scap * 2 > (1 << 16):
                    raise RuntimeError("wfa: score cap exceeded")
                K0_old, D_old = K0, D
                scap *= 2
                K0, D = _geometry(Lp, Lt, scap)
                # never shrink: the old content must fit after the
                # diagonal-origin shift (round-up slack can otherwise
                # absorb the K0 growth)
                D = max(D, _round_up(D_old + (K0 - K0_old), 128))
                state = _grow_state(state, K0_old, K0, D, scap)

            ops_s, ext_s, fscore, foff = (state[12], state[13],
                                          state[16], state[17])
            res = _wfa_backtrace(ops_s, ext_s, fscore, foff, plen, tlen,
                                 K0=K0, D=D, Scap=scap, x=x, o=o, e=e)
            (nsteps, gaps, nmats, opsr, fm, fd, fi) = \
                [np.asarray(r) for r in res]
            for b, i in enumerate(chunk):
                out[i] = _assemble_cigar(
                    gaps[b], nmats[b], opsr[b],
                    fm[b], fd[b], fi[b], int(nsteps))
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
