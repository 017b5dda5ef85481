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
    COMPACT BACKTRACE STORE: one packed uint32 per (score, diagonal)
    cell — op codes (which of the five backtrace candidates
    de/do/ie/io/mm wins under the reference's priority, plus the I- and
    D-cell binary choices) in the low byte and the exact-extension run
    length above it — versus 12 bytes for the three offset planes; the
    decisions are *precomputed with the reference's exact comparison
    semantics*, so the backtrace never re-derives offsets and walks
    with ONE gather per step.
  * the score cap grows by RESUMING: all loop state (ring, stores,
    bounds, score) round-trips through the jit carry, so when some lanes
    exceed the cap the stores are padded (device-side) and the same
    while_loop continues — finished lanes idle under their masks, no
    work is re-done.
  * exact extension is GATHER-FREE: a per-diagonal MISMATCH BITMASK
    table (one uint32 word per 32 pattern positions, built once per
    batch) turns "extend while bases match" into find-first-set-bit
    arithmetic on (B, D, W) words — pure VPU ops, no data-dependent
    memory access in the score loop.  This is the TPU analogue of the
    reference's SVE 4-byte gather + clz trick
    (affine_wavefront_extend.c:173-236), with the gather hoisted out of
    the loop entirely (measured 16.8 ms -> 0.07 ms per score step).
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
WFA_UNROLL = 4          # score steps per while-loop iteration
OP_NONE, OP_D, OP_I, OP_X = 0, 1, 2, 3
BT_M, BT_I, BT_D = 0, 1, 2
# op codes stored per M cell (backtrace candidate priority order,
# affine_wavefront_backtrace.c:310-370)
C_DE, C_DO, C_IE, C_IO, C_MM = 0, 1, 2, 3, 4


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _ring_size(x: int, o: int, e: int) -> int:
    return max(x, o + e) + 1


@partial(jax.jit, static_argnames=("K0", "D"))
def _build_mismatch_table(pattern, text, tlen, K0, D):
    """(B, D, W) uint32 mismatch bitmask: bit (v % 32) of word (v // 32)
    at diagonal index j is set iff pattern[v] != text[v + (j - K0)].
    Positions past the sequence ends carry arbitrary bits — extension
    clamps against plen / tlen arithmetically, never reading them.
    Built ONCE per batch (one structured gather); the score loop then
    extends with pure bit arithmetic (affine_wavefront_extend.c:237-255
    semantics, vectorized)."""
    B, Lp = pattern.shape
    Lt = text.shape[1]
    W = Lp // 32
    idx = jnp.arange(D)[:, None] + jnp.arange(Lp)[None, :] - K0   # (D, Lp)
    stext = jnp.take(text, jnp.clip(idx, 0, Lt - 1), axis=1)      # (B, D, Lp)
    mism = pattern[:, None, :] != stext
    bits = mism.reshape(B, D, W, 32).astype(jnp.uint32) \
        << jnp.arange(32, dtype=jnp.uint32)[None, None, None, :]
    return bits.sum(axis=3)


@partial(jax.jit, static_argnames=("K0", "D", "Scap", "x", "o", "e",
                                   "red_len", "red_dist"))
def _wfa_forward(pattern, text, plen, tlen, mmtbl, state,
                 K0, D, Scap, x, o, e, red_len=0, red_dist=0):
    """Advance the batched score loop until every lane completes or the
    score cap is hit.  `state` is the full resumable carry (see
    `_init_state`); diagonal k is stored at index j = k + K0.
    red_len/red_dist > 0 turn on ADAPTIVE WAVEFRONT REDUCTION
    (affine_wavefront_extend.c:85-156): after extending m[s], trim
    diagonals whose distance-to-target exceeds the wavefront minimum by
    more than red_dist (never trimming past the alignment diagonal),
    and clamp the same score's i/d bounds to the reduced range."""
    B = pattern.shape[0]
    Lp = pattern.shape[1]
    i32 = jnp.int32
    u32 = jnp.uint32
    oe = o + e
    RS = _ring_size(x, o, e)
    W = Lp // 32

    jj = lax.broadcasted_iota(i32, (1, D), 1)               # diag index
    kk = jj - K0                                            # diag value
    ak = (tlen - plen)[:, None]                             # (B,1) align diag
    jak = jnp.clip(tlen - plen + K0, 0, D - 1)              # (B,) align index
    warr = (32 * jnp.arange(W, dtype=i32))[None, None, :]   # (1,1,W)

    def ring_row(H, s):
        """(B,D) ring row holding wavefront s (garbage when s<0 or
        older than RS — callers mask those via `bounds`)."""
        t = lax.rem(jnp.maximum(s, 0), jnp.asarray(RS, i32))
        return lax.dynamic_slice(H, (0, t, 0), (B, 1, D))[:, 0, :]

    def fetch_row(H, s):
        row = ring_row(H, s)
        return jnp.where(s >= 0, row, NULL)

    def bounds(ex, lo, hi, s):
        """Source-wavefront lo/hi/null at score s (wavefront_null
        else).  lo/hi/ex are (B, RS) RINGS: the recurrences only ever
        look back max(x, o+e) = RS-1 scores, so per-score bounds never
        need to persist (measured: the (B, Scap) read-modify-writes
        were ~2/3 of the step's HBM traffic)."""
        t = lax.rem(jnp.maximum(s, 0), jnp.asarray(RS, i32))
        e_ = (s >= 0) & ex[:, t]
        l = jnp.where(e_, lo[:, t], 1)
        h = jnp.where(e_, hi[:, t], -1)
        return e_, l, h

    def extend_rows(Ms, act0):
        """Exact diagonal extension, gather-free: the run of matches
        from pattern position v is (first set bit >= v in the diagonal's
        mismatch words) - v, clamped at the sequence ends."""
        v = Ms - kk
        h = Ms
        ok = act0 & (v >= 0) & (h >= 0) \
            & (v < plen[:, None]) & (h < tlen[:, None])
        vc = jnp.clip(v, 0, Lp - 1)
        sh = jnp.clip(vc[:, :, None] - warr, 0, 32).astype(u32)
        masked = jnp.where(sh >= 32, u32(0), (mmtbl >> sh) << sh)
        low = masked & (~masked + u32(1))                   # lowest set bit
        ctz = 31 - lax.clz(low.astype(i32))
        pos = jnp.where(masked != 0, warr + ctz, 1 << 20)
        fm = jnp.min(pos, axis=2)                           # 1st mismatch >= v
        fm = jnp.minimum(fm, jnp.minimum(plen[:, None],
                                         tlen[:, None] - kk))
        run = jnp.where(ok, jnp.maximum(fm - vc, 0), 0)
        return Ms + run

    def step(st):
        (Mh, Ih, Dh, mlo, mhi, ilo, ihi, dlo, dhi, mex, iex, dex,
         store, code_carry, s, done, fscore, foff) = st

        # ---- extend m[s] (affine_wavefront_extend.c:237-255) ----
        live = ~done
        mex_s, mlo_s, mhi_s = bounds(mex, mlo, mhi, s)
        Ms0 = fetch_row(Mh, s)
        act = live[:, None] & mex_s[:, None] & (jj >= mlo_s[:, None] + K0) \
            & (jj <= mhi_s[:, None] + K0)
        Ms = extend_rows(Ms0, act)
        tr = lax.rem(s, jnp.asarray(RS, i32))
        Mh = lax.dynamic_update_slice(Mh, Ms[:, None, :], (0, tr, 0))
        # column s of the packed store: the op code for wavefront s
        # (carried from the previous step) in the low byte, and this
        # step's extension run length (the backtrace M-cell's nm =
        # off - mx, affine_wavefront_backtrace.c:330-340) above it —
        # ONE store write per step
        col = code_carry | ((Ms - Ms0).astype(u32) << 8)
        store = lax.dynamic_update_slice(store, col[:, None, :], (0, s, 0))

        # ---- adaptive reduction (affine_wavefront_extend.c:85-156),
        # applied between extension and the end condition like the
        # reference's extend_wavefront_packed (:256-276) ----
        if red_len > 0:
            BIG = 1 << 29
            akv = ak[:, 0]
            inw = act                      # live, m non-null, in [lo,hi]
            do_red = live & mex_s & ((mhi_s - mlo_s + 1) >= red_len)
            v = Ms - kk
            h = Ms
            dist = jnp.maximum(plen[:, None] - v, tlen[:, None] - h)
            dmin = jnp.min(jnp.where(inw, dist, BIG), axis=1)
            okd = (dist - dmin[:, None]) <= red_dist
            top_lim = jnp.minimum(akv - 1, mhi_s)
            cand = inw & okd & (kk < top_lim[:, None])
            first_ok = jnp.min(jnp.where(cand, kk, BIG), axis=1)
            nlo = jnp.maximum(jnp.minimum(first_ok, top_lim), mlo_s)
            nlo = jnp.where(do_red & (top_lim > mlo_s), nlo, mlo_s)
            bot_lim = jnp.maximum(akv + 1, nlo)
            cand_h = inw & okd & (kk > bot_lim[:, None])
            last_ok = jnp.max(jnp.where(cand_h, kk, -BIG), axis=1)
            nhi = jnp.minimum(jnp.maximum(last_ok, bot_lim), mhi_s)
            nhi = jnp.where(do_red & (mhi_s > bot_lim), nhi, mhi_s)
            nex = mex_s & ~(do_red & (nlo > nhi))
            mlo_s, mhi_s, mex_s = nlo, nhi, nex

            def redcol(arr, val):
                return lax.dynamic_update_slice(
                    arr, val[:, None], (0, tr))

            mlo = redcol(mlo, mlo_s)
            mhi = redcol(mhi, mhi_s)
            mex = redcol(mex, mex_s)
            # clamp i/d wavefronts at this score to the reduced range
            ie_s, il_s, ih_s = bounds(iex, ilo, ihi, s)
            de_s, dl_s, dh_s = bounds(dex, dlo, dhi, s)
            il_n = jnp.where(do_red & ie_s, jnp.maximum(il_s, mlo_s),
                             il_s)
            ih_n = jnp.where(do_red & ie_s, jnp.minimum(ih_s, mhi_s),
                             ih_s)
            dl_n = jnp.where(do_red & de_s, jnp.maximum(dl_s, mlo_s),
                             dl_s)
            dh_n = jnp.where(do_red & de_s, jnp.minimum(dh_s, mhi_s),
                             dh_s)
            ilo = redcol(ilo, il_n)
            ihi = redcol(ihi, ih_n)
            iex = redcol(iex, ie_s & ~(do_red & (il_n > ih_n)))
            dlo = redcol(dlo, dl_n)
            dhi = redcol(dhi, dh_n)
            dex = redcol(dex, de_s & ~(do_red & (dl_n > dh_n)))

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
        code_carry = (opm | (opi << 3) | (opd << 4)).astype(u32)

        trn = lax.rem(sn, jnp.asarray(RS, i32))

        def setcol(arr, val, mask, default):
            # ring write: each score column is written exactly once, so
            # masked-off lanes take the wavefront_null default (not the
            # stale slot content from score sn - RS)
            col = jnp.where(mask, val, default)
            return lax.dynamic_update_slice(arr, col[:, None], (0, trn))

        one = jnp.ones((B,), bool)
        mlo = setcol(mlo, lo, compute, 1)
        mhi = setcol(mhi, hi, compute, -1)
        ilo = setcol(ilo, lo, i_alloc, 1)
        ihi = setcol(ihi, hi, i_alloc, -1)
        dlo = setcol(dlo, lo, d_alloc, 1)
        dhi = setcol(dhi, hi, d_alloc, -1)
        mex = setcol(mex, one, compute, False)
        iex = setcol(iex, one, i_alloc, False)
        dex = setcol(dex, one, d_alloc, False)

        return (Mh, Ih, Dh, mlo, mhi, ilo, ihi, dlo, dhi, mex, iex, dex,
                store, code_carry, sn, done, fscore, foff)

    # UNROLL score steps per while iteration: each step is ~sub-ms of
    # device work, so per-iteration fixed costs dominate the loop; the
    # conservative bound (Scap - UNROLL) means a block can never write
    # past the store — lanes needing the last few scores resume via
    # the host's grow-and-retry path exactly like a cap overflow
    def block(st):
        for _ in range(WFA_UNROLL):
            st = step(st)
        return st

    def cond(st):
        s, done = st[14], st[15]
        return (~jnp.all(done)) & (s < Scap - WFA_UNROLL)

    out = lax.while_loop(cond, block, state)
    # tiny summary so the host learns (all-done, max score) in ONE
    # small d2h instead of two separate syncs (~100 ms/transfer tunnel)
    summary = jnp.stack([jnp.all(out[15]).astype(jnp.int32),
                         jnp.max(jnp.where(out[15], out[16], 0))])
    return out, summary


@partial(jax.jit, static_argnames=("B", "D", "Scap", "RS", "K0"))
def _init_state(B, D, Scap, RS, K0):
    """Fresh device-resident loop state with m[0] = {k=0: 0} at j=K0."""
    i32 = jnp.int32
    Mh = jnp.full((B, RS, D), NULL, i32).at[:, 0, K0].set(0)
    Ih = jnp.full((B, RS, D), NULL, i32)
    Dh = jnp.full((B, RS, D), NULL, i32)
    lo_init = jnp.full((B, RS), 1, i32)
    hi_init = jnp.full((B, RS), -1, i32)
    mlo = lo_init.at[:, 0].set(0)
    mhi = hi_init.at[:, 0].set(0)
    mex = jnp.zeros((B, RS), bool).at[:, 0].set(True)
    zex = jnp.zeros((B, RS), bool)
    store = jnp.zeros((B, Scap, D), jnp.uint32)
    code0 = jnp.zeros((B, D), jnp.uint32)
    return [Mh, Ih, Dh, mlo, mhi, lo_init, hi_init, lo_init, hi_init,
            mex, zex, zex, store, code0, jnp.asarray(0, jnp.int32),
            jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.int32)]


@partial(jax.jit, static_argnames=("T", "nm8"))
def _pack_bt(nmats, opsr, gap_t, gap_v, fm, fd, fi, T, nm8):
    """Pack the backtrace records into ONE uint8 array sliced to the
    actual step count — the device->host link is the bottleneck.
    Layout: nm (int8 if nm8 else int16 LE) | op 2-bit x4-per-byte |
    10-byte tail (gap_t, gap_v, fm, fd, fi as int16)."""
    B = nmats.shape[0]

    def b2(x16):
        u = x16.astype(jnp.uint16)
        return jnp.stack([(u & 0xFF).astype(jnp.uint8),
                          (u >> 8).astype(jnp.uint8)], axis=-1
                         ).reshape(B, -1)

    nm = lax.slice(nmats, (0, 0), (B, T))
    op = lax.slice(opsr, (0, 0), (B, T)).astype(jnp.uint8)
    op4 = op.reshape(B, T // 4, 4)
    opp = (op4[:, :, 0] | (op4[:, :, 1] << 2) | (op4[:, :, 2] << 4)
           | (op4[:, :, 3] << 6))
    nmb = nm.astype(jnp.uint8) if nm8 else b2(nm)
    tail = jnp.stack([gap_t, gap_v, fm, fd, fi], axis=1) \
        .astype(jnp.int16)
    return jnp.concatenate([nmb, opp, b2(tail)], axis=1)


def _unpack_bt(buf: np.ndarray, T: int, nm8: bool):
    """Inverse of _pack_bt on host."""
    nw = T if nm8 else 2 * T
    nmats = (buf[:, :T].view(np.int8) if nm8
             else buf[:, :2 * T].copy().view(np.int16))
    opp = buf[:, nw:nw + T // 4]
    opsr = np.empty((buf.shape[0], T), np.int8)
    for k in range(4):
        opsr[:, k::4] = (opp >> (2 * k)) & 3
    tail = buf[:, nw + T // 4:nw + T // 4 + 10].copy().view(np.int16)
    return (nmats, opsr, tail[:, 0], tail[:, 1], tail[:, 2],
            tail[:, 3], tail[:, 4])


@partial(jax.jit, static_argnames=("dl", "dr", "dS"))
def _grow_state_jit(state, dl, dr, dS):
    (Mh, Ih, Dh, mlo, mhi, ilo, ihi, dlo, dhi, mex, iex, dex,
     store, code_carry, s, done, fscore, foff) = state

    def pad_d(a, fill):
        return jnp.pad(a, ((0, 0), (0, 0), (dl, dr)), constant_values=fill)

    def pad_sd(a, fill):
        return jnp.pad(a, ((0, 0), (0, dS), (dl, dr)), constant_values=fill)

    def pad_c(a, fill):
        return jnp.pad(a, ((0, 0), (dl, dr)), constant_values=fill)

    return [pad_d(Mh, NULL), pad_d(Ih, NULL), pad_d(Dh, NULL),
            mlo, mhi, ilo, ihi, dlo, dhi, mex, iex, dex,
            pad_sd(store, 0), pad_c(code_carry, 0),
            s, done, fscore, foff]


def _grow_state(state, K0_old, K0, D, Scap):
    """Pad a finished-at-cap state to (Scap, D) with the diagonal origin
    moved to K0 — device-side pads, nothing re-computed on resume.
    The bounds rings hold diagonal VALUES, not indices, so the origin
    shift leaves them untouched."""
    dl = K0 - K0_old
    dr = D - state[0].shape[2] - dl
    dS = Scap - state[12].shape[1]
    return list(_grow_state_jit(tuple(state), dl=dl, dr=dr, dS=dS))


@partial(jax.jit, static_argnames=("K0", "D", "Scap", "x", "o", "e"))
def _wfa_backtrace(store, fscore, foff, plen, tlen, K0, D, Scap,
                   x, o, e):
    """Lock-step backtrace over the compact store
    (affine_wavefront_backtrace.c:280-387): every op decision was
    precomputed by the forward pass with the reference's candidate
    priority, so each step is a 1-gather walk of the packed
    code|run<<8 words."""
    B = fscore.shape[0]
    i32 = jnp.int32
    oe = o + e
    jak = jnp.clip(tlen - plen + K0, 0, D - 1)
    flat = store.reshape(B, Scap * D)
    MAXSTEP = Scap

    def validloc(j_, off_):
        v = off_ - (j_ - K0)
        h = off_
        return (v > 0) & (v <= plen) & (h > 0) & (h <= tlen)

    nmats = jnp.zeros((B, MAXSTEP), jnp.int16)
    opsr = jnp.zeros((B, MAXSTEP), jnp.int8)
    gap_t0 = jnp.full((B,), -1, i32)
    gap_v0 = jnp.zeros((B,), i32)

    def bt_step(carry):
        (sc, j_, off, bty, valid, fin, t, gap_t, gap_v,
         nmats, opsr) = carry
        v = off - (j_ - K0)
        h = off
        act = ~fin & (v > 0) & (h > 0) & (sc > 0)
        fin = fin | ~act

        nowv = validloc(j_, off)
        trans = act & ~valid & nowv          # fires at most once per lane
        gap_t = jnp.where(trans, t, gap_t)
        gap_v = jnp.where(trans, j_ - jak, gap_v)  # >0 'D' run, <0 'I'
        valid = valid | (act & nowv)

        idx = jnp.clip(sc, 0, Scap - 1) * D + jnp.clip(j_, 0, D - 1)
        word = jnp.take_along_axis(flat, idx[:, None], 1)[:, 0] \
            .astype(i32)
        code = word & 0xFF
        extv = word >> 8
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

        nmats = lax.dynamic_update_slice(
            nmats, nm.astype(jnp.int16)[:, None], (0, t))
        opsr = lax.dynamic_update_slice(
            opsr, op.astype(jnp.int8)[:, None], (0, t))
        return (sc, j_, off, bty, valid, fin, t + 1, gap_t, gap_v,
                nmats, opsr)

    def bt_cond(carry):
        fin, t = carry[5], carry[6]
        return (~jnp.all(fin)) & (t < MAXSTEP)

    valid0 = validloc(jak, foff)
    carry = (fscore, jak, foff, jnp.zeros((B,), i32), valid0,
             jnp.zeros((B,), bool), jnp.asarray(0, i32),
             gap_t0, gap_v0, nmats, opsr)
    (sc_f, j_f, off_f, _, _, _, nsteps, gap_t, gap_v, nmats, opsr) = \
        lax.while_loop(bt_cond, bt_step, carry)

    v_f = off_f - (j_f - K0)
    h_f = off_f
    final_m = jnp.where(sc_f == 0, off_f, 0)
    final_d = jnp.where(sc_f != 0, jnp.maximum(v_f, 0), 0)
    final_i = jnp.where(sc_f != 0, jnp.maximum(h_f, 0), 0)
    return nsteps, nmats, opsr, gap_t, gap_v, final_m, final_d, final_i


_OPCHAR = {OP_D: "D", OP_I: "I", OP_X: "X"}


def _assemble_cigar(nmats, ops, gap_t, gap_v, fm, fd, fi,
                    nsteps) -> str:
    """Reverse the emission-order records into the final RLE CIGAR
    (the reference writes ops backwards into the buffer,
    affine_wavefront_backtrace.c:259,310-370, edit_cigar.c:184-200).
    The invalid->valid gap fires at most once, at step gap_t."""
    parts: List[str] = []
    for t in range(nsteps):
        if t == gap_t:
            g = int(gap_v)
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
    diagonals each side can ever hold data.  The effective cap is
    floored at 128 so the common one-resume path (scap 64 -> 128) keeps
    the same geometry — the resumable state and the mismatch table then
    carry over without a diagonal-origin shift or rebuild."""
    s_eff = max(scap, 128)
    K0 = min(Lp, s_eff) + 2
    D = _round_up(K0 + min(Lt, s_eff) + 3, 128)
    return K0, D


def wfa_batch(pairs: SeqPairs, x: int = 4, o: int = 6, e: int = 2,
              max_batch: int = 16384, scap0: int = 64, mesh=None,
              red_len: int = 0, red_dist: int = 0) -> List[str]:
    """RLE CIGAR per pair in input order (complete-wavefronts mode).
    With a mesh, pairs shard data-parallel along the batch axis; the
    lock-step score loop's global `any(active)` condition becomes an
    all-reduce XLA inserts automatically."""
    from genarchbench_tpu.sharding.mesh import pad_batch, shard_args

    n = len(pairs)
    out: List[str] = [""] * n
    lens_p = np.array([p.shape[0] for p in pairs.patterns], np.int64)
    lens_t = np.array([t.shape[0] for t in pairs.texts], np.int64)
    off_p = np.zeros(n + 1, np.int64)
    off_t = np.zeros(n + 1, np.int64)
    np.cumsum(lens_p, out=off_p[1:])
    np.cumsum(lens_t, out=off_t[1:])
    flat_p = np.concatenate(list(pairs.patterns) + [np.zeros(1, np.uint8)])
    flat_t = np.concatenate(list(pairs.texts) + [np.zeros(1, np.uint8)])

    Lp_all = _round_up(np.maximum(lens_p, 1), 32)
    Lt_all = _round_up(np.maximum(lens_t, 1), 32)
    buckets = defaultdict(list)
    for i in range(n):
        buckets[(int(Lp_all[i]), int(Lt_all[i]))].append(i)
    RS = _ring_size(x, o, e)

    # coalesce near-equal shape buckets (the sequential score loop's
    # cost is per-CHUNK, so fewer wider chunks win when padding waste
    # stays bounded)
    if len(buckets) > 1:
        true_cells = sum(Lp * Lt * len(v) for (Lp, Lt), v in buckets.items())
        Lp_max = max(k[0] for k in buckets)
        Lt_max = max(k[1] for k in buckets)
        if Lp_max * Lt_max * n <= 2 * true_cells:
            merged = []
            for key in sorted(buckets):
                merged.extend(buckets[key])
            buckets = {(Lp_max, Lt_max): merged}

    def fill(flat, off, ids, lens, width, dummy):
        ar = np.arange(width)
        idx = np.minimum(off[ids][:, None] + ar, len(flat) - 1)
        return np.where(ar < lens[ids][:, None], flat[idx],
                        np.uint8(dummy))

    for (Lp, Lt), idxs in sorted(buckets.items()):
        # bound HBM for the (B, Scap, D) backtrace stores.  The cap
        # RESUMES double scap (and grow D), so budget for ~4x growth
        # over the initial geometry: a 2^28-cell initial budget OOMed a
        # 16 GB chip at 192-base pairs once lanes resumed to scap 256
        _, D0 = _geometry(Lp, Lt, scap0)
        mb = max(256, min(max_batch, (1 << 26) // max(D0 * scap0, 1)))
        scap_start = scap0     # learned: later chunks of the bucket
        for lo_i in range(0, len(idxs), mb):
            chunk = idxs[lo_i:lo_i + mb]
            ids = np.asarray(chunk)
            m = len(ids)
            B = pad_batch(_round_up(m, 8), mesh)
            # one fused (B, Lp+Lt) u8 + one (B, 2) i32 h2d: the tunnel
            # charges ~50-100 ms per transfer regardless of size
            seqs8 = np.empty((B, Lp + Lt), np.uint8)
            seqs8[:, :Lp] = 250
            seqs8[:, Lp:] = 251
            lens2 = np.zeros((B, 2), np.int32)
            seqs8[:m, :Lp] = fill(flat_p, off_p, ids, lens_p, Lp, 250)
            seqs8[:m, Lp:] = fill(flat_t, off_t, ids, lens_t, Lt, 251)
            lens2[:m, 0] = lens_p[ids]
            lens2[:m, 1] = lens_t[ids]
            seqs8, lens2 = shard_args(mesh, seqs8, lens2)
            seqs8_j = jnp.asarray(seqs8)
            lens2_j = jnp.asarray(lens2)
            pat = seqs8_j[:, :Lp]
            txt = seqs8_j[:, Lp:]
            plen = lens2_j[:, 0]
            tlen = lens2_j[:, 1]

            scap = scap_start
            K0, D = _geometry(Lp, Lt, scap)
            state = _init_state(B=B, D=D, Scap=scap, RS=RS, K0=K0)
            mmtbl = _build_mismatch_table(pat, txt, tlen, K0=K0, D=D)
            while True:
                state, summ = _wfa_forward(pat, txt, plen, tlen, mmtbl,
                                           tuple(state), K0=K0, D=D,
                                           Scap=scap, x=x, o=o, e=e,
                                           red_len=red_len,
                                           red_dist=red_dist)
                state = list(state)
                summ = np.asarray(summ)
                if bool(summ[0]):
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
                if (K0, D) != (K0_old, D_old):
                    mmtbl = _build_mismatch_table(pat, txt, tlen,
                                                  K0=K0, D=D)

            scap_start = scap
            res = _wfa_backtrace(state[12], state[16], state[17],
                                 plen, tlen,
                                 K0=K0, D=D, Scap=scap, x=x, o=o, e=e)
            # every active backtrace step lowers the score by at least
            # min(e, x), so max-final-score (already on host via the
            # forward summary) bounds the step count — no extra d2h
            # sync on res[0]
            if min(e, x) >= 1:
                nsteps = min(int(summ[1]) // min(e, x) + 3, scap)
            else:
                # degenerate penalties (CLI -G 0 / -x 0): the
                # score-derived bound is invalid - sync the exact
                # device step count instead (ADVICE r3)
                nsteps = int(np.asarray(res[0]))
            if max(D, Lp + 2, Lt + 2, scap) < (1 << 15):
                T = min(_round_up(max(nsteps, 1), 32), scap)
                nm8 = Lp <= 127
                buf = np.asarray(_pack_bt(*res[1:], T=T, nm8=nm8))
                (nmats, opsr, gap_t, gap_v, fm, fd, fi) = \
                    _unpack_bt(buf, T, nm8)
            else:                       # tails would overflow int16
                (nmats, opsr, gap_t, gap_v, fm, fd, fi) = \
                    [np.asarray(r) for r in res[1:]]
            from genarchbench_tpu import native
            cigs = native.wfa_cigars_native(
                nmats[:m], opsr[:m], gap_t[:m], gap_v[:m],
                fm[:m], fd[:m], fi[:m], nsteps)
            if cigs is not None:
                for b, i in enumerate(chunk):
                    out[i] = cigs[b]
            else:
                for b, i in enumerate(chunk):
                    out[i] = _assemble_cigar(
                        nmats[b], opsr[b], gap_t[b], gap_v[b],
                        fm[b], fd[b], fi[b], nsteps)
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
    p.add_argument("--minimum-wavefront-length", dest="red_len",
                   type=int, default=-1,
                   help="adaptive reduction on (align_benchmark.c:267)")
    p.add_argument("--maximum-difference-distance", dest="red_dist",
                   type=int, default=-1)
    args = p.parse_args(argv)
    adaptive = args.red_len >= 0

    from genarchbench_tpu.sharding.mesh import data_mesh
    pairs = read_seqpairs(args.input, swap_longer_first=False)
    roi = ROITimer("wfa", "Time.Alignment: {t:f} s")
    with roi:
        cigars = wfa_batch(pairs, x=args.mismatch, o=args.gap_opening,
                           e=args.gap_extension, mesh=data_mesh(),
                           red_len=args.red_len if adaptive else 0,
                           red_dist=args.red_dist if adaptive else 0)
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
