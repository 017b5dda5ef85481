"""abea: adaptive banded event alignment (f5c/nanopolish) — TPU-native.

Reference semantics: abea/src — scrappie event detection (two-window
t-statistic peak detector, events.c:280-470; detect_events :505-550;
getevents :552-568, whose trim call discards its result — detection
runs over the FULL raw signal), method-of-moments scaling estimation
(align.c:49-97), and the Suzuki-Kasahara adaptive banded DP
(align.c:169-550): bandwidth 100, band placement by ll<ur rule, scores
float32 with double transition penalties, tie priority L > U > D
(:375-385), trailing-event trim in the backtrace start (:411-433), and
QC (avg emission >= -5, spanned, max gap <= 50) zeroing the alignment.
Pore model: nanopolish r9.4 6-mer table (model.h/set_model; loaded
from a file here — data is not copied into this repo).

TPU-first design:
  * the whole per-read band loop runs LOCKSTEP for a batch of reads:
    one `lax.scan` step computes a (B, 100) band for every read at
    once — per-band emission lookups are two gathers + float32 VPU
    arithmetic, the reference's serial 100-cell loop becomes one tile.
  * the sequential peak-detector state machine is a `lax.scan` over
    samples batched over (B,) reads.
  * band/trace histories stream to HBM through the scan's stacked
    outputs; the short per-read backtrace walks them on the host.
  * float64 transition arithmetic (matching C's double penalties) runs
    under `jax.experimental.enable_x64` locally.
"""

from __future__ import annotations

import sys
from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from genarchbench_tpu.core.roi import ROITimer

KMER = 6
BANDWIDTH = 100
HALF_BW = 50
NEGINF = np.float32(-np.inf)

# event detection defaults (events.c:42-46)
WIN1, WIN2 = 3, 6
THRESH1, THRESH2 = 1.4, 9.0
PEAK_HEIGHT = 0.2


# ---------------------------------------------------------------------------
# pore model
# ---------------------------------------------------------------------------

def load_model(path: str) -> Dict[str, np.ndarray]:
    """2+ column text file: level_mean level_stdv per 6-mer rank
    (nanopolish .model files with headers are also accepted)."""
    means, stdvs = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or not _isfloat(parts[0]):
                if len(parts) > 1 and _isfloat(parts[1]):
                    parts = parts[1:]       # kmer-first format
                else:
                    continue
            means.append(float(parts[0]))
            stdvs.append(float(parts[1]))
    if len(means) != 4 ** KMER:
        raise ValueError(f"model has {len(means)} entries, want 4096")
    lm = np.asarray(means, np.float32)
    ls = np.asarray(stdvs, np.float32)
    return {"level_mean": lm, "level_stdv": ls,
            "level_log_stdv": np.log(ls.astype(np.float64)).astype(
                np.float32)}


def _isfloat(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


_RANK = np.full(256, 0, np.int64)
for _i, _c in enumerate("ACGT"):
    _RANK[ord(_c)] = _i


def kmer_ranks(seq: str) -> np.ndarray:
    """get_kmer_rank for every kmer start (align.c:27-38): base at
    offset j contributes rank << 2*(k-1-j)."""
    codes = _RANK[np.frombuffer(seq.encode(), np.uint8)]
    n = len(seq) - KMER + 1
    if n <= 0:
        return np.zeros(0, np.int64)
    r = np.zeros(n, np.int64)
    for j in range(KMER):
        r += codes[j:j + n] << (2 * (KMER - 1 - j))
    return r


# ---------------------------------------------------------------------------
# event detection (host, exact float semantics of events.c)
# ---------------------------------------------------------------------------

def compute_tstat(sums: np.ndarray, sumsqs: np.ndarray, n: int,
                  w: int) -> np.ndarray:
    tstat = np.zeros(n, np.float32)
    if n < 2 * w or w < 2:
        return tstat
    i = np.arange(w, n - w + 1)
    sum1 = sums[i].copy()
    sumsq1 = sumsqs[i].copy()
    big = i > w
    sum1[big] -= sums[i[big] - w]
    sumsq1[big] -= sumsqs[i[big] - w]
    sum2 = (sums[i + w] - sums[i]).astype(np.float32)
    sumsq2 = (sumsqs[i + w] - sumsqs[i]).astype(np.float32)
    wf = np.float32(w)
    # C promotion semantics: sumsq1/w stays double; mean1*mean1,
    # sumsq2/w, mean2*mean2 are float products/quotients promoted to
    # double in the sum; the result truncates to float at assignment
    mean1 = (sum1 / np.float64(wf)).astype(np.float32)
    mean2 = sum2 / wf
    t2 = (mean1 * mean1).astype(np.float64)
    t3 = (sumsq2 / wf).astype(np.float64)
    t4 = (mean2 * mean2).astype(np.float64)
    comb = ((sumsq1 / np.float64(wf) - t2) + t3 - t4).astype(np.float32)
    comb = np.maximum(comb, np.float32(np.finfo(np.float32).tiny))
    # fabs promotes to double; combined_var/w is a FLOAT division,
    # its sqrt and the final division run in double, then truncate
    num = np.abs((mean2 - mean1).astype(np.float64))
    den = np.sqrt((comb / wf).astype(np.float64))
    t = (num / den).astype(np.float32)
    # the C boundary fudge zeroes [0,w) and (n-w, n) BEFORE the main
    # loop, which then writes every i in [w, n-w] inclusive
    tstat[w:n - w + 1] = t
    return tstat


def _peak_detect(tstat1: np.ndarray, tstat2: np.ndarray) -> np.ndarray:
    """short_long_peak_detector (events.c:370-470) — sequential state
    machine, one pass over samples."""
    n = len(tstat1)
    peaks = np.zeros(n, np.int64)
    pc = 0
    det = [dict(sig=tstat1, thr=THRESH1, wl=WIN1, masked=0, pos=-1,
                val=np.float32(np.finfo(np.float32).max), valid=False),
           dict(sig=tstat2, thr=THRESH2, wl=WIN2, masked=0, pos=-1,
                val=np.float32(np.finfo(np.float32).max), valid=False)]
    FLTMAX = np.float32(np.finfo(np.float32).max)
    for i in range(n):
        for k in (0, 1):
            d = det[k]
            if d["masked"] >= i:
                continue
            cur = d["sig"][i]
            if d["pos"] == -1:
                if cur < d["val"]:
                    d["val"] = cur
                elif cur - d["val"] > PEAK_HEIGHT:
                    d["val"] = cur
                    d["pos"] = i
            else:
                if cur > d["val"]:
                    d["val"] = cur
                    d["pos"] = i
                if k == 0 and d["val"] > d["thr"]:
                    det[1]["masked"] = d["pos"] + d["wl"]
                    det[1]["pos"] = -1
                    det[1]["val"] = FLTMAX
                    det[1]["valid"] = False
                if d["val"] - cur > PEAK_HEIGHT and d["val"] > d["thr"]:
                    d["valid"] = True
                if d["valid"] and (i - d["pos"]) > d["wl"] // 2:
                    peaks[pc] = d["pos"]
                    pc += 1
                    d["pos"] = -1
                    d["val"] = cur
                    d["valid"] = False
    return peaks


def get_events(raw: np.ndarray) -> np.ndarray:
    """getevents (events.c:552-568): returns (n, 4) float64 columns
    (start, length, mean, stdv).  The reference's trim call has no
    effect (struct passed by value), so detection covers all samples."""
    raw = raw.astype(np.float32)
    n = len(raw)
    sums = np.zeros(n + 1, np.float64)
    sumsqs = np.zeros(n + 1, np.float64)
    np.cumsum(raw.astype(np.float64), out=sums[1:])
    # C squares in float32 (data[i]*data[i] is a float product,
    # events.c:293-299) before accumulating in double
    np.cumsum((raw * raw).astype(np.float64), out=sumsqs[1:])
    t1 = compute_tstat(sums, sumsqs, n, WIN1)
    t2 = compute_tstat(sums, sumsqs, n, WIN2)
    from genarchbench_tpu import native
    nat = native.peak_detect_native(
        np.ascontiguousarray(t1), np.ascontiguousarray(t2),
        THRESH1, THRESH2, WIN1, WIN2, PEAK_HEIGHT)
    if nat is not None:
        peaks = np.zeros(n, np.int64)
        peaks[:nat[1]] = nat[0][:nat[1]]
    else:
        peaks = _peak_detect(t1, t2)

    # create_events (events.c:455-500): k = #valid peaks + 1 events;
    # event 0 = [0, peaks[0]), event i = [peaks[i-1], peaks[i]),
    # last = [peaks[k-2], nsample); the per-event mean/stdv math is
    # float32 like the C (vectorized, bit-identical to the loop form)
    nvalid = int(((peaks > 0) & (peaks < n)).sum())
    k = nvalid + 1
    plist = peaks[:max(k - 1, 1)]
    if k == 1:
        starts = np.array([0], np.int64)
        ends = np.array([n], np.int64)
    else:
        starts = np.concatenate([[0], plist[:k - 1]])[:k]
        ends = np.concatenate([plist[:k - 1], [n]])[:k]
    length = (ends - starts).astype(np.float32)
    mean = (sums[ends] - sums[starts]).astype(np.float32) / length
    deltasqr = (sumsqs[ends] - sumsqs[starts]).astype(np.float32)
    var = deltasqr / length - mean * mean
    stdv = np.sqrt(np.maximum(var, np.float32(0)))
    ev = np.zeros((k, 4), np.float64)
    ev[:, 0] = starts
    ev[:, 1] = length
    ev[:, 2] = mean
    ev[:, 3] = stdv
    return ev


def estimate_scalings(seq: str, events: np.ndarray,
                      model) -> Tuple[float, float]:
    """estimate_scalings_using_mom (align.c:49-97)."""
    n_kmers = len(seq) - KMER + 1
    ranks = kmer_ranks(seq)
    lm = model["level_mean"].astype(np.float64)[ranks]
    event_means = events[:, 2]
    shift = event_means.mean() - lm.mean()
    scale = (((event_means - shift) ** 2).mean()) / ((lm * lm).mean())
    return np.float32(shift), np.float32(scale)


# ---------------------------------------------------------------------------
# adaptive banded DP (device, lockstep over a batch of reads)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("NB", "NE", "NK"))
def _band_scan_device(ranks, ev_mean, n_events, n_kmers,
                      shift, scale, lm, lsd, llsd,
                      lp_skip, lp_stay, lp_step, lp_trim, NB, NE, NK):
    """ranks (B, NK) int32; ev_mean (B, NE) f32; n_events/n_kmers (B,);
    shift/scale (B,) f32; lm/lsd/llsd (4096,) f32; lp_* (B,) f64.
    Returns bands (NB, B, W) f32, traces (NB, B, W) u8, bll (NB, B, 2)."""
    B = ranks.shape[0]
    W = BANDWIDTH
    f32, f64, i32 = jnp.float32, jnp.float64, jnp.int32
    offs = jnp.arange(W, dtype=i32)[None, :]            # (1, W)

    band0 = jnp.full((B, W), -jnp.inf, f32).at[:, HALF_BW].set(0.0)
    band1 = jnp.full((B, W), -jnp.inf, f32).at[:, HALF_BW].set(
        lp_trim.astype(f32))
    bll0 = jnp.stack([jnp.full((B,), HALF_BW - 1, i32),
                      jnp.full((B,), -1 - HALF_BW, i32)], axis=1)
    bll1 = bll0 + jnp.array([[1, 0]], i32)

    c32 = lambda v: v.astype(f32)
    c64 = lambda v: v.astype(f64)
    # per-kmer emission params hoisted out of the scan (each C float32
    # op emulated as an exact f64 op + f32 cast — FMA-immune):
    # log_probability_match_r9 (align.c:109-144)
    kr_all = jnp.clip(ranks, 0, 4095)
    gp_stdv_all = jnp.take(lsd, kr_all, axis=0)          # (B, NK) f64
    gp_lstdv_all = jnp.take(llsd, kr_all, axis=0)
    t_all = c32(c64(scale[:, None]) * jnp.take(lm, kr_all, axis=0))
    gp_mean_all = c32(c64(t_all) + c64(shift[:, None]))  # (B, NK) f32
    t1_all = c32(jnp.float64(np.float32(-0.918938)) - gp_lstdv_all)

    NINF = jnp.float32(-jnp.inf)

    def sh_l(m, fill):      # m[:, j+1]
        return jnp.concatenate(
            [m[:, 1:], jnp.full((B, 1), fill, m.dtype)], axis=1)

    def sh_r(m, fill):      # m[:, j-1]
        return jnp.concatenate(
            [jnp.full((B, 1), fill, m.dtype), m[:, :-1]], axis=1)

    def win_k(arr, base):
        """(B, W) window arr[b, clip(base[b]+j, 0, NKdim-1)]."""
        idx = jnp.clip(base[:, None] + offs, 0, arr.shape[1] - 1)
        return jnp.take_along_axis(arr, idx, axis=1)

    def win_e(arr, base):
        """(B, W) window arr[b, clip(base[b]-j, 0, NEdim-1)]."""
        idx = jnp.clip(base[:, None] - offs, 0, arr.shape[1] - 1)
        return jnp.take_along_axis(arr, idx, axis=1)

    def step2(carry, b):
        """One Suzuki-Kasahara band advance.  The band only ever moves
        RIGHT (k+1) or DOWN (e+1), so every neighbour-band fetch is the
        previous band shifted by 0/±1 columns (selected per lane) and
        the kmer/event-indexed model windows slide by ≤1 — the former
        per-step (B, W) gathers (6 of them, the scan's entire cost on
        TPU) are now shifts plus one (B, 1) incoming-element gather per
        sliding window."""
        (prev, prev2, bll_e, bll_k, bll2_e, bll2_k,
         em_w, gpm_w, gps_w, t1_w) = carry
        ll = prev[:, 0]
        ur = prev[:, W - 1]
        ll_ob = jnp.isinf(ll)
        ur_ob = jnp.isinf(ur)
        right = jnp.where(ll_ob & ur_ob, (b % 2) == 1, ll < ur)
        e2 = jnp.where(right, bll_e, bll_e + 1)
        k2 = jnp.where(right, bll_k + 1, bll_k)
        rightc = right[:, None]

        # slide the kmer-indexed windows (dk = 1 on right moves)
        def slide_k(w_, arr):
            inc = jnp.take_along_axis(
                arr, jnp.clip(k2 + W - 1, 0, arr.shape[1] - 1)[:, None],
                axis=1)
            shifted = jnp.concatenate([w_[:, 1:], inc], axis=1)
            return jnp.where(rightc, shifted, w_)

        # slide the event-indexed window (de = 1 on down moves)
        def slide_e(w_, arr):
            inc = jnp.take_along_axis(
                arr, jnp.clip(e2, 0, arr.shape[1] - 1)[:, None], axis=1)
            shifted = jnp.concatenate([inc, w_[:, :-1]], axis=1)
            return jnp.where(rightc, w_, shifted)

        em_w = slide_e(em_w, ev_mean)
        gpm_w = slide_k(gpm_w, gp_mean_all)
        gps_w = slide_k(gps_w, gp_stdv_all)
        t1_w = slide_k(t1_w, t1_all)

        band = jnp.full((B, W), -jnp.inf, f32)
        trace = jnp.zeros((B, W), jnp.uint8)

        t_off = -1 - k2
        t_evt = e2 - t_off
        t_ok = (t_off >= 0) & (t_off < W)
        t_in = t_ok & (t_evt >= 0) & (t_evt < n_events)
        t_val = (lp_trim * (t_evt + 1).astype(f64)).astype(f32)
        sel_t = offs == t_off[:, None]
        band = jnp.where(sel_t & t_in[:, None], t_val[:, None], band)
        trace = jnp.where(sel_t & t_in[:, None], jnp.uint8(1), trace)

        kmer_min = -k2
        event_min = e2 - (n_events - 1)
        kmer_max = n_kmers - k2
        event_max = e2 + 1
        min_off = jnp.maximum(jnp.maximum(kmer_min, event_min), 0)
        max_off = jnp.minimum(jnp.minimum(kmer_max, event_max), W)
        inrange = (offs >= min_off[:, None]) & (offs < max_off[:, None])

        # neighbour-band fetches as shift-selects:
        # off_up   = offs + 1 - de  -> right: prev[j+1], down: prev[j]
        # off_left = offs - 1 + dk  -> right: prev[j],   down: prev[j-1]
        # off_diag = offs + dk + dk_prev - 1 (prev2), dk_prev from blls
        up = jnp.where(rightc, sh_l(prev, NINF), prev)
        left = jnp.where(rightc, prev, sh_r(prev, NINF))
        dk_prev = bll_k - bll2_k                       # (B,) 0/1
        dshift = jnp.where(right, 1, 0) + dk_prev - 1  # -1/0/1
        diag = jnp.where((dshift == 1)[:, None], sh_l(prev2, NINF),
               jnp.where((dshift == -1)[:, None], sh_r(prev2, NINF),
                         prev2))

        d_ = em_w - gpm_w                              # f32 - f32
        a = c32(c64(d_) / gps_w)
        t2 = c32(c64(jnp.float32(-0.5)) * c64(a))
        t2 = c32(c64(t2) * c64(a))
        lp_em = c32(c64(t1_w) + c64(t2))

        sd = (diag.astype(f64) + lp_step[:, None]
              + lp_em.astype(f64)).astype(f32)
        su = (up.astype(f64) + lp_stay[:, None]
              + lp_em.astype(f64)).astype(f32)
        sl = (left.astype(f64) + lp_skip[:, None]).astype(f32)

        mx = sd
        fr = jnp.zeros((B, W), jnp.uint8)
        mx2 = jnp.maximum(mx, su)
        fr = jnp.where(mx2 == su, jnp.uint8(1), fr)
        mx3 = jnp.maximum(mx2, sl)
        fr = jnp.where(mx3 == sl, jnp.uint8(2), fr)

        band = jnp.where(inrange, mx3, band)
        trace = jnp.where(inrange, fr, trace)

        carry2 = (band, prev, e2, k2, bll_e, bll_k,
                  em_w, gpm_w, gps_w, t1_w)
        return carry2, (band, trace, jnp.stack([e2, k2], axis=1))

    bs = jnp.arange(2, NB, dtype=i32)
    carry0 = (band1, band0, bll1[:, 0], bll1[:, 1],
              bll0[:, 0], bll0[:, 1],
              win_e(ev_mean, bll1[:, 0]),
              win_k(gp_mean_all, bll1[:, 1]),
              win_k(gp_stdv_all, bll1[:, 1]),
              win_k(t1_all, bll1[:, 1]))
    _, (bands, traces, blls) = lax.scan(step2, carry0, bs)
    bands = jnp.concatenate([band0[None], band1[None], bands], axis=0)
    traces = jnp.concatenate([jnp.zeros((2, B, W), jnp.uint8).at[
        1, :, HALF_BW].set(1), traces], axis=0)
    blls = jnp.concatenate([bll0[None], bll1[None], blls], axis=0)
    return bands, traces, blls


@partial(jax.jit, static_argnames=("NB", "NE", "NK", "T"))
def _abea_backtrace_device(bands, traces, blls, ranks, ev_mean,
                           n_ev, n_km, shifts, scales, lm, lsd, llsd,
                           lp_trim, NB, NE, NK, T):
    """Lock-step device backtrace (align.c:408-545): start-cell argmax
    over the last-event diagonal, trace-code walk, and the emission-QC
    sums — so only the ~(B, T) uint8 trace codes cross the d2h link
    (the (NB, B, W) band/trace downloads were ~640 MB/batch, the entire
    abea wall through the tunnel; the band matrices now never leave
    HBM).  Every f32 emission op replicates the host/reference float
    semantics as an f64 op + f32 cast (FMA-immune, exact)."""
    f32, f64, i32 = jnp.float32, jnp.float64, jnp.int32
    W = BANDWIDTH
    B = ranks.shape[0]
    lane = jnp.arange(B, dtype=i32)
    bands_f = bands.ravel()
    traces_f = traces.ravel()
    bll_e_f = blls[:, :, 0].ravel()                  # (NB*B,)

    c32 = lambda v: v.astype(f32)
    c64 = lambda v: v.astype(f64)

    # start selection (align.c:430-447): ei maximizing
    # bands[ei+nk+1][bll - ei] + (ne - ei) * lp_trim, first max wins
    eis = jnp.arange(NE, dtype=i32)[None, :]         # (1, NE)
    bi_s = eis + n_km[:, None] + 1                   # (B, NE)
    bi_c = jnp.clip(bi_s, 0, NB - 1)
    bll_s = jnp.take(bll_e_f, bi_c * B + lane[:, None])
    off_s = bll_s - eis
    ok_s = (off_s >= 0) & (off_s < W) & (eis < n_ev[:, None])
    val_s = jnp.take(bands_f, (bi_c * B + lane[:, None]) * W
                     + jnp.clip(off_s, 0, W - 1))
    # band value + trim product summed in f64, ONE rounding to f32 —
    # the reference computes the whole candidate in double and rounds
    # once (ADVICE r3: double-rounding could flip near-tie argmaxes)
    score_s = (c64(val_s) + (n_ev[:, None] - eis).astype(f64)
               * c64(lp_trim[:, None])).astype(f32)
    score_s = jnp.where(ok_s, score_s, -jnp.inf)
    e0 = jnp.argmax(score_s, axis=1).astype(i32)     # first max = host >

    fr_out0 = jnp.full((B, T), 255, jnp.uint8)

    def step(carry):
        (ck, ce, gap, mgap, n_al, sum_em, k_last, fin, t, fr_out) = carry
        act = ~fin & (ck >= 0) & (ce >= 0)
        k_last = jnp.where(act, ck, k_last)
        bi = jnp.clip(ce + ck + 2, 0, NB - 1)
        off = jnp.take(bll_e_f, bi * B + lane) - ce
        fr = jnp.take(traces_f, (bi * B + lane) * W
                      + jnp.clip(off, 0, W - 1)).astype(i32)

        kr = jnp.take_along_axis(
            ranks, jnp.clip(ck, 0, NK - 1)[:, None], axis=1)[:, 0]
        em = jnp.take_along_axis(
            ev_mean, jnp.clip(ce, 0, ev_mean.shape[1] - 1)[:, None],
            axis=1)[:, 0]
        # exact C float sequence (log_probability_match_r9 +
        # log_normal_pdf, align.c:99-144): f32 multiply THEN f32 add
        # for gp_mean, and the lp term rounded to f32 before the f64
        # accumulation — each op an f64 compute + f32 cast (FMA-immune),
        # the same per-op emulation the band scan uses (ADVICE r3)
        gp_mean = c32(c64(c32(c64(scales) * c64(jnp.take(lm, kr))))
                      + c64(shifts))
        d_ = em - gp_mean                            # f32 - f32
        a = c32(c64(d_) / c64(jnp.take(lsd, kr)))
        t1 = c32(c64(jnp.float32(-0.918938))
                 - c64(jnp.take(llsd, kr)))
        t2 = c32(c64(c32(c64(jnp.float32(-0.5)) * c64(a))) * c64(a))
        lp = c32(c64(t1) + c64(t2))
        sum_em = jnp.where(act, sum_em + c64(lp), sum_em)
        n_al = jnp.where(act, n_al + 1, n_al)

        fr_out = lax.dynamic_update_slice(
            fr_out, jnp.where(act, fr, 255).astype(jnp.uint8)[:, None],
            (jnp.asarray(0, i32), t))     # x64 mode: both indices i32

        dk = act & (fr != 1)
        de = act & (fr != 2)
        is_skip = act & (fr == 2)
        gap = jnp.where(is_skip, gap + 1, jnp.where(act, 0, gap))
        mgap = jnp.maximum(mgap, gap)
        ck = jnp.where(dk, ck - 1, ck)
        ce = jnp.where(de, ce - 1, ce)
        fin = fin | (~act) | (ck < 0) | (ce < 0)
        return (ck, ce, gap, mgap, n_al, sum_em, k_last, fin, t + 1,
                fr_out)

    def cond(carry):
        fin, t = carry[7], carry[8]
        return (~jnp.all(fin)) & (t < T)

    z = jnp.zeros((B,), i32)
    carry = (n_km - 1, e0, z, z, z, jnp.zeros((B,), f64),
             jnp.full((B,), -1, i32),
             (n_km - 1 < 0) | (e0 < 0), jnp.asarray(0, i32), fr_out0)
    (_, _, _, mgap, n_al, sum_em, k_last, _, _, fr_out) = \
        lax.while_loop(cond, step, carry)
    return fr_out, e0, n_al, sum_em, mgap, k_last


def align_batch(seqs: List[str], event_tables: List[np.ndarray],
                model, sample_rate: float = 4000.0, mesh=None):
    """Adaptive banded alignment for a batch of reads.  Returns per
    read the list of (kmer_idx, event_idx) pairs (empty on QC fail).
    With a mesh, reads shard data-parallel over the lane axis (the
    reference's work-stealing pthread pool over reads,
    abea/src/f5c.c:1143-1238, mapped to SPMD)."""
    from genarchbench_tpu.sharding.mesh import pad_batch, shard_args

    B0 = len(seqs)
    B = pad_batch(B0, mesh)
    n_ev = np.ones(B, np.int32)
    n_km = np.ones(B, np.int32)
    n_ev[:B0] = [len(e) for e in event_tables]
    n_km[:B0] = [len(s) - KMER + 1 for s in seqs]
    NE = 1 << int(max(n_ev.max(), 1) - 1).bit_length()
    NK = 1 << int(max(n_km.max(), 1) - 1).bit_length()
    NB = int((n_ev + n_km).max()) + 2

    ranks = np.zeros((B, NK), np.int32)
    ev_mean = np.zeros((B, NE), np.float32)
    shifts = np.zeros(B, np.float32)
    scales = np.ones(B, np.float32)
    lps = np.zeros((B, 4), np.float64)   # skip, stay, step, trim
    lps[:, 0] = np.log(1e-10)
    lps[:, 1] = np.log(0.5)
    lps[:, 2] = np.log(1.0 - 1e-10 - 0.5)
    lps[:, 3] = np.log(0.01)
    for i, (s, et) in enumerate(zip(seqs, event_tables)):
        ranks[i, :n_km[i]] = kmer_ranks(s)
        ev_mean[i, :n_ev[i]] = et[:, 2].astype(np.float32)
        sh, sc = estimate_scalings(s, et, model)
        shifts[i], scales[i] = sh, sc
        epk = float(n_ev[i]) / float(n_km[i])
        p_stay = 1 - (1 / (epk + 1))
        lp_skip = np.log(1e-10)
        lp_stay = np.log(p_stay)
        lp_step = np.log(1.0 - np.exp(lp_skip) - np.exp(lp_stay))
        lps[i] = (lp_skip, lp_stay, lp_step, np.log(0.01))

    (ranks_j, ev_mean_j, n_ev_j, n_km_j, shifts_j, scales_j, lp0, lp1,
     lp2, lp3) = shard_args(
        mesh, ranks, ev_mean, n_ev, n_km, shifts, scales,
        np.ascontiguousarray(lps[:, 0]), np.ascontiguousarray(lps[:, 1]),
        np.ascontiguousarray(lps[:, 2]), np.ascontiguousarray(lps[:, 3]))
    with jax.enable_x64():
        bands, traces, blls = _band_scan_device(
            jnp.asarray(ranks_j), jnp.asarray(ev_mean_j),
            jnp.asarray(n_ev_j), jnp.asarray(n_km_j),
            jnp.asarray(shifts_j), jnp.asarray(scales_j),
            jnp.asarray(model["level_mean"]),
            jnp.asarray(model["level_stdv"]),
            jnp.asarray(model["level_log_stdv"]),
            jnp.asarray(lp0), jnp.asarray(lp1),
            jnp.asarray(lp2), jnp.asarray(lp3),
            NB=NB, NE=NE, NK=NK)
        # backtrace on device too: bands/traces stay in HBM, only the
        # (B, T) trace codes + per-lane QC scalars come back
        T = NB
        fr_out, e0, n_al, sum_em, mgap, k_last = (
            np.asarray(x) for x in _abea_backtrace_device(
                bands, traces, blls, jnp.asarray(ranks_j),
                jnp.asarray(ev_mean_j), jnp.asarray(n_ev_j),
                jnp.asarray(n_km_j), jnp.asarray(shifts_j),
                jnp.asarray(scales_j),
                jnp.asarray(model["level_mean"]),
                jnp.asarray(model["level_stdv"]),
                jnp.asarray(model["level_log_stdv"]),
                jnp.asarray(lp3), NB=NB, NE=NE, NK=NK, T=T))

    results = []
    for i in range(B0):
        nal = int(n_al[i])
        if nal == 0:
            results.append([])
            continue
        frs = fr_out[i, :nal].astype(np.int32)
        dk = (frs != 1).astype(np.int32)
        de = (frs != 2).astype(np.int32)
        ks = (n_km[i] - 1) - (np.cumsum(dk) - dk)    # k before each move
        es = int(e0[i]) - (np.cumsum(de) - de)
        avg = float(sum_em[i]) / nal
        spanned = int(k_last[i]) == 0 and int(ks[0]) == n_km[i] - 1
        if avg < -5.0 or not spanned or int(mgap[i]) > 50:
            results.append([])
            continue
        results.append(list(zip(ks[::-1].tolist(), es[::-1].tolist())))
    return results


def _backtrace_one(bands, traces, blls, ne, nk, seq, ev_mean, model,
                   shift, scale, lps) -> List[Tuple[int, int]]:
    """align.c backtrack (:408-545) + QC."""
    lp_skip, lp_stay, lp_step, lp_trim = lps
    n_bands = ne + nk + 2
    curr_k = nk - 1
    max_score = -np.inf
    curr_e = 0
    for ei in range(ne):
        bi = (ei + 1) + (curr_k + 1)
        off = int(blls[bi, 0]) - ei
        if 0 <= off < BANDWIDTH:
            s = float(bands[bi, off]) + (ne - ei) * lp_trim
            if s > max_score:
                max_score = s
                curr_e = ei
    rank_arr = kmer_ranks(seq)
    out = []
    sum_em = 0.0
    n_al = 0
    curr_gap = 0
    max_gap = 0
    while curr_k >= 0 and curr_e >= 0:
        out.append((curr_k, curr_e))
        kr = int(rank_arr[curr_k])
        gp_mean = np.float32(scale * model["level_mean"][kr] + shift)
        gp_stdv = model["level_stdv"][kr]
        a = np.float32((ev_mean[curr_e] - gp_mean) / gp_stdv)
        sum_em += float(np.float32(-0.918938)
                        - model["level_log_stdv"][kr]
                        + np.float32(-0.5) * a * a)
        n_al += 1
        bi = (curr_e + 1) + (curr_k + 1)
        off = int(blls[bi, 0]) - curr_e
        fr = traces[bi, off]
        if fr == 0:
            curr_k -= 1
            curr_e -= 1
            curr_gap = 0
        elif fr == 1:
            curr_e -= 1
            curr_gap = 0
        else:
            curr_k -= 1
            curr_gap += 1
            max_gap = max(curr_gap, max_gap)
    out.reverse()
    if not out:
        return []
    avg = sum_em / max(n_al, 1)
    spanned = out[0][0] == 0 and out[-1][0] == nk - 1
    if avg < -5.0 or not spanned or max_gap > 50:
        return []
    return out


# ---------------------------------------------------------------------------
# eventalign output + CLI
# ---------------------------------------------------------------------------

EVENTALIGN_HEADER = ("contig\tposition\treference_kmer\tread_index\t"
                     "strand\tevent_index\tevent_level_mean\t"
                     "event_stdv\tevent_length\tmodel_kmer\t"
                     "model_mean\tmodel_stdv\tstandardized_level\n")


def write_eventalign(out, contig, ref_start, seq, pairs, events, model,
                     shift, scale, read_index, sample_rate=4000.0):
    """nanopolish-style eventalign rows; the benchmark's tolerant check
    compares columns 3 (reference_kmer) and 10 (model_kmer)."""
    for (ki, ei) in pairs:
        kmer = seq[ki:ki + KMER]
        kr = int(kmer_ranks(kmer)[0]) if len(kmer) == KMER else 0
        mm = scale * model["level_mean"][kr] + shift
        ms = model["level_stdv"][kr]
        lv = events[ei, 2]
        std_lv = (lv - mm) / ms
        out.write(f"{contig}\t{ref_start + ki}\t{kmer}\t{read_index}\t"
                  f"t\t{ei}\t{lv:.2f}\t{events[ei, 3]:.3f}\t"
                  f"{events[ei, 1] / sample_rate:.5f}\t{kmer}\t"
                  f"{mm:.2f}\t{ms:.2f}\t{std_lv:.2f}\n")


def _load_signal_fn(signals_arg: str):
    """Resolve `-r`: an f5c-indexed reads file (fast5 via
    <reads>.index.readdb, the reference's input contract,
    nanopolish_read_db.c:83-91) or a directory of <qname>.npy arrays."""
    import os
    from genarchbench_tpu.io.fast5_io import Fast5Index

    if os.path.isdir(signals_arg):
        def from_dir(qname: str):
            p = os.path.join(signals_arg, f"{qname}.npy")
            if not os.path.exists(p):
                return None
            return np.load(p).astype(np.float32)
        return from_dir
    idx = (Fast5Index(signals_arg)
           if signals_arg.endswith(".readdb")
           else Fast5Index.for_reads(signals_arg))
    return idx.signal


def run(argv: Sequence[str]) -> int:
    """eventalign pipeline: -b bam -g ref.fa -r reads --kmer-model
    model.txt [-o out.tsv].  `-r` takes the f5c form — a reads file with
    `<reads>.index.readdb` beside it locating fast5 signal files
    (abea/README.md:22-28) — or a directory of <qname>.npy arrays.

    Batches are double-buffered like the reference's interleaved
    load_db/process_db/output_db pipeline (meth_main.c:12-27,517-570):
    a loader thread reads signals and detects events for batch i+1
    while batch i's band scan runs on device, and rows are written as
    each batch completes."""
    import argparse
    from concurrent.futures import ThreadPoolExecutor
    from genarchbench_tpu.io.bam_io import read_bam
    p = argparse.ArgumentParser(prog="abea")
    p.add_argument("-b", dest="bam", required=True)
    p.add_argument("-g", dest="ref", required=True)
    p.add_argument("-r", dest="signals", required=True)
    p.add_argument("--kmer-model", dest="model", required=True)
    p.add_argument("-o", dest="output", default=None)
    p.add_argument("-t", dest="threads", type=int, default=1)
    p.add_argument("-K", dest="batch", type=int, default=512)
    args = p.parse_args(argv)

    model = load_model(args.model)
    refs, records = read_bam(args.bam)
    contigs: Dict[str, str] = {}
    with open(args.ref) as f:
        name, cur = None, []
        for line in f:
            line = line.rstrip()
            if line.startswith(">"):
                if name:
                    contigs[name] = "".join(cur)
                name, cur = line[1:].split()[0], []
            else:
                cur.append(line)
        if name:
            contigs[name] = "".join(cur)

    get_signal = _load_signal_fn(args.signals)
    jobs = []
    for idx, r in enumerate(records):
        if r.flag & 0x904 or r.ref_id < 0:
            continue
        contig = refs[r.ref_id][0]
        span = r.ref_span()
        ref_seq = contigs[contig][r.pos:r.pos + span]
        if len(ref_seq) < KMER:
            continue
        jobs.append((idx, r.qname, contig, r.pos, ref_seq))

    from genarchbench_tpu.sharding.mesh import data_mesh
    mesh = data_mesh()
    out = open(args.output, "w") if args.output else sys.stdout
    out.write(EVENTALIGN_HEADER)

    def load_batch(b0: int):
        """stage 1 (host): signal load + event detection (load_db +
        event_single's host half)."""
        chunk, evs = [], []
        for job in jobs[b0:b0 + args.batch]:
            raw = get_signal(job[1])
            if raw is None:
                continue
            chunk.append(job)
            evs.append(get_events(raw))
        return chunk, evs

    def emit_batch(chunk, evs, pairs):
        """stage 3 (host): postprocess + eventalign TSV rows
        (output_db, meth_main.c:166-186)."""
        for (idx, _, contig, pos, sq), et, pr in zip(chunk, evs, pairs):
            sh, sc = estimate_scalings(sq, et, model)
            write_eventalign(out, contig, pos, sq, pr, et, model,
                             sh, sc, idx)

    roi = ROITimer("abea", "Data processing time: {t:.3f} sec")
    # full 3-stage pipeline (meth_main.c:12-27,517-570): the loader
    # thread reads batch i+1, the main thread runs batch i's band scan
    # on device, and the writer thread emits batch i-1 — three batches
    # in flight, like the reference's double-buffered DB pair with its
    # separate processor/post-processor pthreads
    with roi, ThreadPoolExecutor(max_workers=1) as pool, \
            ThreadPoolExecutor(max_workers=1) as wpool:
        nxt = pool.submit(load_batch, 0) if jobs else None
        for b0 in range(0, len(jobs), args.batch):
            chunk, evs = nxt.result()
            n1 = b0 + args.batch
            nxt = (pool.submit(load_batch, n1)
                   if n1 < len(jobs) else None)
            if not chunk:
                continue
            seqs = [sq for (_, _, _, _, sq) in chunk]
            pairs = align_batch(seqs, evs, model, mesh=mesh)
            wpool.submit(emit_batch, chunk, evs, pairs)
        # context exit joins the writer queue before the file closes
    if args.output:
        out.close()
    roi.report()
    return 0


if __name__ == "__main__":
    sys.exit(run(sys.argv[1:]))
