"""fmi: FM-index super-maximal exact match (SMEM) search — TPU-native.

Reference semantics: fmi/fmi.cpp driver (3-pass loop :250-360, output
:429-461) over bwa-mem2's FMI_search
(bwa-mem2/sve/src/FMI_search.cpp): all-SMEM pass
`getSMEMsAllPosOneThread` :915, reseed `getSMEMsOnePosOneThread` :498,
LAST pass `bwtSeedStrategyAllPosOneThread` :975, `backwardExt`
:1268-1298 with the 64-entry checkpointed occ + one-hot BWT popcount
(GET_OCC, FMI_search.h:71-79), `sortSMEMs`/compare_smem (rid asc, m
asc, n desc) :1230-1265, and the index layout of build_index /
build_fm_index (:~200-400: reference = forward + reverse complement,
sentinel-first suffix array, BWT char 4 at the sentinel row).

TPU-first design:
  * the per-read pointer-chasing search becomes a LOCKSTEP batch: all
    reads advance one query position per step, and every backwardExt in
    flight becomes a (batch,) or (batch, P) vector of table gathers +
    popcounts — the TPU formulation of bwa-mem2's software-prefetch
    batching.
  * the backward pass's sequential scan over the prev-interval stack is
    vectorized over P: all P candidate extensions run at once, the
    first-hit / dedup-by-s logic is reconstructed with masked argmax +
    an associative "last eligible" scan.
  * occ tables live in HBM as (ncp, 4) int32 counts + two uint32
    one-hot words; popcounts use `lax.population_count`.
  * index build is a host-side artifact step (SURVEY §5.4): suffix
    array by prefix-doubling (np.lexsort), serialized as .npz.

Current limit: int32 row indices (references up to ~1 Gbp); the
multi-chip path for larger references shards reads data-parallel with
the tables replicated (they are small: 16 bytes + 32 one-hot bytes per
64 bases).
"""

from __future__ import annotations

import dataclasses
import sys
from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from genarchbench_tpu.core.roi import ROITimer

CP_SHIFT = 6
CP_MASK = 63
SPLIT_WIDTH = 10
FMI_UNROLL = 4       # extension steps per while-loop iteration (the
                     # lockstep loops are fixed-cost-per-iteration
                     # bound on this backend; masked lanes no-op)
MAX_MEM_INTV = 20
SPLIT_FACTOR = 1.5

_ENC = np.full(256, 4, np.uint8)
for _i, _c in enumerate("ACGT"):
    _ENC[ord(_c)] = _i


# ---------------------------------------------------------------------------
# index build (host artifact)
# ---------------------------------------------------------------------------

def _suffix_array(codes: np.ndarray) -> np.ndarray:
    """Suffix array: linear-time SA-IS in native C (native/sais.c —
    scales to genome-size references like the reference's own O(n)
    builder, FMI_search.cpp:162-298); prefix doubling as the pure-
    Python fallback."""
    from genarchbench_tpu import native
    sa = native.sais_native(codes.astype(np.uint8))
    if sa is not None:
        return sa
    n = len(codes)
    rank = codes.astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    k = 1
    while k < n:
        rank2 = np.full(n, -1, np.int64)
        rank2[:-k] = rank[k:]
        order = np.lexsort((rank2, rank))
        newr = np.zeros(n, np.int64)
        r1 = rank[order]
        r2 = rank2[order]
        change = np.ones(n, bool)
        change[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        newr[order] = np.cumsum(change) - 1
        rank = newr
        sa = order
        if rank[order[-1]] == n - 1:
            break
        k *= 2
    return sa


@dataclasses.dataclass
class FMIndex:
    count: np.ndarray          # (5,) cumulative char counts (count[0]=0)
    cp_count: np.ndarray       # (ncp, 4) int32
    oh_hi: np.ndarray          # (ncp, 4) uint32 one-hot bits 0..31 (MSB first)
    oh_lo: np.ndarray          # (ncp, 4) uint32 bits 32..63
    sentinel: int
    seq_len: int               # 2L + 1 (bwt length incl sentinel)

    def save(self, path: str) -> None:
        np.savez(path, count=self.count, cp_count=self.cp_count,
                 oh_hi=self.oh_hi, oh_lo=self.oh_lo,
                 sentinel=self.sentinel, seq_len=self.seq_len)

    @classmethod
    def load(cls, path: str) -> "FMIndex":
        z = np.load(path)
        return cls(z["count"], z["cp_count"], z["oh_hi"], z["oh_lo"],
                   int(z["sentinel"]), int(z["seq_len"]))

    @classmethod
    def load_bwt2bit64(cls, path: str) -> "FMIndex":
        """Load a prebuilt bwa-mem2 `<prefix>.bwt.2bit.64` index — the
        dataset's artifact format (written by build_fm_index,
        x86_64/src/FMI_search.cpp:162-298; read by load_index :384).

        Layout: int64 seq_len (2L+1, sentinel row included); int64
        count[5] (cumulative, un-shifted — load_index adds +1);
        CP_OCC[(seq_len>>6)+1] = {int64 cp_count[4]; uint64 one_hot[4]};
        then the sampled suffix array (int8 ms-bytes + uint32 ls-words,
        1/8 sampling under SA_COMPRESSION, else full length) and a final
        int64 sentinel_index.  The SA is skipped: SMEM output is query
        intervals, never reference positions (fmi.cpp:429-461)."""
        import os
        fsize = os.path.getsize(path)
        with open(path, "rb") as f:
            seq_len = int(np.fromfile(f, "<i8", 1)[0])
            if not 0 < seq_len <= 0x7FFFFFFF:
                # the in-memory tables hold rows as int32; the format
                # itself allows up to 2^39-1 (bwa-mem2 macro.h) but
                # loading such an index would silently wrap the casts
                raise ValueError(
                    f"reference too large for int32 occ rows: {seq_len} "
                    "(only references under 2^31 rows are loadable)")
            count = (np.fromfile(f, "<i8", 5) + 1).astype(np.int32)
            ncp = (seq_len >> CP_SHIFT) + 1
            rec = np.dtype([("cnt", "<i8", (4,)), ("oh", "<u8", (4,))])
            cp = np.fromfile(f, rec, ncp)
            header = 8 + 40 + ncp * 64
            n_comp = (seq_len >> 3) + 1
            if fsize == header + n_comp * 5 + 8:      # SA_COMPRESSION
                f.seek(n_comp * 5, 1)
                sentinel = int(np.fromfile(f, "<i8", 1)[0])
            elif fsize == header + seq_len * 5:
                # full SA (no SA_COMPRESSION): the reference writes no
                # trailing sentinel int64 (FMI_search.cpp writes it only
                # under #if SA_COMPRESSION) — derive it: the sentinel
                # row is the one whose suffix starts at position 0
                ms = np.fromfile(f, "<i1", seq_len)
                ls = np.fromfile(f, "<u4", seq_len)
                zero = np.flatnonzero((ms == 0) & (ls == 0))
                if len(zero) != 1:
                    raise ValueError(
                        f"full-SA index has {len(zero)} zero entries; "
                        "cannot derive the sentinel row")
                sentinel = int(zero[0])
            else:
                raise ValueError(f"unrecognized index size {fsize}")
        oh = cp["oh"]
        return cls(count, cp["cnt"].astype(np.int32),
                   (oh >> np.uint64(32)).astype(np.uint32),
                   (oh & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                   sentinel, seq_len)


def build_index(ref_codes: np.ndarray) -> FMIndex:
    """ref_codes: forward reference 2-bit codes (0..3).  Builds the
    bi-directional index over forward + reverse complement
    (FMI_search::pac2nt + build_index + build_fm_index)."""
    return build_index_artifacts(ref_codes)[0]


def build_index_artifacts(
        ref_codes: np.ndarray) -> Tuple[FMIndex, np.ndarray]:
    """build_index plus the sentinel-first suffix array (needed only to
    serialize the bwa-mem2 on-disk format, save_bwt2bit64)."""
    fwd = ref_codes.astype(np.uint8)
    rc = (3 - fwd)[::-1]
    seq = np.concatenate([fwd, rc])
    n = len(seq)

    counts = np.bincount(seq, minlength=4)
    count = np.zeros(5, np.int64)
    count[1:] = np.cumsum(counts)
    # load_index's sentinel correction: count[i] += 1 for every entry
    # (x86_64/src/FMI_search.cpp load_index), making count[a] the true
    # sentinel-first SA row where char a's suffix block starts
    count += 1

    sa = _suffix_array(seq)
    sa_full = np.concatenate([[n], sa])            # sentinel-first

    bwt = np.full(n + 1, 4, np.uint8)
    nz = sa_full > 0
    bwt[nz] = seq[sa_full[nz] - 1]
    sentinel = int(np.nonzero(sa_full == 0)[0][0])

    blen = n + 1
    ncp = (blen >> CP_SHIFT) + 1
    pad = ncp * 64
    bwt_p = np.full(pad, 5, np.uint8)
    bwt_p[:blen] = bwt
    onehot = (bwt_p.reshape(ncp, 64)[:, :, None]
              == np.arange(4, dtype=np.uint8))     # (ncp, 64, 4)
    # cumulative counts at block starts
    per_block = onehot.sum(axis=1)                 # (ncp, 4)
    cp_count = np.zeros((ncp, 4), np.int64)
    cp_count[1:] = np.cumsum(per_block, axis=0)[:-1]
    # one-hot words, MSB-first within the 64-base block
    bits = (np.uint64(1) << np.uint64(63 - np.arange(64)))
    words = np.where(onehot, bits[None, :, None], np.uint64(0))
    words = np.bitwise_or.reduce(words, axis=1)    # (ncp, 4) uint64
    oh_hi = (words >> np.uint64(32)).astype(np.uint32)
    oh_lo = (words & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    return (FMIndex(count.astype(np.int32), cp_count.astype(np.int32),
                    oh_hi, oh_lo, sentinel, blen), sa_full)


def save_bwt2bit64(fmi: FMIndex, sa_full: np.ndarray, path: str) -> None:
    """Serialize in the bwa-mem2 on-disk format (byte-identical to
    build_fm_index's output, x86_64/src/FMI_search.cpp:162-298) so
    indexes built here are loadable by the reference binaries and vice
    versa.  SA_COMPRESSION layout (1/8 sampling, macro.h:64-68)."""
    with open(path, "wb") as f:
        np.int64(fmi.seq_len).tofile(f)
        (fmi.count.astype(np.int64) - 1).tofile(f)      # un-shift the +1
        rec = np.dtype([("cnt", "<i8", (4,)), ("oh", "<u8", (4,))])
        cp = np.zeros(len(fmi.cp_count), rec)
        cp["cnt"] = fmi.cp_count.astype(np.int64)
        cp["oh"] = ((fmi.oh_hi.astype(np.uint64) << np.uint64(32))
                    | fmi.oh_lo.astype(np.uint64))
        cp.tofile(f)
        sampled = sa_full[::8].astype(np.int64)
        if len(sampled) < (fmi.seq_len >> 3) + 1:       # trailing slot
            sampled = np.concatenate([sampled, [0]])
        ((sampled >> 32) & 0xFF).astype(np.int8).tofile(f)
        (sampled & 0xFFFFFFFF).astype(np.uint32).tofile(f)
        np.int64(fmi.sentinel).tofile(f)


def build_index_from_fasta(path: str) -> FMIndex:
    seqs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith(">"):
                seqs.append(_ENC[np.frombuffer(line.encode(), np.uint8)])
    codes = np.concatenate(seqs)
    if (codes > 3).any():
        raise ValueError("reference contains non-ACGT bases "
                         "(bwa's random N-conversion not replicated)")
    return build_index(codes)


# ---------------------------------------------------------------------------
# device search engine
# ---------------------------------------------------------------------------

def _occ4(occtab, pp):
    """occ(pp, b) for ALL four chars at once (GET_OCC).  occtab is the
    packed (ncp, 12) uint32 checkpoint table [cnt0..3 | hi0..3 |
    lo0..3]: ONE contiguous row-gather per position instead of 12
    scattered 4-byte gathers — the backward pass runs this over
    (B, Pmax) positions per step, and scattered-gather HBM traffic was
    the round-3/4 pass-1 wall."""
    u32 = jnp.uint32
    cid = pp >> CP_SHIFT
    y = (pp & CP_MASK).astype(jnp.int32)
    row = jnp.take(occtab, cid, axis=0)          # (..., 12)
    cnt = row[..., 0:4].astype(jnp.int32)
    hi = row[..., 4:8]
    lo = row[..., 8:12]
    t_hi = jnp.clip(y, 0, 32)[..., None]
    t_lo = jnp.clip(y - 32, 0, 32)[..., None]
    ones = jnp.uint32(0xFFFFFFFF)
    m_hi = jnp.where(t_hi > 0, ones << (32 - t_hi).astype(u32), u32(0))
    m_lo = jnp.where(t_lo > 0, ones << (32 - t_lo).astype(u32), u32(0))
    pc = (lax.population_count(hi & m_hi)
          + lax.population_count(lo & m_lo)).astype(jnp.int32)
    return cnt + pc                               # (..., 4)


def _backward_ext(idx, k, l, s, a):
    """Vectorized backwardExt (FMI_search.cpp:1268-1298).  idx = tuple
    (count5, occtab, sentinel)."""
    count5, occtab, sentinel = idx
    a = jnp.clip(a, 0, 3)
    osp = _occ4(occtab, k)                        # (..., 4)
    oep = _occ4(occtab, k + s)
    kk4 = count5[:4] + osp
    ss4 = oep - osp
    sent = ((k <= sentinel) & (k + s > sentinel)).astype(jnp.int32)
    l3 = l + sent
    l2 = l3 + ss4[..., 3]
    l1 = l2 + ss4[..., 2]
    l0 = l1 + ss4[..., 1]
    ll = [l0, l1, l2, l3]
    sel4 = lambda t: jnp.take_along_axis(
        t, a[..., None], axis=-1)[..., 0]
    sel = lambda vs: jnp.where(a == 0, vs[0], jnp.where(
        a == 1, vs[1], jnp.where(a == 2, vs[2], vs[3])))
    return sel4(kk4), sel(ll), sel4(ss4)


def _qchar(qdb, off, j, valid):
    """qdb flat gather with bounds guard: returns 4 (ambig) when invalid."""
    idx = jnp.clip(off + j, 0, qdb.shape[0] - 1)
    c = jnp.take(qdb, idx)
    return jnp.where(valid, c, 4)


def _last_eligible_scan(elig, val):
    """For each p: value of the last eligible index < p (or -1)."""
    B, P = elig.shape
    vals = jnp.where(elig, val, -1)

    def comb(a, b):
        av, bv = a, b
        return jnp.where(bv >= 0, bv, av)

    run = lax.associative_scan(comb, vals, axis=1)
    prev = jnp.concatenate([jnp.full((B, 1), -1, run.dtype),
                            run[:, :-1]], axis=1)
    return prev


def _onepos_core(idx, qdb, qoff, qlen, x0, min_intv, active0,
                 Lmax, Pmax, min_seed, emit_cap, em, en, es, ec):
    """One getSMEMsOnePosOneThread step for a batch of lanes,
    accumulating into the passed emission buffers (em, en, es (B,
    emit_cap), ec (B,)) so the AllPos restart loop can run entirely
    on device.  Returns (em, en, es, ec, next_x, ovf) where ovf is a
    per-lane flag set when the Pmax prev-list width overflowed (the
    caller reruns those shapes at full width)."""
    B = x0.shape[0]
    i32 = jnp.int32
    count5 = idx[0]

    a0 = _qchar(qdb, qoff, x0, active0 & (x0 < qlen))
    lane_on = active0 & (a0 < 4)

    k0 = jnp.take(count5, jnp.clip(a0, 0, 3))
    l0 = jnp.take(count5, jnp.clip(3 - a0, 0, 3))
    s0 = jnp.take(count5, jnp.clip(a0, 0, 3) + 1) - k0

    # ---- forward extension ----
    pm = jnp.zeros((B, Pmax), i32)
    pn = jnp.zeros((B, Pmax), i32)
    pk = jnp.zeros((B, Pmax), i32)
    pl = jnp.zeros((B, Pmax), i32)
    ps = jnp.zeros((B, Pmax), i32)
    npv = jnp.zeros((B,), i32)

    def push(bufs, npv, vals, mask):
        slots = lax.broadcasted_iota(i32, (B, Pmax), 1)
        at = slots == npv[:, None]
        out = []
        for buf, v in zip(bufs, vals):
            out.append(jnp.where(at & mask[:, None], v[:, None], buf))
        return out, npv + mask.astype(i32)

    def fwd_body(carry):
        (m, n, k, l, s, pm, pn, pk, pl, ps, npv, nx, on, j) = carry
        jj = x0 + j
        valid = on & (jj < qlen)
        a = _qchar(qdb, qoff, jj, valid)
        good = valid & (a < 4)
        nx = jnp.where(valid & ~good, jj + 1, nx)       # char break
        # forward ext = backward ext on revcomp side (k/l swapped)
        nk, nl, ns = _backward_ext(idx, l, k, s, 3 - a)
        nk, nl = nl, nk
        s_neq = good & (ns != s)
        (pm, pn, pk, pl, ps), npv = push(
            (pm, pn, pk, pl, ps), npv, (m, n, k, l, s), s_neq)
        die = good & (ns < min_intv)
        nx = jnp.where(die, jj, nx)
        grow = good & ~die
        m = m
        n = jnp.where(grow, jj, n)
        k = jnp.where(grow, nk, k)
        l = jnp.where(grow, nl, l)
        s = jnp.where(grow, ns, s)
        nx = jnp.where(grow, jj + 1, nx)
        on = on & grow
        return (m, n, k, l, s, pm, pn, pk, pl, ps, npv, nx, on, j + 1)

    def fwd_cond(carry):
        return jnp.any(carry[12])

    def fwd_block(carry):
        for _ in range(FMI_UNROLL):
            carry = fwd_body(carry)
        return carry

    m = x0
    n = x0
    carry = (m, n, k0, l0, s0, pm, pn, pk, pl, ps, npv,
             x0 + 1, lane_on, jnp.asarray(1, i32))
    (m, n, k, l, s, pm, pn, pk, pl, ps, npv, next_x, _, _) = \
        lax.while_loop(fwd_cond, fwd_block, carry)

    # final forward push: if smem.s >= min_intv
    fin = lane_on & (s >= min_intv)
    (pm, pn, pk, pl, ps), npv = push(
        (pm, pn, pk, pl, ps), npv, (m, n, k, l, s), fin)
    # push() drops entries past Pmax but keeps counting: detectable
    ovf = lane_on & (npv > Pmax)

    # reverse the first npv entries
    slots = lax.broadcasted_iota(i32, (B, Pmax), 1)
    ridx = jnp.clip(npv[:, None] - 1 - slots, 0, Pmax - 1)
    inpv = slots < npv[:, None]
    rev = lambda b: jnp.where(inpv, jnp.take_along_axis(b, ridx, 1), b)
    pm, pn, pk, pl, ps = rev(pm), rev(pn), rev(pk), rev(pl), rev(ps)

    # ---- backward search ----
    def emit(bufs, ec, vals, mask):
        slots2 = lax.broadcasted_iota(i32, (B, emit_cap), 1)
        at = slots2 == ec[:, None]
        out = []
        for buf, v in zip(bufs, vals):
            out.append(jnp.where(at & mask[:, None], v[:, None], buf))
        return out, ec + mask.astype(i32)

    def bwd_body(carry):
        (pm, pn, pk, pl, ps, npv, on, j, em, en, es, ec) = carry
        jj = x0 - j
        valid = on & (jj >= 0)
        a = _qchar(qdb, qoff, jj, valid)
        good = valid & (a < 4)
        # stop lanes keep npv for the final emission
        inp = slots < npv[:, None]
        nk, nl, ns = _backward_ext(idx, pk, pl, ps, a[:, None])
        plen = pn - pm + 1
        condA = inp & (ns < min_intv[:, None]) & (plen >= min_seed)
        condB = inp & (ns >= min_intv[:, None])
        first = condA | condB
        has0 = jnp.any(first, axis=1)
        p0 = jnp.argmax(first, axis=1)
        isA = has0 & jnp.take_along_axis(condA, p0[:, None], 1)[:, 0]
        # emit prev[p0]
        gat = lambda b: jnp.take_along_axis(b, p0[:, None], 1)[:, 0]
        (em, en, es), ec = emit((em, en, es), ec,
                                (gat(pm), gat(pn), gat(ps)),
                                good & isA)
        # pushes: eligible p >= p0 (> p0 when condA), s-dedup vs last
        pge = slots >= p0[:, None] + isA.astype(i32)[:, None]
        elig = condB & pge & has0[:, None]
        prev_s = _last_eligible_scan(elig, ns)
        push_p = elig & (ns != prev_s)
        # compact pushed entries (stable) to the front; pushed entry is
        # newSmem = (m=jj, n=prev n, k/l/s = extended).  GATHER-based:
        # perm[t] = source slot of the t-th pushed entry via a one-hot
        # cumsum match — the previous 5 scatter-writes per step were
        # the pass-1 wall (scatter is the slowest op class on TPU)
        csum = jnp.cumsum(push_p.astype(i32), axis=1)
        ncur = csum[:, -1]
        t_iota = lax.broadcasted_iota(i32, (B, Pmax, Pmax), 1)
        j_iota = lax.broadcasted_iota(i32, (B, Pmax, Pmax), 2)
        E = push_p[:, None, :] & (csum[:, None, :] == t_iota + 1)
        perm = jnp.where(E, j_iota, 0).sum(axis=2)
        hasrow = jnp.any(E, axis=2)

        def compact(vals):
            g = jnp.take_along_axis(vals, perm, axis=1)
            return jnp.where(hasrow, g, 0)

        npm = jnp.where(hasrow, jj[:, None], 0)
        npn = compact(pn)
        npk = compact(nk)
        npl = compact(nl)
        nps = compact(ns)

        upd = good
        pm2 = jnp.where(upd[:, None], npm, pm)
        pn2 = jnp.where(upd[:, None], npn, pn)
        pk2 = jnp.where(upd[:, None], npk, pk)
        pl2 = jnp.where(upd[:, None], npl, pl)
        ps2 = jnp.where(upd[:, None], nps, ps)
        npv2 = jnp.where(upd, ncur, npv)
        on2 = on & good & (ncur > 0)
        return (pm2, pn2, pk2, pl2, ps2, npv2, on2, j + 1,
                em, en, es, ec)

    def bwd_cond(carry):
        return jnp.any(carry[6])

    def bwd_block(carry):
        for _ in range(FMI_UNROLL):
            carry = bwd_body(carry)
        return carry

    bwd_on = lane_on
    carry = (pm, pn, pk, pl, ps, npv, bwd_on, jnp.asarray(1, i32),
             em, en, es, ec)
    (pm, pn, pk, pl, ps, npv, _, _, em, en, es, ec) = \
        lax.while_loop(bwd_cond, bwd_block, carry)

    # final: emit prev[0] if it meets min_seed (numPrev != 0 lanes)
    fmask = lane_on & (npv > 0) & ((pn[:, 0] - pm[:, 0] + 1) >= min_seed)
    (em, en, es), ec = emit((em, en, es), ec,
                            (pm[:, 0], pn[:, 0], ps[:, 0]), fmask)

    return em, en, es, ec, next_x, ovf


@partial(jax.jit, static_argnames=("Lmax", "Pmax", "min_seed", "emit_cap",
                                   "out_w"))
def _onepos_device(count5, occtab, sentinel,
                   qdb, qoff, qlen, x0, min_intv, active0,
                   Lmax, Pmax, min_seed, emit_cap, out_w):
    """Single OnePos call (reseed pass, fmi.cpp:318-324)."""
    B = x0.shape[0]
    i32 = jnp.int32
    idx = (count5, occtab, sentinel)
    z = lambda: jnp.zeros((B, emit_cap), i32)
    em, en, es, ec, nx, ovf = _onepos_core(
        idx, qdb, qoff, qlen, x0, min_intv, active0,
        Lmax, Pmax, min_seed, emit_cap, z(), z(), z(),
        jnp.zeros((B,), i32))
    ovf_any = jnp.any(ovf) | jnp.any(ec > out_w)
    return em[:, :out_w], en[:, :out_w], es[:, :out_w], ec, nx, ovf_any


@partial(jax.jit, static_argnames=("Lmax", "Pmax", "min_seed", "emit_cap",
                                   "out_w"))
def _allpos_device(count5, occtab, sentinel,
                   qdb, qoff, qlen, min_intv, active0,
                   Lmax, Pmax, min_seed, emit_cap, out_w):
    """getSMEMsAllPosOneThread (FMI_search.cpp:915-968) for a batch:
    the restart-position loop (x = next_x until x >= qlen) runs INSIDE
    the device program — one dispatch and one narrow d2h per batch
    instead of one round trip per restart position (the round-3 host
    loop shipped ~50 MB per restart over a ~100 MB/s link and never
    finished the bench input)."""
    B = qoff.shape[0]
    i32 = jnp.int32
    idx = (count5, occtab, sentinel)

    def cond(c):
        return jnp.any(c[0])

    def body(c):
        act, x, em, en, es, ec, ovf = c
        em, en, es, ec, nx, ovf1 = _onepos_core(
            idx, qdb, qoff, qlen, x, min_intv, act,
            Lmax, Pmax, min_seed, emit_cap, em, en, es, ec)
        nx = jnp.maximum(nx, x + 1)
        return (act & (nx < qlen), nx, em, en, es, ec, ovf | ovf1)

    z = lambda: jnp.zeros((B, emit_cap), i32)
    act0 = active0 & (qlen > 0)
    (_, _, em, en, es, ec, ovf) = lax.while_loop(
        cond, body, (act0, jnp.zeros((B,), i32), z(), z(), z(),
                     jnp.zeros((B,), i32), jnp.zeros((B,), bool)))
    ovf_any = jnp.any(ovf) | jnp.any(ec > out_w)
    return em[:, :out_w], en[:, :out_w], es[:, :out_w], ec, ovf_any


@partial(jax.jit, static_argnames=("min_seed", "emit_cap"))
def _bwt_seed_device(count5, occtab, sentinel,
                     qdb, qoff, qlen, max_intv, min_seed, emit_cap):
    """bwtSeedStrategyAllPosOneThread for a batch
    (FMI_search.cpp:975-1075): forward-only sweep, emit the first
    interval that drops under max_intv at length >= min_seed."""
    B = qoff.shape[0]
    i32 = jnp.int32
    idx = (count5, occtab, sentinel)

    em = jnp.zeros((B, emit_cap), i32)
    en = jnp.zeros((B, emit_cap), i32)
    es = jnp.zeros((B, emit_cap), i32)
    ec = jnp.zeros((B,), i32)

    def emit(bufs, ec, vals, mask):
        slots2 = lax.broadcasted_iota(i32, (B, emit_cap), 1)
        at = slots2 == ec[:, None]
        out = []
        for buf, v in zip(bufs, vals):
            out.append(jnp.where(at & mask[:, None], v[:, None], buf))
        return out, ec + mask.astype(i32)

    def outer_cond(carry):
        x, em, en, es, ec = carry
        return jnp.any(x < qlen)

    def outer_body(carry):
        x, em, en, es, ec = carry
        on0 = x < qlen
        a0 = _qchar(qdb, qoff, x, on0)
        on = on0 & (a0 < 4)
        k = jnp.take(count5, jnp.clip(a0, 0, 3))
        l = jnp.take(count5, jnp.clip(3 - a0, 0, 3))
        s = jnp.take(count5, jnp.clip(a0, 0, 3) + 1) - k
        nx = x + 1

        def inner_cond(c):
            return jnp.any(c[5])

        def inner_body(c):
            (k, l, s, nx, j, on, em, en, es, ec) = c
            jj = x + j
            valid = on & (jj < qlen)
            a = _qchar(qdb, qoff, jj, valid)
            good = valid & (a < 4)
            nx = jnp.where(valid, jj + 1, nx)
            nk, nl, ns = _backward_ext(idx, l, k, s, 3 - a)
            nk, nl = nl, nk
            k2 = jnp.where(good, nk, k)
            l2 = jnp.where(good, nl, l)
            s2 = jnp.where(good, ns, s)
            hit = good & (ns < max_intv) & ((jj - x + 1) >= min_seed)
            (em, en, es), ec = emit((em, en, es), ec,
                                    (x, jj, ns), hit & (ns > 0))
            on = on & good & ~hit
            return (k2, l2, s2, nx, j + 1, on, em, en, es, ec)

        def inner_block(c):
            for _ in range(FMI_UNROLL):
                c = inner_body(c)
            return c

        (k, l, s, nx, _, _, em, en, es, ec) = lax.while_loop(
            inner_cond, inner_block,
            (k, l, s, nx, jnp.asarray(1, i32), on, em, en, es, ec))
        return (nx, em, en, es, ec)

    x0 = jnp.zeros((B,), i32)
    (_, em, en, es, ec) = lax.while_loop(
        outer_cond, outer_body, (x0, em, en, es, ec))
    return em, en, es, ec


# ---------------------------------------------------------------------------
# host driver
# ---------------------------------------------------------------------------

class FMISearch:
    """Device-resident FM-index search.  With a mesh, the checkpointed
    occ / one-hot BWT tables are explicitly REPLICATED across devices
    (they are small by construction: CP_OCC is 4xint64 + 4xuint64 per 64
    bases, FMI_search.h:55-59) and query batches shard data-parallel —
    the reference's OMP-over-read-batches (fmi.cpp:250-263) mapped to
    SPMD."""

    def __init__(self, index: FMIndex, mesh=None):
        self.index = index
        self.mesh = mesh
        self.count5 = jnp.asarray(index.count, jnp.int32)
        # packed checkpoint rows [cnt0..3 | hi0..3 | lo0..3]: one
        # contiguous gather per occ position (see _occ4)
        occtab = np.concatenate([index.cp_count.astype(np.uint32),
                                 index.oh_hi, index.oh_lo], axis=1)
        self.occtab = jnp.asarray(occtab)
        self.sentinel = jnp.asarray(index.sentinel, jnp.int32)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(mesh, P())
            (self.count5, self.occtab, self.sentinel) = (
                jax.device_put(t, rep) for t in (
                    self.count5, self.occtab, self.sentinel))

    def _tables(self):
        return (self.count5, self.occtab, self.sentinel)

    def _replicate(self, qdb_j):
        if self.mesh is None:
            return qdb_j
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(qdb_j, NamedSharding(self.mesh, P()))

    def smems_batch(self, qdb: np.ndarray, qoff: np.ndarray,
                    qlen: np.ndarray, rid: np.ndarray,
                    min_intv: np.ndarray, x0: np.ndarray,
                    min_seed: int, Lmax: int,
                    all_pos: bool) -> List[Tuple[int, int, int, int]]:
        """Run OnePos (optionally looped over restart positions =
        AllPos).  Returns [(rid, m, n, s)]."""
        from genarchbench_tpu.sharding.mesh import pad_batch, shard_args

        B = len(qoff)
        Bp = pad_batch(1 << max(B - 1, 1).bit_length(), self.mesh)
        pad = Bp - B

        def padi(a, fill=0):
            return np.concatenate(
                [a, np.full(pad, fill, a.dtype)]).astype(np.int32)

        qdb_j = self._replicate(jnp.asarray(qdb.astype(np.int32)))
        qoff_j, qlen_j, mi_j = shard_args(
            self.mesh, padi(qoff), padi(qlen), padi(min_intv, 1))
        rid_p = np.concatenate([rid, np.zeros(pad, rid.dtype)])
        act0 = np.concatenate([np.ones(B, bool), np.zeros(pad, bool)])

        # narrow prev-list width + narrow d2h window first; the ovf
        # flag (prev list or emissions overflowed) triggers one rerun
        # at full width — rare, and the recompile is cache-persistent
        # narrow first tier: the emit buffers are rebuilt by a full
        # `where` write on every loop step, so their WIDTH is a per-step
        # bandwidth cost, not just a d2h cost
        for Pmax, out_w in ((min(Lmax, 16), min(Lmax + 2, 32)),
                            (Lmax, 2 * Lmax + 2)):
            emit_cap = out_w
            if all_pos:
                act_j = shard_args(self.mesh, act0)[0]
                em, en, es, ec, ovf = _allpos_device(
                    *self._tables(), qdb_j, qoff_j, qlen_j, mi_j,
                    act_j, Lmax=Lmax, Pmax=Pmax, min_seed=min_seed,
                    emit_cap=emit_cap, out_w=out_w)
            else:
                x_j, act_j = shard_args(
                    self.mesh,
                    np.concatenate([x0, np.zeros(pad, np.int32)])
                    .astype(np.int32), act0)
                em, en, es, ec, _, ovf = _onepos_device(
                    *self._tables(), qdb_j, qoff_j, qlen_j, x_j,
                    mi_j, act_j, Lmax=Lmax, Pmax=Pmax,
                    min_seed=min_seed, emit_cap=emit_cap, out_w=out_w)
            if not bool(np.asarray(ovf)):
                break
        em, en, es, ec = (np.asarray(v) for v in (em, en, es, ec))
        mask = ((np.arange(em.shape[1])[None, :] < ec[:, None])
                & act0[:, None])
        bb, tt = np.nonzero(mask)
        return rid_p[bb], em[bb, tt], en[bb, tt], es[bb, tt]

    def bwt_seed_batch(self, qdb, qoff, qlen, rid, max_intv: int,
                       min_seed: int, Lmax: int):
        from genarchbench_tpu.sharding.mesh import pad_batch, shard_args

        B = len(qoff)
        Bp = pad_batch(1 << max(B - 1, 1).bit_length(), self.mesh)
        pad = Bp - B
        padi = lambda a, f=0: np.concatenate(
            [a, np.full(pad, f, a.dtype)]).astype(np.int32)
        qoff_j, qlen_j, mi_j = shard_args(
            self.mesh, padi(qoff), padi(qlen),
            padi(np.full(B, max_intv, np.int32), max_intv))
        qdb_j = self._replicate(jnp.asarray(qdb.astype(np.int32)))
        for emit_cap in (min(Lmax + 2, 16), Lmax + 2):
            em, en, es, ec = _bwt_seed_device(
                *self._tables(), qdb_j, qoff_j, qlen_j, mi_j,
                min_seed=min_seed, emit_cap=emit_cap)
            ec = np.asarray(ec)
            if not (ec > emit_cap).any():
                break
        em, en, es = (np.asarray(v) for v in (em, en, es))
        rid_p = np.concatenate([rid, np.zeros(pad, rid.dtype)])
        mask = ((np.arange(em.shape[1])[None, :] < ec[:, None])
                & (np.arange(Bp) < B)[:, None])
        bb, tt = np.nonzero(mask)
        return rid_p[bb], em[bb, tt], en[bb, tt], es[bb, tt]


def search_reads(fmi: FMISearch, reads: List[np.ndarray],
                 batch_size: int, min_seed: int) -> List[List[Tuple]]:
    """The driver's 3-pass batch loop (fmi.cpp:262-356).

    The reference's batch_size (512) is an OMP work-granularity knob
    that does not affect results (reads are independent; the final
    order is the global (rid, m, -n) stable sort because rids
    partition across batches).  Device batching therefore uses its own
    much larger granularity — per-batch fixed costs (h2d/d2h latency,
    restart-loop round trips) made 512-read batches ~500x slower than
    the arithmetic on the remote link.  Returns ONE group holding the
    globally sorted (rid, m, n) arrays."""
    n = len(reads)
    Lmax = 1 << max(max(len(r) for r in reads) - 1, 1).bit_length()
    split_len = int(min_seed * SPLIT_FACTOR + .499)
    # cap the device batch by padded BASES, not read count, so
    # long-read inputs don't blow up the (batch * Lmax) buffers;
    # bigger batches amortize the lockstep loop's worst-lane step
    # count across more reads (the loop runs max-over-batch steps)
    dev_batch = max(batch_size, min(65536, (128 << 20) // Lmax))
    results = []
    for i in range(0, n, dev_batch):
        batch = reads[i:i + dev_batch]
        bc = len(batch)
        qdb = np.full(bc * Lmax, 4, np.uint8)
        qoff = np.arange(bc, dtype=np.int32) * Lmax
        qlen = np.array([len(r) for r in batch], np.int32)
        for b, r in enumerate(batch):
            qdb[b * Lmax:b * Lmax + len(r)] = r
        rid = np.arange(bc, dtype=np.int32)

        # pass 1: all-SMEM
        s1 = fmi.smems_batch(qdb, qoff, qlen, rid,
                             np.ones(bc, np.int32),
                             np.zeros(bc, np.int32),
                             min_seed, Lmax, all_pos=True)
        # filter + reseed (fmi.cpp:301-324), vectorized
        r1, m1, n1, sp1 = s1
        keep = ((n1 + 1 - m1) >= split_len) & (sp1 <= SPLIT_WIDTH)
        rr = r1[keep].astype(np.int32)
        s2 = (np.zeros(0, np.int32),) * 4
        if len(rr):
            s2 = fmi.smems_batch(qdb, qoff[rr], qlen[rr], rr,
                                 (sp1[keep] + 1).astype(np.int32),
                                 ((n1 + 1 + m1)[keep] >> 1)
                                 .astype(np.int32),
                                 min_seed, Lmax, all_pos=False)
        # pass 3: LAST
        s3 = fmi.bwt_seed_batch(qdb, qoff, qlen, rid, MAX_MEM_INTV,
                                min_seed + 1, Lmax)

        results.append((np.concatenate([s1[0], s2[0], s3[0]]) + i,
                        np.concatenate([s1[1], s2[1], s3[1]]),
                        np.concatenate([s1[2], s2[2], s3[2]])))
    r_all = np.concatenate([r for r, _, _ in results])
    m_all = np.concatenate([m for _, m, _ in results])
    n_all = np.concatenate([nn for _, _, nn in results])
    order = np.lexsort((-n_all, m_all, r_all))       # stable
    return [(r_all[order], m_all[order], n_all[order])]


def run(argv: Sequence[str]) -> int:
    """CLI compatible with the reference fmi binary (fmi.cpp:74-79):
    ref_file query_set batch_size minSeedLen n_threads.  ref_file may be
    a fasta (index built on the fly) or a saved .npz index."""
    if len(argv) != 5:
        print("Need five arguments : ref_file query_set batch_size "
              "minSeedLen n_threads")
        return 1
    ref_file, query_file = argv[0], argv[1]
    batch_size, min_seed, nthreads = int(argv[2]), int(argv[3]), int(argv[4])

    print("before reading sequences")
    reads = []
    with open(query_file) as f:
        first = f.read(1)
        f.seek(0)
        if first == "@":
            while True:
                h = f.readline()
                if not h:
                    break
                s = f.readline().strip()
                f.readline()
                f.readline()
                reads.append(_ENC[np.frombuffer(s.encode(), np.uint8)])
        else:
            cur = []
            for line in f:
                line = line.strip()
                if line.startswith(">"):
                    if cur:
                        reads.append(_ENC[np.frombuffer(
                            "".join(cur).encode(), np.uint8)])
                    cur = []
                else:
                    cur.append(line)
            if cur:
                reads.append(_ENC[np.frombuffer(
                    "".join(cur).encode(), np.uint8)])

    import os
    if ref_file.endswith(".bwt.2bit.64"):
        index = FMIndex.load_bwt2bit64(ref_file)
    elif os.path.exists(ref_file + ".bwt.2bit.64"):
        # reference CLI contract: fasta prefix with prebuilt bwa-mem2
        # artifacts beside it (FMI_search ctor + load_index)
        index = FMIndex.load_bwt2bit64(ref_file + ".bwt.2bit.64")
    elif ref_file.endswith(".npz"):
        index = FMIndex.load(ref_file)
    else:
        index = build_index_from_fasta(ref_file)
    from genarchbench_tpu.sharding.mesh import data_mesh
    fmi = FMISearch(index, mesh=data_mesh())

    lens = [len(r) for r in reads]
    print(f"numReads = {len(reads)}, max_readlength = {max(lens)}, "
          f"min_readlength = {min(lens)}")
    print(f"Running {nthreads} threads")

    roi = ROITimer("fmi", "Computing time: {t} s")
    with roi:
        results = search_reads(fmi, reads, batch_size, min_seed)
    total = sum(len(r[0]) for r in results)
    print(f"totalSmems = {total}")
    print("Reading time: 0 s")
    roi.report(file=sys.stdout)

    prev_rid = -1
    parts = []
    for (r_a, m_a, n_a) in results:
        for r_, m_, n_ in zip(r_a.tolist(), m_a.tolist(), n_a.tolist()):
            if r_ != prev_rid:
                parts.append("".join(f"{j}:\n"
                                     for j in range(prev_rid + 1, r_ + 1)))
                prev_rid = r_
            parts.append(f"[{m_},{n_ + 1}]\n")
    sys.stdout.write("".join(parts))
    return 0


if __name__ == "__main__":
    sys.exit(run(sys.argv[1:]))
