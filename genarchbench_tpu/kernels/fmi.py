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
  * the per-read pointer-chasing search becomes LOCKSTEP batches — the
    TPU formulation of bwa-mem2's software-prefetch batching — in
    three decoupled stages: a PERSISTENT-LANE restart scan walks every
    read's restart chain with (B,)-narrow state; the per-restart
    backward SMEM searches then run as ONE flat (read, x0) item sweep
    sorted by forward length; bwtSeedStrategy walks per-read rounds
    with per-round column emissions.
  * the backward pass's sequential scan over the prev-interval stack is
    vectorized over P and WIDTH-STAGED (full width only while a live
    lane holds >4 entries, then sliced to 4 — gather cost is per-row):
    first-hit / dedup-by-s logic uses masked argmax, hand-rolled shift
    scans, and one-hot multiply-reduce compaction (take_along_axis and
    lax scan primitives measured ~10x slower in loop bodies).
  * per-ITEM emit caps and overflow retries at growing prev widths —
    no whole-batch full-width reruns.
  * occ tables live in HBM as packed u32 checkpoint rows (counts +
    one-hot words; counts split lo/hi-word and row state int64 past
    2^31 rows); both GET_OCC lookups of an extension ride one stacked
    gather; popcounts use `lax.population_count`.  With
    `shard_tables=True` the rows shard across the mesh and GET_OCC
    assembles answers via all_gather + psum_scatter.
  * index build is a host-side artifact step (SURVEY §5.4): linear
    SA-IS in native C, chunked one-hot packing, serialized as .npz or
    the byte-compatible bwa-mem2 `.bwt.2bit.64`.

Row-index width follows the reference size: int32 for references under
2^31 BWT rows, int64 beyond (the on-disk format carries up to 2^39-1
rows, bwa-mem2 macro.h:64-68 — GRCh38 fwd+rc is ~6.2e9).  Multi-chip,
reads shard data-parallel; the occ tables either replicate (48 B per
64 bases) or row-shard across the mesh with a masked-gather + psum
GET_OCC (`FMISearch(shard_tables=True)`), letting indexes larger than
one chip's HBM spread across the slice.
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
            if not 0 < seq_len < (1 << 39):
                raise ValueError(f"implausible index seq_len {seq_len} "
                                 "(format carries up to 2^39-1 rows, "
                                 "bwa-mem2 macro.h:64-68)")
            # human-scale references exceed 2^31 rows (GRCh38 fwd+rc is
            # ~6.2e9): row-valued tables stay int64 and the search
            # engine runs its wide path (FMISearch.wide)
            cdt = np.int32 if seq_len <= 0x7FFFFFFD else np.int64
            count = (np.fromfile(f, "<i8", 5) + 1).astype(cdt)
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
        return cls(count, cp["cnt"].astype(cdt),
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
    cdt = np.int32 if blen <= 0x7FFFFFFD else np.int64
    cp_count = np.zeros((ncp, 4), np.int64)
    oh_hi = np.zeros((ncp, 4), np.uint32)
    oh_lo = np.zeros((ncp, 4), np.uint32)
    bits = (np.uint64(1) << np.uint64(63 - np.arange(64)))
    run = np.zeros(4, np.int64)
    # chunked over checkpoint blocks: the dense (ncp, 64, 4) one-hot
    # intermediates would need ~32 bytes/base — ~70 GB at human scale
    CH = 1 << 22
    for lo in range(0, ncp, CH):
        hi = min(lo + CH, ncp)
        onehot = (bwt_p[lo * 64:hi * 64].reshape(hi - lo, 64)[:, :, None]
                  == np.arange(4, dtype=np.uint8))   # (ch, 64, 4)
        per_block = onehot.sum(axis=1, dtype=np.int64)
        cp_count[lo:hi] = run + (np.cumsum(per_block, axis=0)
                                 - per_block)
        run = run + per_block.sum(axis=0)
        words = np.bitwise_or.reduce(
            np.where(onehot, bits[None, :, None], np.uint64(0)), axis=1)
        oh_hi[lo:hi] = (words >> np.uint64(32)).astype(np.uint32)
        oh_lo[lo:hi] = (words & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    return (FMIndex(count.astype(cdt), cp_count.astype(cdt),
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

def _occ4(occtab, pp, axis=None):
    """occ(pp, b) for ALL four chars at once (GET_OCC).  occtab is the
    packed uint32 checkpoint table, ONE contiguous row-gather per
    position instead of 12 scattered 4-byte gathers — the backward
    pass runs this over (B, Pmax) positions per step, and
    scattered-gather HBM traffic was the round-3/4 pass-1 wall.

    Row layouts: width 12 = [cnt0..3 (i32) | hi0..3 | lo0..3]; width
    16 = [cntlo0..3 | cnthi0..3 | hi0..3 | lo0..3] for human-scale
    references whose row counts exceed 2^31 (the on-disk format
    carries up to 2^39-1 rows, bwa-mem2 macro.h:64-68) — pp and the
    returned counts are then int64.

    With `axis` set, this runs in the LOCAL view of a shard_map whose
    mesh axis `axis` row-shards occtab: each device gathers the rows
    it owns (others masked 0) and a psum assembles the full answer —
    the SURVEY §5.8 sharded-occ-table collective, which lets an index
    larger than one chip's HBM spread across the slice."""
    u32 = jnp.uint32
    wide = occtab.shape[-1] == 16
    cid = pp >> CP_SHIFT
    y = (pp & CP_MASK).astype(jnp.int32)
    if axis is None:
        row = jnp.take(occtab, cid, axis=0)      # (..., 12|16)
    else:
        # lanes are sharded and the table is row-sharded: all_gather
        # every device's positions, answer the ones whose rows live
        # here (others contribute 0), then reduce_scatter hands each
        # device the assembled rows for ITS lanes — the classic
        # sharded-table lookup collective pair
        C = occtab.shape[0]
        off = (lax.axis_index(axis).astype(cid.dtype)
               * jnp.asarray(C, cid.dtype))
        cid_all = lax.all_gather(cid, axis)      # (ndev, ...)
        loc = cid_all - off
        ok = (loc >= 0) & (loc < C)
        row = jnp.take(occtab, jnp.clip(loc, 0, C - 1), axis=0)
        row = jnp.where(ok[..., None], row, 0)
        row = lax.psum_scatter(row, axis, scatter_dimension=0,
                               tiled=False)
    if wide:
        cnt = (row[..., 0:4].astype(jnp.int64)
               | (row[..., 4:8].astype(jnp.int64) << 32))
        hi = row[..., 8:12]
        lo = row[..., 12:16]
    else:
        cnt = row[..., 0:4].astype(jnp.int32)
        hi = row[..., 4:8]
        lo = row[..., 8:12]
    t_hi = jnp.clip(y, 0, 32)[..., None]
    t_lo = jnp.clip(y - 32, 0, 32)[..., None]
    ones = jnp.uint32(0xFFFFFFFF)
    m_hi = jnp.where(t_hi > 0, ones << (32 - t_hi).astype(u32), u32(0))
    m_lo = jnp.where(t_lo > 0, ones << (32 - t_lo).astype(u32), u32(0))
    pc = (lax.population_count(hi & m_hi)
          + lax.population_count(lo & m_lo)).astype(cnt.dtype)
    return cnt + pc                               # (..., 4)


def _backward_ext(idx, k, l, s, a):
    """Vectorized backwardExt (FMI_search.cpp:1268-1298).  idx = tuple
    (count5, occtab, sentinel).  The two GET_OCC lookups (interval
    start k and end k+s) ride ONE stacked gather — gather cost on this
    TPU is per-op fixed cost + per-row, so halving the op count nearly
    halves the extension cost for narrow (B,) state."""
    count5, occtab, sentinel = idx[:3]
    axis = idx[3] if len(idx) > 3 else None
    a = jnp.clip(a, 0, 3)
    both = _occ4(occtab, jnp.stack([k, k + s], axis=-1),
                 axis)                                    # (..., 2, 4)
    osp = both[..., 0, :]                         # (..., 4)
    oep = both[..., 1, :]
    kk4 = count5[:4] + osp
    ss4 = oep - osp
    sent = ((k <= sentinel) & (k + s > sentinel)).astype(jnp.int32)
    l3 = l + sent
    l2 = l3 + ss4[..., 3]
    l1 = l2 + ss4[..., 2]
    l0 = l1 + ss4[..., 1]
    ll = [l0, l1, l2, l3]
    # where-chains, NOT take_along_axis: minor-axis gathers cost ~1-2ms
    # per element-block per step on this TPU (same disease as the
    # compaction permutes, see bwd_step)
    sel = lambda vs: jnp.where(a == 0, vs[0], jnp.where(
        a == 1, vs[1], jnp.where(a == 2, vs[2], vs[3])))
    sel4 = lambda t: sel([t[..., 0], t[..., 1], t[..., 2], t[..., 3]])
    return sel4(kk4), sel(ll), sel4(ss4)


def _backward_ext_ks(idx, k, s, a):
    """backwardExt for the backward SMEM walk, which consumes only
    (k, s): the reverse-complement interval l is needed solely to seed
    FORWARD extensions (FMI_search.cpp:1268-1298), so its update chain
    is omitted from the hot loop."""
    count5, occtab = idx[0], idx[1]
    axis = idx[3] if len(idx) > 3 else None
    a = jnp.clip(a, 0, 3)
    both = _occ4(occtab, jnp.stack([k, k + s], axis=-1), axis)
    osp = both[..., 0, :]
    oep = both[..., 1, :]
    kk4 = count5[:4] + osp
    ss4 = oep - osp
    sel = lambda t: jnp.where(
        a == 0, t[..., 0], jnp.where(a == 1, t[..., 1],
                                     jnp.where(a == 2, t[..., 2],
                                               t[..., 3])))
    return sel(kk4), sel(ss4)


def _qchar(qdb, off, j, valid):
    """qdb flat gather with bounds guard: returns 4 (ambig) when invalid."""
    idx = jnp.clip(off + j, 0, qdb.shape[0] - 1)
    c = jnp.take(qdb, idx)
    return jnp.where(valid, c, 4)


def _gany(x, axis):
    """Global any() for lockstep while conditions: under sharded
    tables (shard_map), every device must run the SAME trip count —
    the body psums rendezvous each iteration — so the condition itself
    reduces over the mesh axis."""
    if axis is None:
        return jnp.any(x)
    return lax.psum(jnp.any(x).astype(jnp.int32), axis) > 0


def _last_eligible_scan(elig, val):
    """For each p: value of the last eligible index < p (or -1).
    Hand-rolled Hillis-Steele shift scan — lax.associative_scan lowers
    to dynamic-slice towers on TPU that measured ~10x slower than
    static pad+slice shifts (see the chain kernel's scans)."""
    B, P = elig.shape
    vals = jnp.where(elig, val, -1)
    res = jnp.concatenate(
        [jnp.full((B, 1), -1, vals.dtype), vals[:, :-1]], axis=1)
    d = 1
    while d < P:
        sh = jnp.concatenate(
            [jnp.full((B, d), -1, res.dtype), res[:, :-d]], axis=1)
        res = jnp.where(res >= 0, res, sh)
        d *= 2
    return res


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
    rowdt = idx[0].dtype                 # int64 for >2^31-row tables
    pk = jnp.zeros((B, Pmax), rowdt)
    ps = jnp.zeros((B, Pmax), rowdt)
    npv = jnp.zeros((B,), i32)

    def push(bufs, npv, vals, mask):
        slots = lax.broadcasted_iota(i32, (B, Pmax), 1)
        at = slots == npv[:, None]
        out = []
        for buf, v in zip(bufs, vals):
            out.append(jnp.where(at & mask[:, None], v[:, None], buf))
        return out, npv + mask.astype(i32)

    def fwd_body(carry):
        (m, n, k, l, s, pm, pn, pk, ps, npv, nx, on, j) = carry
        jj = x0 + j
        valid = on & (jj < qlen)
        a = _qchar(qdb, qoff, jj, valid)
        good = valid & (a < 4)
        nx = jnp.where(valid & ~good, jj + 1, nx)       # char break
        # forward ext = backward ext on revcomp side (k/l swapped)
        nk, nl, ns = _backward_ext(idx, l, k, s, 3 - a)
        nk, nl = nl, nk
        s_neq = good & (ns != s)
        (pm, pn, pk, ps), npv = push(
            (pm, pn, pk, ps), npv, (m, n, k, s), s_neq)
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
        return (m, n, k, l, s, pm, pn, pk, ps, npv, nx, on, j + 1)

    axis = idx[3] if len(idx) > 3 else None

    def fwd_cond(carry):
        return _gany(carry[11], axis)

    def fwd_block(carry):
        for _ in range(FMI_UNROLL):
            carry = fwd_body(carry)
        return carry

    m = x0
    n = x0
    carry = (m, n, k0, l0, s0, pm, pn, pk, ps, npv,
             x0 + 1, lane_on, jnp.asarray(1, i32))
    (m, n, k, l, s, pm, pn, pk, ps, npv, next_x, _, _) = \
        lax.while_loop(fwd_cond, fwd_block, carry)

    # final forward push: if smem.s >= min_intv
    fin = lane_on & (s >= min_intv)
    (pm, pn, pk, ps), npv = push(
        (pm, pn, pk, ps), npv, (m, n, k, s), fin)
    # push() drops entries past Pmax but keeps counting: detectable
    ovf = lane_on & (npv > Pmax)

    # reverse the first npv entries (one-hot multiply-reduce — see the
    # take_along_axis note in bwd_step)
    slots = lax.broadcasted_iota(i32, (B, Pmax), 1)
    inpv = slots < npv[:, None]
    R = ((slots[:, None, :] == npv[:, None, None] - 1
          - slots[:, :, None]) & inpv[:, :, None])
    rev = lambda b: jnp.where(
        inpv, jnp.where(R, b[:, None, :], 0).sum(axis=2, dtype=b.dtype),
        b)
    pm, pn, pk, ps = rev(pm), rev(pn), rev(pk), rev(ps)

    # ---- backward search ----
    def emit(bufs, ec, vals, mask):
        slots2 = lax.broadcasted_iota(i32, (B, emit_cap), 1)
        at = slots2 == ec[:, None]
        out = []
        for buf, v in zip(bufs, vals):
            out.append(jnp.where(at & mask[:, None], v[:, None], buf))
        return out, ec + mask.astype(i32)

    def bwd_step(P):
        """One backward step at prev-list width P.  Width-parametric so
        the loop can NARROW once lists shrink: gather cost is per-row,
        so running the long tail of the loop at P=4 instead of P=16
        cuts the dominant occ-gather traffic 4x."""
        slotsP = lax.broadcasted_iota(i32, (B, P), 1)
        idt = jnp.int8 if P <= 127 else i32
        t_iota = lax.broadcasted_iota(idt, (B, P, P), 1)

        def body(carry):
            (pm, pn, pk, ps, npv, on, j, em, en, es, ec) = carry
            jj = x0 - j
            valid = on & (jj >= 0)
            a = _qchar(qdb, qoff, jj, valid)
            good = valid & (a < 4)
            # stop lanes keep npv for the final emission
            inp = slotsP < npv[:, None]
            nk, ns = _backward_ext_ks(idx, pk, ps, a[:, None])
            plen = pn - pm + 1
            condA = inp & (ns < min_intv[:, None]) & (plen >= min_seed)
            condB = inp & (ns >= min_intv[:, None])
            first = condA | condB
            has0 = jnp.any(first, axis=1)
            p0 = jnp.argmax(first, axis=1)
            # one-hot row picks instead of take_along_axis (per-step
            # minor-axis gathers measured ~10x the elementwise cost)
            selp0 = slotsP == p0[:, None]
            isA = has0 & jnp.any(condA & selp0, axis=1)
            gat = lambda b: jnp.max(jnp.where(selp0, b, 0), axis=1)
            (em, en, es), ec = emit((em, en, es), ec,
                                    (gat(pm), gat(pn),
                                     jnp.clip(gat(ps), 0, 255)
                                     .astype(i32)),
                                    good & isA)
            # pushes: eligible p >= p0 (> p0 when condA), s-dedup
            pge = slotsP >= p0[:, None] + isA.astype(i32)[:, None]
            elig = condB & pge & has0[:, None]
            prev_s = _last_eligible_scan(elig, ns)
            push_p = elig & (ns != prev_s)
            # compact pushed entries (stable) to the front; pushed
            # entry is newSmem = (m=jj, n=prev n, k/l/s = extended).
            # GATHER-based: perm[t] = source slot of the t-th pushed
            # entry via a one-hot cumsum match in int8 (scatter is the
            # slowest op class on TPU; int8 keeps the (B, P, P)
            # tensors 4x smaller than int32)
            # inclusive prefix count, hand-rolled (jnp.cumsum also
            # lowers to a dynamic-slice tower on TPU)
            csum = push_p.astype(idt)
            d = 1
            while d < P:
                csum = csum + jnp.concatenate(
                    [jnp.zeros((B, d), idt), csum[:, :-d]], axis=1)
                d *= 2
            ncur = csum[:, -1].astype(i32)
            E = push_p[:, None, :] & (csum[:, None, :] == t_iota + 1)
            hasrow = jnp.any(E, axis=2)

            def compact(vals):
                # one-hot multiply-reduce: E has at most one set bit
                # per target row, so the masked sum IS the permute —
                # a take_along_axis here costs ~10x (minor-axis gather)
                return jnp.where(E, vals[:, None, :], 0).sum(
                    axis=2, dtype=vals.dtype)

            npm = jnp.where(hasrow, jj[:, None], 0)
            npn = compact(pn)
            npk = compact(nk)
            nps = compact(ns)

            upd = good
            pm2 = jnp.where(upd[:, None], npm, pm)
            pn2 = jnp.where(upd[:, None], npn, pn)
            pk2 = jnp.where(upd[:, None], npk, pk)
            ps2 = jnp.where(upd[:, None], nps, ps)
            npv2 = jnp.where(upd, ncur, npv)
            on2 = on & good & (ncur > 0)
            return (pm2, pn2, pk2, ps2, npv2, on2, j + 1,
                    em, en, es, ec)

        return body

    carry = (pm, pn, pk, ps, npv, lane_on, jnp.asarray(1, i32),
             em, en, es, ec)
    # two-stage width narrowing: full width only while some LIVE lane
    # still holds more than 4 entries (lists shrink monotonically —
    # every step keeps a subset), then slice the front-compacted state
    # to width 4 for the long tail.  Gather cost is per-row, so the
    # tail runs ~4x cheaper; finer stage ladders and smaller unrolls
    # measured WORSE (while-loop fixed cost per iteration dominates).
    cur = Pmax
    if cur > 4:
        step1 = bwd_step(cur)

        def s1_cond(c):
            return _gany(c[5] & (c[4] > 4), axis)

        def s1_block(c):
            for _ in range(FMI_UNROLL):
                c = step1(c)
            return c

        carry = lax.while_loop(s1_cond, s1_block, carry)
        (pm, pn, pk, ps, npv, on, j, em, en, es, ec) = carry
        carry = (pm[:, :4], pn[:, :4], pk[:, :4],
                 ps[:, :4], npv, on, j, em, en, es, ec)
        cur = 4
    stepN = bwd_step(cur)

    def bwd_cond(c):
        return _gany(c[5], axis)

    def bwd_block(c):
        for _ in range(FMI_UNROLL):
            c = stepN(c)
        return c

    (pmF, pnF, _, psF, npv, _, _, em, en, es, ec) = \
        lax.while_loop(bwd_cond, bwd_block, carry)

    # final: emit prev[0] if it meets min_seed (numPrev != 0 lanes)
    fmask = lane_on & (npv > 0) & ((pnF[:, 0] - pmF[:, 0] + 1)
                                   >= min_seed)
    (em, en, es), ec = emit((em, en, es), ec,
                            (pmF[:, 0], pnF[:, 0],
                             jnp.clip(psF[:, 0], 0, 255).astype(i32)),
                            fmask)

    return em, en, es, ec, next_x, ovf


@partial(jax.jit, static_argnames=("Rcap", "table_axis"))
def _restart_scan_device(count5, occtab, sentinel, qdb, qoff, qlen,
                         x_init, min_intv, Rcap, table_axis=None):
    """Pass-1 restart discovery: walks getSMEMsAllPosOneThread's
    restart chain (x = next_x until x >= qlen, FMI_search.cpp:915-968)
    with (B,)-NARROW state only — no prev lists, no emission buffers.
    Each round records one packed u32 item (x0 << 16 | forward-end n,
    0xFFFFFFFF = none) per lane.  The expensive per-restart backward
    searches then run over the FLATTENED (read, x0) item list
    (_onepos_items_device), sorted so lockstep lanes share similar
    trip counts — this removes the round-4 design's multiplication of
    max-over-batch restart count by max-over-batch extension length,
    which made pass 1 ~25x more expensive than the useful work."""
    B = qoff.shape[0]
    i32 = jnp.int32
    idx = (count5, occtab, sentinel, table_axis)
    INVALID = jnp.uint32(0xFFFFFFFF)
    slots = lax.broadcasted_iota(i32, (B, Rcap), 1)

    # PERSISTENT LANES: every iteration advances every lane by exactly
    # one query position — either initializing a fresh segment at x0 or
    # extending the current one; a dying segment records its item and
    # the SAME lane re-initializes next iteration.  Total trip count is
    # max-over-lanes of (read length + 2 * restarts), with no
    # round-barrier multiplication of per-restart maxima.
    def body(c):
        x0, jj, n, k, l, s, seg_on, cnt, out = c
        can = cnt < Rcap
        live = (x0 < qlen) & can
        pos = jnp.where(seg_on, jj, x0)
        a = _qchar(qdb, qoff, pos, live & (pos < qlen))
        good = a < 4

        # init-mode lanes (no current segment)
        init = live & ~seg_on
        k0 = jnp.take(count5, jnp.clip(a, 0, 3))
        l0 = jnp.take(count5, jnp.clip(3 - a, 0, 3))
        s0 = jnp.take(count5, jnp.clip(a, 0, 3) + 1) - k0
        start = init & good
        skip = init & ~good                      # ambiguous base: x++

        # ext-mode lanes
        ext = live & seg_on
        valid = ext & (jj < qlen)
        nk, nl, ns = _backward_ext(idx, l, k, s, 3 - a)
        nk, nl = nl, nk
        goodx = valid & good
        die = goodx & (ns < min_intv)
        brk = valid & ~good                      # char break: restart jj+1
        end = ext & (jj >= qlen)
        fin = die | brk | end
        grow = goodx & ~die

        # record finished segment (x0, n)
        at = (slots == cnt[:, None]) & fin[:, None]
        item = (x0.astype(jnp.uint32) << 16) | (n.astype(jnp.uint32)
                                                & jnp.uint32(0xFFFF))
        out = jnp.where(at, item[:, None], out)
        cnt = cnt + fin.astype(i32)

        nx0 = jnp.where(die, jj,
                        jnp.where(brk, jj + 1,
                                  jnp.where(end, qlen,
                                            jnp.where(skip, x0 + 1,
                                                      x0))))
        nx0 = jnp.where(fin | skip, jnp.maximum(nx0, x0 + 1), nx0)
        seg2 = jnp.where(fin, False, jnp.where(start, True, seg_on))
        n2 = jnp.where(start, x0, jnp.where(grow, jj, n))
        k2 = jnp.where(start, k0, jnp.where(grow, nk, k))
        l2 = jnp.where(start, l0, jnp.where(grow, nl, l))
        s2 = jnp.where(start, s0, jnp.where(grow, ns, s))
        jj2 = jnp.where(start, x0 + 1, jnp.where(grow, jj + 1, jj))
        return (nx0, jj2, n2, k2, l2, s2, seg2, cnt, out)

    def cond(c):
        x0, _, _, _, _, _, _, cnt, _ = c
        return _gany((x0 < qlen) & (cnt < Rcap), table_axis)

    def block(c):
        for _ in range(FMI_UNROLL):
            c = body(c)
        return c

    z = jnp.zeros((B,), i32)
    zr = jnp.zeros((B,), count5.dtype)
    out0 = jnp.full((B, Rcap), INVALID)
    c = lax.while_loop(
        cond, block,
        (x_init, z, z, zr, zr, zr, jnp.zeros((B,), bool), z, out0))
    return c[8], c[0]


@partial(jax.jit, static_argnames=("Pmax", "min_seed", "out_w",
                                   "table_axis", "packed"))
def _onepos_items_device(count5, occtab, sentinel, qdb, meta,
                         Pmax, min_seed, out_w, table_axis=None,
                         packed=True):
    """One getSMEMsOnePosOneThread per LANE, lanes = flattened
    (read, restart-position) work items.  meta = (B, 4) int32 rows
    [qoff, qlen, x0, min_intv] (x0 < 0 = padding lane).  Emission caps
    are PER-ITEM (<= numPrev + 1 <= Pmax + 1 by the algorithm,
    FMI_search.cpp:498-914), so a single long read can no longer force
    a whole-batch full-width rerun; lanes whose prev list or emit
    buffer overflows return a per-lane flag and only THOSE items are
    retried wider.  Output is ONE u32 blob
    [m<<16|n (B,out_w) | s clamped to u8 packed 4/u32 | ec u8 packed
    4/u32 | ovf bits 32/u32] — one d2h transfer per dispatch (the
    tunnel charges ~50-100 ms per transfer regardless of size)."""
    B = meta.shape[0]
    i32 = jnp.int32
    qoff, qlen = meta[:, 0], meta[:, 1]
    x0, mi = meta[:, 2], meta[:, 3]
    active0 = x0 >= 0
    z = lambda: jnp.zeros((B, out_w), i32)
    em, en, es, ec, _, ovf = _onepos_core(
        (count5, occtab, sentinel, table_axis), qdb, qoff, qlen,
        jnp.maximum(x0, 0), mi, active0,
        0, Pmax, min_seed, out_w, z(), z(), z(),
        jnp.zeros((B,), i32))
    ovf = ovf | (ec > out_w)
    if not packed:
        return em, en, es, ec, ovf
    u32 = jnp.uint32
    mn = ((em.astype(u32) << 16) | (en.astype(u32) & u32(0xFFFF)))
    s8 = jnp.clip(es, 0, 255).astype(u32).reshape(B, out_w // 4, 4)
    sh = jnp.arange(4, dtype=u32) * 8
    s8p = (s8 << sh).sum(axis=2, dtype=u32)
    ecp = (jnp.clip(ec, 0, 255).astype(u32).reshape(B // 4, 4)
           << sh).sum(axis=1, dtype=u32)
    ovp = (ovf.astype(u32).reshape(B // 32, 32)
           << jnp.arange(32, dtype=u32)).sum(axis=1, dtype=u32)
    return jnp.concatenate(
        [mn.ravel(), s8p.ravel(), ecp, ovp])


@partial(jax.jit, static_argnames=("min_seed", "Rcap", "table_axis"))
def _bwt_seed_device(count5, occtab, sentinel,
                     qdb, qoff, qlen, max_intv, x_init, min_seed,
                     Rcap, table_axis=None):
    """bwtSeedStrategyAllPosOneThread for a batch
    (FMI_search.cpp:975-1075): forward-only restart chain; each ROUND
    runs one segment per lane (extend until the interval drops under
    max_intv at length >= min_seed, or a bad char / read end) and
    records the at-most-one hit per lane per round as a packed column
    write — emissions live OUTSIDE the inner loop so the hot body
    stays (B,)-narrow (the per-step (B, emit_cap) buffer rewrites were
    most of this pass's round-4 cost)."""
    B = qoff.shape[0]
    i32 = jnp.int32
    idx = (count5, occtab, sentinel, table_axis)
    INVALID = jnp.uint32(0xFFFFFFFF)

    def outer_cond(c):
        r, x, out = c
        return (r < Rcap) & _gany(x < qlen, table_axis)

    def outer_body(c):
        r, x, out = c
        on0 = x < qlen
        a0 = _qchar(qdb, qoff, x, on0)
        on = on0 & (a0 < 4)
        k = jnp.take(count5, jnp.clip(a0, 0, 3))
        l = jnp.take(count5, jnp.clip(3 - a0, 0, 3))
        s = jnp.take(count5, jnp.clip(a0, 0, 3) + 1) - k
        nx = x + 1
        hitn = jnp.full((B,), -1, i32)

        def inner_cond(cc):
            return _gany(cc[5], table_axis)

        def inner_body(cc):
            (k, l, s, nx, j, on, hitn) = cc
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
            hitn = jnp.where(hit & (ns > 0), jj, hitn)
            on = on & good & ~hit
            return (k2, l2, s2, nx, j + 1, on, hitn)

        def inner_block(cc):
            for _ in range(FMI_UNROLL):
                cc = inner_body(cc)
            return cc

        (k, l, s, nx, _, _, hitn) = lax.while_loop(
            inner_cond, inner_block,
            (k, l, s, nx, jnp.asarray(1, i32), on, hitn))
        col = jnp.where(
            hitn >= 0,
            (x.astype(jnp.uint32) << 16) | (hitn.astype(jnp.uint32)
                                            & jnp.uint32(0xFFFF)),
            INVALID)
        out = lax.dynamic_update_slice(
            out, col[:, None], (jnp.asarray(0, r.dtype), r))
        nx = jnp.maximum(jnp.where(on0, nx, x), x + 1)
        return (r + 1, nx, out)

    out0 = jnp.full((B, Rcap), INVALID)
    _, x, out = lax.while_loop(
        outer_cond, outer_body,
        (jnp.asarray(0, i32), x_init, out0))
    return out, x


# ---------------------------------------------------------------------------
# host driver
# ---------------------------------------------------------------------------

class FMISearch:
    """Device-resident FM-index search.  With a mesh, query batches
    shard data-parallel — the reference's OMP-over-read-batches
    (fmi.cpp:250-263) mapped to SPMD.  The checkpointed occ / one-hot
    BWT tables are REPLICATED by default (CP_OCC is 48 bytes per 64
    bases, FMI_search.h:55-59: ~4.7 GB for GRCh38 fwd+rc), or
    row-SHARDED across the mesh with `shard_tables=True` — each device
    then holds 1/N of the index and every GET_OCC assembles its answer
    with a masked local gather + psum (SURVEY §5.8), so references
    larger than one chip's HBM spread across the slice.

    References with more than 2^31 BWT rows (human scale) switch the
    row-valued state to int64 (`self.wide`); this requires JAX's x64
    mode (the CLI enables it for its own process when the loaded index
    needs it)."""

    def __init__(self, index: FMIndex, mesh=None, shard_tables=False):
        import os
        self.index = index
        self.mesh = mesh
        # GENARCH_FMI_FORCE_WIDE exercises the int64 row path on small
        # indexes (test hook — the real trigger is the row count)
        self.wide = (index.seq_len > 0x7FFFFFFD
                     or os.environ.get("GENARCH_FMI_FORCE_WIDE") == "1")
        if self.wide and not jax.config.jax_enable_x64:
            raise RuntimeError(
                "index has >2^31 rows; enable jax x64 first "
                "(jax.config.update('jax_enable_x64', True)) — the fmi "
                "CLI does this automatically")
        cdt = np.int64 if self.wide else np.int32
        self.count5 = jnp.asarray(index.count.astype(cdt))
        # packed checkpoint rows, one contiguous gather per occ
        # position (see _occ4): [cnt | hi | lo] u32, counts split
        # lo/hi-word when wide
        if self.wide:
            c64 = index.cp_count.astype(np.int64)
            occtab = np.concatenate(
                [(c64 & 0xFFFFFFFF).astype(np.uint32),
                 (c64 >> 32).astype(np.uint32),
                 index.oh_hi, index.oh_lo], axis=1)
        else:
            occtab = np.concatenate(
                [index.cp_count.astype(np.uint32),
                 index.oh_hi, index.oh_lo], axis=1)
        self.sentinel = jnp.asarray(index.sentinel, cdt)
        self.table_axis = None
        if mesh is not None and shard_tables:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self.table_axis = mesh.axis_names[0]
            nd = int(mesh.devices.size)
            ncp = occtab.shape[0]
            padded = ((ncp + nd - 1) // nd) * nd
            if padded != ncp:
                occtab = np.concatenate(
                    [occtab, np.zeros((padded - ncp, occtab.shape[1]),
                                      np.uint32)])
            self.occtab = jax.device_put(
                occtab, NamedSharding(mesh, P(self.table_axis, None)))
            rep = NamedSharding(mesh, P())
            self.count5 = jax.device_put(self.count5, rep)
            self.sentinel = jax.device_put(self.sentinel, rep)
        else:
            self.occtab = jnp.asarray(occtab)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                rep = NamedSharding(mesh, P())
                (self.count5, self.occtab, self.sentinel) = (
                    jax.device_put(t, rep) for t in (
                        self.count5, self.occtab, self.sentinel))
        self._shard_fns = {}

    def _tables(self):
        return (self.count5, self.occtab, self.sentinel)

    def _fn(self, base, statics):
        """shard_map-wrapped variant of a device kernel for the
        sharded-table mode: tables enter in LOCAL view (occtab rows
        P(axis, None)), per-lane arrays shard on the batch axis, and
        _occ4 assembles global rows via psum (see its docstring)."""
        if self.table_axis is None:
            raise RuntimeError("sharded variant without shard_tables")
        key = (base.__name__,) + tuple(sorted(statics.items()))
        if key in self._shard_fns:
            return self._shard_fns[key]
        from jax.sharding import PartitionSpec as P
        from jax.experimental.shard_map import shard_map
        ax = self.table_axis
        spec_map = {
            "_restart_scan_device": ((P(), P(ax, None), P(), P(),
                                      P(ax), P(ax), P(ax), P()),
                                     (P(ax, None), P(ax))),
            "_onepos_items_device": ((P(), P(ax, None), P(), P(),
                                      P(ax, None)),
                                     (P(ax, None), P(ax, None),
                                      P(ax, None), P(ax), P(ax))),
            "_bwt_seed_device": ((P(), P(ax, None), P(), P(),
                                  P(ax), P(ax), P(), P(ax)),
                                 (P(ax, None), P(ax))),
        }
        in_specs, out_specs = spec_map[base.__name__]
        raw = base.__wrapped__     # the un-jitted implementation
        fn = jax.jit(shard_map(
            partial(raw, table_axis=ax, **statics),
            mesh=self.mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False))
        self._shard_fns[key] = fn
        return fn

    def _replicate(self, qdb_j):
        if self.mesh is None:
            return qdb_j
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(qdb_j, NamedSharding(self.mesh, P()))

    def restart_items(self, qdb_j, qoff: np.ndarray, qlen: np.ndarray,
                      min_intv: int, Rcap: int = 8):
        """Phase A of the all-SMEM pass: per-read restart positions
        (x0, fwd end n) via _restart_scan_device, resuming for the
        rare read with more than Rcap restarts.  Returns (ridx, x0,
        nend) flat arrays in chain order."""
        from genarchbench_tpu.sharding.mesh import pad_batch, shard_args

        B = len(qoff)
        Bp = pad_batch(1 << max(B - 1, 1).bit_length(), self.mesh)
        pad = Bp - B
        padi = lambda a, f=0: np.concatenate(
            [a, np.full(pad, f, np.int32)]).astype(np.int32)
        qoff_j, qlen_j = shard_args(self.mesh, padi(qoff), padi(qlen))
        mi_j = jnp.asarray(np.int32(min_intv))
        x = shard_args(self.mesh, np.zeros(Bp, np.int32))[0]
        if self.table_axis is not None:
            fn = self._fn(_restart_scan_device, {"Rcap": Rcap})
            call = lambda x: fn(*self._tables(), qdb_j, qoff_j,
                                qlen_j, x, mi_j)
        else:
            call = lambda x: _restart_scan_device(
                *self._tables(), qdb_j, qoff_j, qlen_j, x, mi_j,
                Rcap=Rcap)
        chunks = []
        while True:
            out, x = call(x)
            chunks.append(np.asarray(out))
            xh = np.asarray(x)
            if not (xh[:B] < qlen).any():
                break
            x = shard_args(self.mesh, xh.astype(np.int32))[0]
        out = np.concatenate(chunks, axis=1)[:B]
        bb, rr = np.nonzero(out != 0xFFFFFFFF)
        packed = out[bb, rr]
        return (bb.astype(np.int32), (packed >> 16).astype(np.int32),
                (packed & 0xFFFF).astype(np.int32))

    def onepos_items(self, qdb_j, item_qoff, item_qlen, item_x0,
                     item_mi, item_flen, min_seed: int,
                     chunk: int = 1 << 16):
        """Phase B: run one backward SMEM search per item, sorted by
        work size (prev-list bucket, then x0 + fwd length so lockstep
        chunks share trip counts), with per-item overflow retries at
        growing prev-list widths.  Returns flat emission arrays
        (item_index, m, n, s); s is clamped to u8, which never matters:
        s is only consumed by the reseed filter
        (s <= SPLIT_WIDTH = 10, fmi.cpp:301-317)."""
        from genarchbench_tpu.sharding.mesh import pad_batch, shard_args

        M = len(item_x0)
        Lmax_all = int(item_qlen.max()) if M else 0
        tiers = [8, 16, 64]
        wfull = 1 << max(Lmax_all + 1, 2).bit_length()
        if wfull > 64:
            tiers.append(wfull)
        todo = np.ones(M, bool)
        # numPrev <= #distinct interval sizes <= fwd length + 1, so
        # short-extension items start at the narrow prev-list tier
        tier_of = np.where(item_flen < 8, 0, 1)
        emits = []
        for ti, Pmax in enumerate(tiers):
            sel = np.nonzero(todo & (tier_of <= ti))[0]
            if not len(sel):
                if not todo.any():
                    break
                continue
            # fwd-replay trip count = chunk max fwd length; the bwd
            # walk's step distribution is tight (p99 within ~1.5x of
            # the mean), so fwd length is the divergence that matters
            order = np.argsort(item_flen[sel], kind="stable")
            sel = sel[order]
            # typical emission count per item is 1-2, far below the
            # numPrev+1 bound: small emit windows cut the d2h blob
            # (the tunnel moves ~100 MB/s); the rare overflow just
            # bumps the item a tier
            out_w = min(Pmax + 4, 12) if Pmax <= 16 else Pmax + 4
            fails = []
            # dispatch every chunk before decoding any (device queue
            # overlaps compute with the d2h pulls)
            launched = []
            for lo in range(0, len(sel), chunk):
                sub = sel[lo:lo + chunk]
                B = len(sub)
                Bp = pad_batch(
                    max(1 << max(B - 1, 1).bit_length(), 32),
                    self.mesh)
                meta = np.full((Bp, 4), -1, np.int32)
                meta[:B, 0] = item_qoff[sub]
                meta[:B, 1] = item_qlen[sub]
                meta[:B, 2] = item_x0[sub]
                meta[:B, 3] = item_mi[sub]
                meta_j = shard_args(self.mesh, meta)[0]
                if self.table_axis is not None:
                    fn = self._fn(_onepos_items_device,
                                  {"Pmax": Pmax, "min_seed": min_seed,
                                   "out_w": out_w, "packed": False})
                    res = fn(*self._tables(), qdb_j, meta_j)
                else:
                    res = _onepos_items_device(
                        *self._tables(), qdb_j, meta_j,
                        Pmax=Pmax, min_seed=min_seed, out_w=out_w)
                    try:
                        res.copy_to_host_async()
                    except AttributeError:
                        pass
                launched.append((sub, B, Bp, res))
            for sub, B, Bp, res in launched:
                if self.table_axis is not None:
                    em, en, s8, ec, ovf = (np.asarray(v) for v in res)
                    m_a, n_a = em, en
                else:
                    blob = np.asarray(res)
                    mn = blob[:Bp * out_w].reshape(Bp, out_w)
                    m_a = (mn >> 16).astype(np.int32)
                    n_a = (mn & 0xFFFF).astype(np.int32)
                    s8 = blob[Bp * out_w:Bp * out_w + Bp * out_w // 4]
                    s8 = (s8.reshape(Bp, out_w // 4)[:, :, None]
                          >> (np.arange(4, dtype=np.uint32) * 8)
                          ) & 0xFF
                    s8 = s8.reshape(Bp, out_w)
                    ec = ((blob[Bp * out_w * 5 // 4:Bp * out_w * 5 // 4
                                + Bp // 4].reshape(-1, 1)
                           >> (np.arange(4, dtype=np.uint32) * 8))
                          & 0xFF).reshape(Bp)
                    ovf = ((blob[-(Bp // 32):].reshape(-1, 1)
                            >> np.arange(32, dtype=np.uint32)) & 1
                           ).reshape(Bp).astype(bool)
                ok = ~ovf[:B]
                ksub = sub[ok]
                todo[ksub] = False
                kec = np.minimum(ec[:B][ok], out_w).astype(np.int64)
                bb, tt = np.nonzero(
                    np.arange(out_w)[None, :] < kec[:, None])
                if len(bb):
                    emits.append((ksub[bb],
                                  m_a[:B][ok][bb, tt].astype(np.int32),
                                  n_a[:B][ok][bb, tt].astype(np.int32),
                                  s8[:B][ok][bb, tt].astype(np.int32)))
                fails.append(sub[~ok])
            fails = (np.concatenate(fails) if fails
                     else np.zeros(0, np.int64))
            if len(fails):
                if ti + 1 >= len(tiers):
                    # the emission bound (<= numPrev+1 <= read length)
                    # guarantees the full-width tier never overflows;
                    # a violation must fail loudly, not truncate
                    raise RuntimeError(
                        f"fmi: {len(fails)} items overflowed the "
                        f"full-width prev/emit buffers (P={Pmax})")
                tier_of[fails] = ti + 1
        if not emits:
            z = np.zeros(0, np.int32)
            return z, z, z, z
        ib = np.concatenate([e[0] for e in emits])
        mm = np.concatenate([e[1] for e in emits])
        nn = np.concatenate([e[2] for e in emits])
        ss = np.concatenate([e[3] for e in emits])
        return ib, mm, nn, ss

    def bwt_seed_batch(self, qdb_j, qoff, qlen, rid, max_intv: int,
                       min_seed: int, Rcap: int = 16):
        from genarchbench_tpu.sharding.mesh import pad_batch, shard_args

        B = len(qoff)
        Bp = pad_batch(1 << max(B - 1, 1).bit_length(), self.mesh)
        pad = Bp - B
        padi = lambda a, f=0: np.concatenate(
            [a, np.full(pad, f, a.dtype)]).astype(np.int32)
        qoff_j, qlen_j = shard_args(self.mesh, padi(qoff), padi(qlen))
        mi_j = jnp.asarray(np.int32(max_intv))
        x = shard_args(self.mesh, np.zeros(Bp, np.int32))[0]
        if self.table_axis is not None:
            fn = self._fn(_bwt_seed_device,
                          {"min_seed": min_seed, "Rcap": Rcap})
            call = lambda x: fn(*self._tables(), qdb_j, qoff_j,
                                qlen_j, mi_j, x)
        else:
            call = lambda x: _bwt_seed_device(
                *self._tables(), qdb_j, qoff_j, qlen_j, mi_j, x,
                min_seed=min_seed, Rcap=Rcap)
        chunks = []
        while True:
            out, x = call(x)
            chunks.append(np.asarray(out))
            xh = np.asarray(x)
            if not (xh[:B] < qlen).any():
                break
            x = shard_args(self.mesh, xh.astype(np.int32))[0]
        out = np.concatenate(chunks, axis=1)[:B]
        bb, rr = np.nonzero(out != 0xFFFFFFFF)
        packed = out[bb, rr]
        return (rid[bb], (packed >> 16).astype(np.int32),
                (packed & 0xFFFF).astype(np.int32))


def search_reads(fmi: FMISearch, reads: List[np.ndarray],
                 batch_size: int, min_seed: int) -> List[List[Tuple]]:
    """The driver's 3-pass batch loop (fmi.cpp:262-356).

    The reference's batch_size (512) is an OMP work-granularity knob
    that does not affect results (reads are independent; the final
    order is the global (rid, m, -n) stable sort because rids
    partition across batches).  The TPU formulation decouples the
    passes entirely: restart positions for ALL reads first (narrow
    lockstep chains), then every (read, x0) backward search as one
    flat sorted item sweep — lanes replace the reference's
    OMP-dynamic-for over 512-read batches.  Returns ONE group holding
    the globally sorted (rid, m, n) arrays."""
    n = len(reads)
    Lmax = 1 << max(max(len(r) for r in reads) - 1, 1).bit_length()
    if Lmax > 0xFFFF:
        raise ValueError("fmi: reads longer than 65535 bases are not "
                         "supported by the packed item pipeline")
    split_len = int(min_seed * SPLIT_FACTOR + .499)
    qdb = np.full(n * Lmax, 4, np.uint8)
    qlen = np.zeros(n, np.int32)
    for b, r in enumerate(reads):
        qdb[b * Lmax:b * Lmax + len(r)] = r
        qlen[b] = len(r)
    qoff = np.arange(n, dtype=np.int32) * Lmax
    qdb_j = fmi._replicate(jnp.asarray(qdb.astype(np.int32)))

    # phase A: restart discovery, chunked only to bound lane count
    # (lane-count fixed costs dominate the narrow bodies, so run the
    # widest batch the emission buffers allow)
    scan_b = min(1 << 18, max(1024, (256 << 20) // Lmax))
    ridx_l, x0_l, nend_l = [], [], []
    for i in range(0, n, scan_b):
        ridx, x0, nend = fmi.restart_items(
            qdb_j, qoff[i:i + scan_b], qlen[i:i + scan_b], 1)
        ridx_l.append(ridx + i)
        x0_l.append(x0)
        nend_l.append(nend)
    ridx = np.concatenate(ridx_l)
    x0 = np.concatenate(x0_l)
    nend = np.concatenate(nend_l)

    # phase B / pass 1: one backward search per restart item
    ib, m1, n1, sp1 = fmi.onepos_items(
        qdb_j, qoff[ridx], qlen[ridx], x0,
        np.ones(len(ridx), np.int32), nend - x0 + 1, min_seed)
    r1 = ridx[ib]

    # pass 2: filter + reseed (fmi.cpp:301-324) — same item machinery,
    # one item per kept SMEM, fwd length unknown (bounded by the read)
    keep = ((n1 + 1 - m1) >= split_len) & (sp1 <= SPLIT_WIDTH)
    rr = r1[keep].astype(np.int32)
    if len(rr):
        rx0 = ((n1 + 1 + m1)[keep] >> 1).astype(np.int32)
        ib2, m2, n2, _ = fmi.onepos_items(
            qdb_j, qoff[rr], qlen[rr], rx0,
            (sp1[keep] + 1).astype(np.int32),
            qlen[rr] - rx0, min_seed)
        r2 = rr[ib2]
    else:
        r2 = m2 = n2 = np.zeros(0, np.int32)

    # pass 3: LAST (bwtSeedStrategy), per-read lockstep
    s3r, s3m, s3n = [], [], []
    for i in range(0, n, scan_b):
        rid = np.arange(i, min(i + scan_b, n), dtype=np.int32)
        rb, mb, nb = fmi.bwt_seed_batch(
            qdb_j, qoff[i:i + scan_b], qlen[i:i + scan_b], rid,
            MAX_MEM_INTV, min_seed + 1)
        s3r.append(rb)
        s3m.append(mb)
        s3n.append(nb)

    r_all = np.concatenate([r1, r2] + s3r)
    m_all = np.concatenate([m1, m2] + s3m)
    n_all = np.concatenate([n1, n2] + s3n)
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
    if (index.seq_len > 0x7FFFFFFD
            or os.environ.get("GENARCH_FMI_FORCE_WIDE") == "1"):
        # human-scale index: row state must be int64 (process-global
        # flag, safe here — this process only runs the fmi kernel)
        jax.config.update("jax_enable_x64", True)
    from genarchbench_tpu.sharding.mesh import data_mesh
    fmi = FMISearch(
        index, mesh=data_mesh(),
        shard_tables=os.environ.get("GENARCH_FMI_SHARD_TABLES",
                                    "0") == "1")

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
