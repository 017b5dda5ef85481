"""Native (C) runtime components, built on demand with the system
compiler and loaded via ctypes; every user has a pure-Python fallback.

The reference's runtime around its kernels is C/C++ (htslib BAM I/O,
drivers); these fill the same role for the hot host-side paths."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build(so_path: str) -> bool:
    src = os.path.join(_DIR, "bgzf_native.c")
    cc = os.environ.get("CC", "cc")
    r = subprocess.run(
        [cc, "-O3", "-shared", "-fPIC", "-o", so_path, src, "-lz"],
        capture_output=True, text=True)
    if r.returncode != 0:
        print(f"[genarchbench_tpu.native] build failed: "
              f"{r.stderr[-200:]}", file=sys.stderr)
        return False
    return True


def bgzf_lib() -> Optional[ctypes.CDLL]:
    """The native BGZF decoder, building it on first use; None when no
    compiler is available (callers fall back to pure Python)."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so_path = os.path.join(_DIR, "bgzf_native.so")
    if not os.path.exists(so_path) or (
            os.path.getmtime(so_path)
            < os.path.getmtime(os.path.join(_DIR, "bgzf_native.c"))):
        if not _build(so_path):
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.bgzf_decompressed_size.restype = ctypes.c_int64
    lib.bgzf_decompressed_size.argtypes = [
        ctypes.c_char_p, ctypes.c_int64]
    lib.bgzf_decompress.restype = ctypes.c_int64
    lib.bgzf_decompress.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    _LIB = lib
    return lib


_READERS: Optional[ctypes.CDLL] = None
_READERS_TRIED = False


def readers_lib() -> Optional[ctypes.CDLL]:
    """Native text-format readers (readers.c), built on first use."""
    global _READERS, _READERS_TRIED
    if _READERS is not None or _READERS_TRIED:
        return _READERS
    _READERS_TRIED = True
    if os.environ.get("GENARCH_NO_NATIVE"):
        return None
    src = os.path.join(_DIR, "readers.c")
    sais_src = os.path.join(_DIR, "sais.c")
    poa_src = os.path.join(_DIR, "poa_graph.c")
    so_path = os.path.join(_DIR, "readers.so")
    if not os.path.exists(so_path) or (
            os.path.getmtime(so_path) < max(os.path.getmtime(src),
                                            os.path.getmtime(sais_src),
                                            os.path.getmtime(poa_src))):
        cc = os.environ.get("CC", "cc")
        r = subprocess.run(
            [cc, "-O3", "-shared", "-fPIC", "-o", so_path, src,
             sais_src, poa_src, "-lz"],
            capture_output=True, text=True)
        if r.returncode != 0:
            print(f"[genarchbench_tpu.native] readers build failed: "
                  f"{r.stderr[-200:]}", file=sys.stderr)
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    i64 = ctypes.c_int64
    p64 = ctypes.POINTER(i64)
    pu8 = ctypes.POINTER(ctypes.c_uint8)
    p32 = ctypes.POINTER(ctypes.c_int32)
    pu64 = ctypes.POINTER(ctypes.c_uint64)
    pd = ctypes.POINTER(ctypes.c_double)
    lib.nib_fill_pack.restype = None
    lib.nib_fill_pack.argtypes = [pu8, p64, p64, p32, i64, i64,
                                  ctypes.c_uint8, pu8]
    lib.fasta_scan.restype = i64
    lib.fasta_scan.argtypes = [ctypes.c_char_p, i64, p64, p64, p64]
    lib.fasta_load.restype = i64
    lib.fasta_load.argtypes = [ctypes.c_char_p, i64, ctypes.c_int,
                               pu8, p64, ctypes.c_char_p]
    lib.seqpair_scan.restype = i64
    lib.seqpair_scan.argtypes = [ctypes.c_char_p, p64, p64]
    lib.seqpair_load.restype = i64
    lib.seqpair_load.argtypes = [ctypes.c_char_p, ctypes.c_int, pu8, p64]
    lib.bsw_scan.restype = i64
    lib.bsw_scan.argtypes = [ctypes.c_char_p, p64, p64]
    lib.bsw_load.restype = i64
    lib.bsw_load.argtypes = [ctypes.c_char_p, p32, p32, p64]
    lib.chain_scan.restype = i64
    lib.chain_scan.argtypes = [ctypes.c_char_p, p64, p64]
    lib.chain_load.restype = i64
    lib.chain_load.argtypes = [ctypes.c_char_p, p64, pd, p64, p64, p64,
                               p64, pu64, pu64]
    lib.fast_chain_scores.restype = None
    lib.fast_chain_scores.argtypes = [
        i64, i64, p64, pd, ctypes.POINTER(ctypes.c_uint32), p32, pu8,
        p32, p32]
    lib.minimizer_scan.restype = i64
    lib.minimizer_scan.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), i64, i64, p64]
    lib.sais_u8.restype = ctypes.c_int
    lib.sais_u8.argtypes = [pu8, i64, i64, p64]
    lib.pileup_events.restype = i64
    lib.pileup_events.argtypes = [
        i64, p64, p32, p32, p32, p64, p32, p32, p64, pu8, pu8,
        ctypes.c_int32, i64, i64, ctypes.c_int32, p32,
        p64, pu8, p64, p64, p64, i64]
    lib.pileup_counts.restype = i64
    lib.pileup_counts.argtypes = [
        i64, p64, p32, p32, p32, p64, p32, p32, p64, pu8, pu8,
        ctypes.c_int32, i64, i64, ctypes.c_int32, p32,
        p64, pu8, p64, p64, i64]
    pf = ctypes.POINTER(ctypes.c_float)
    lib.peak_detect.restype = i64
    lib.peak_detect.argtypes = [pf, pf, i64, ctypes.c_float,
                                ctypes.c_float, i64, i64,
                                ctypes.c_float, p64]
    lib.chain_window_starts.restype = None
    lib.wfa_cigars.restype = None
    lib.chain_dp_scalar.restype = None
    lib.chain_window_starts.argtypes = [i64, p64, pu64, p64, i64, p32]
    vp = ctypes.c_void_p
    p16 = ctypes.POINTER(ctypes.c_int16)
    lib.poa_new.restype = vp
    lib.poa_free.argtypes = [vp]
    lib.poa_add_alignment.restype = ctypes.c_int
    lib.poa_add_alignment.argtypes = [vp, p16, p16, i64, pu8, i64,
                                      ctypes.c_int]
    lib.poa_num_ranks.restype = i64
    lib.poa_num_ranks.argtypes = [vp]
    lib.poa_get_ranks.argtypes = [vp, p32]
    lib.poa_max_in_edges.restype = i64
    lib.poa_max_in_edges.argtypes = [vp]
    lib.poa_export_dp.argtypes = [vp, i64, p32, p32, p32, pu8, p64,
                                  p64, i64, i64, i64, i64]
    lib.poa_consensus.restype = i64
    lib.poa_consensus.argtypes = [vp, pu8, i64]
    _READERS = lib
    return lib


def _as_ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def fasta_native(path: str, min_len: int, table: int):
    """(names, [code arrays]) via the native reader; None on failure."""
    import numpy as np
    lib = readers_lib()
    if lib is None:
        return None
    n = ctypes.c_int64()
    bases = ctypes.c_int64()
    namebytes = ctypes.c_int64()
    if lib.fasta_scan(path.encode(), min_len, ctypes.byref(n),
                      ctypes.byref(bases), ctypes.byref(namebytes)) != 0:
        return None
    nn, nb = n.value, bases.value
    codes = np.empty(nb, np.uint8)
    offsets = np.zeros(nn + 1, np.int64)
    names_buf = ctypes.create_string_buffer(max(namebytes.value, 1))
    got = lib.fasta_load(path.encode(), min_len, table,
                         _as_ptr(codes, ctypes.c_uint8),
                         _as_ptr(offsets, ctypes.c_int64), names_buf)
    if got != nn:
        return None
    names = names_buf.raw[:namebytes.value].decode().splitlines()
    seqs = [codes[offsets[i]:offsets[i + 1]] for i in range(nn)]
    return names, seqs


def seqpair_native(path: str, swap_longer_first: bool):
    import numpy as np
    lib = readers_lib()
    if lib is None:
        return None
    n = ctypes.c_int64()
    bases = ctypes.c_int64()
    if lib.seqpair_scan(path.encode(), ctypes.byref(n),
                        ctypes.byref(bases)) != 0:
        return None
    nn, nb = n.value, bases.value
    codes = np.empty(max(nb, 1), np.uint8)
    offsets = np.zeros(2 * nn + 1, np.int64)
    got = lib.seqpair_load(path.encode(), int(swap_longer_first),
                           _as_ptr(codes, ctypes.c_uint8),
                           _as_ptr(offsets, ctypes.c_int64))
    if got != nn:
        return None
    pats = [codes[offsets[2 * i]:offsets[2 * i + 1]] for i in range(nn)]
    txts = [codes[offsets[2 * i + 1]:offsets[2 * i + 2]] for i in range(nn)]
    return pats, txts


def bsw_native(path: str):
    import numpy as np
    lib = readers_lib()
    if lib is None:
        return None
    n = ctypes.c_int64()
    bases = ctypes.c_int64()
    if lib.bsw_scan(path.encode(), ctypes.byref(n),
                    ctypes.byref(bases)) != 0:
        return None
    nn, nb = n.value, bases.value
    h0 = np.zeros(max(nn, 1), np.int32)
    codes = np.empty(max(nb, 1), np.int32)
    offsets = np.zeros(2 * nn + 1, np.int64)
    got = lib.bsw_load(path.encode(), _as_ptr(h0, ctypes.c_int32),
                       _as_ptr(codes, ctypes.c_int32),
                       _as_ptr(offsets, ctypes.c_int64))
    if got != nn:
        return None
    refs = [codes[offsets[2 * i]:offsets[2 * i + 1]] for i in range(nn)]
    qrs = [codes[offsets[2 * i + 1]:offsets[2 * i + 2]] for i in range(nn)]
    return h0[:nn], refs, qrs


def chain_native(path: str):
    """[(n, avg_qspan, mdx, mdy, bw, nsegs, x, y)] or None."""
    import numpy as np
    lib = readers_lib()
    if lib is None:
        return None
    nrec = ctypes.c_int64()
    nanch = ctypes.c_int64()
    if lib.chain_scan(path.encode(), ctypes.byref(nrec),
                      ctypes.byref(nanch)) != 0:
        return None
    nr, na = nrec.value, nanch.value
    ns = np.zeros(max(nr, 1), np.int64)
    avg = np.zeros(max(nr, 1), np.float64)
    mdx = np.zeros(max(nr, 1), np.int64)
    mdy = np.zeros(max(nr, 1), np.int64)
    bw = np.zeros(max(nr, 1), np.int64)
    nsg = np.zeros(max(nr, 1), np.int64)
    xs = np.zeros(max(na, 1), np.uint64)
    ys = np.zeros(max(na, 1), np.uint64)
    got = lib.chain_load(path.encode(), _as_ptr(ns, ctypes.c_int64),
                         _as_ptr(avg, ctypes.c_double),
                         _as_ptr(mdx, ctypes.c_int64),
                         _as_ptr(mdy, ctypes.c_int64),
                         _as_ptr(bw, ctypes.c_int64),
                         _as_ptr(nsg, ctypes.c_int64),
                         _as_ptr(xs, ctypes.c_uint64),
                         _as_ptr(ys, ctypes.c_uint64))
    if got != nr:
        return None
    out = []
    w = 0
    for i in range(nr):
        n_i = int(ns[i])
        out.append((n_i, float(avg[i]), int(mdx[i]), int(mdy[i]),
                    int(bw[i]), int(nsg[i]),
                    xs[w:w + n_i].copy(), ys[w:w + n_i].copy()))
        w += n_i
    return out


def pileup_events_native(flat, chrom_id, start, end, filter_flags,
                         num2countbase):
    """(cov, present, ev_p, ev_j, ev_f) for one pileup chunk via the
    native CIGAR walker; None when the library is unavailable.  `flat`
    is the tuple from kernels.pileup._flatten_records."""
    import numpy as np
    lib = readers_lib()
    if lib is None:
        return None
    (n, rpos, rflag, rmapq, rrefid, cig_off, cig_op, cig_len,
     seq_off, nt16, qual) = flat
    span = end - start
    cov = np.full(span, -1, np.int64)
    present = np.zeros(span, np.uint8)
    n2c = np.ascontiguousarray(num2countbase, np.int32)
    args0 = (n, _as_ptr(rpos, ctypes.c_int64),
             _as_ptr(rflag, ctypes.c_int32),
             _as_ptr(rmapq, ctypes.c_int32),
             _as_ptr(rrefid, ctypes.c_int32),
             _as_ptr(cig_off, ctypes.c_int64),
             _as_ptr(cig_op, ctypes.c_int32),
             _as_ptr(cig_len, ctypes.c_int32),
             _as_ptr(seq_off, ctypes.c_int64),
             _as_ptr(nt16, ctypes.c_uint8),
             _as_ptr(qual, ctypes.c_uint8),
             chrom_id, start, end, filter_flags,
             _as_ptr(n2c, ctypes.c_int32),
             _as_ptr(cov, ctypes.c_int64),
             _as_ptr(present, ctypes.c_uint8))
    zero = np.zeros(1, np.int64)
    m = lib.pileup_events(*args0, _as_ptr(zero, ctypes.c_int64),
                          _as_ptr(zero, ctypes.c_int64),
                          _as_ptr(zero, ctypes.c_int64), 0)
    cov[:] = -1
    present[:] = 0
    ev_p = np.empty(max(m, 1), np.int64)
    ev_j = np.empty(max(m, 1), np.int64)
    ev_f = np.empty(max(m, 1), np.int64)
    m2 = lib.pileup_events(*args0, _as_ptr(ev_p, ctypes.c_int64),
                           _as_ptr(ev_j, ctypes.c_int64),
                           _as_ptr(ev_f, ctypes.c_int64), max(m, 1))
    if m2 != m:
        return None
    return cov, present.astype(bool), ev_p[:m], ev_j[:m], ev_f[:m]


def chain_window_starts_native(xs, mdxs, max_iter):
    """Window starts for a list of sorted uint64 anchor arrays; None
    when the native library is unavailable."""
    import numpy as np
    lib = readers_lib()
    if lib is None:
        return None
    offs = np.zeros(len(xs) + 1, np.int64)
    np.cumsum([len(x) for x in xs], out=offs[1:])
    flat = (np.concatenate(xs).astype(np.uint64) if len(xs)
            else np.zeros(0, np.uint64))
    mdx = np.asarray(mdxs, np.int64)
    out = np.empty(max(len(flat), 1), np.int32)
    lib.chain_window_starts(
        len(xs), _as_ptr(offs, ctypes.c_int64),
        _as_ptr(flat, ctypes.c_uint64), _as_ptr(mdx, ctypes.c_int64),
        max_iter, _as_ptr(out, ctypes.c_int32))
    return [out[offs[i]:offs[i + 1]].copy() for i in range(len(xs))]


def pileup_cov_native(flat, chrom_id, start, end, filter_flags,
                      num2countbase):
    """(cov, present) coverage/presence pass only (no event list)."""
    import numpy as np
    lib = readers_lib()
    if lib is None:
        return None
    (n, rpos, rflag, rmapq, rrefid, cig_off, cig_op, cig_len,
     seq_off, nt16, qual) = flat
    span = end - start
    cov = np.full(span, -1, np.int64)
    present = np.zeros(span, np.uint8)
    n2c = np.ascontiguousarray(num2countbase, np.int32)
    zero = np.zeros(1, np.int64)
    lib.pileup_events(
        n, _as_ptr(rpos, ctypes.c_int64), _as_ptr(rflag, ctypes.c_int32),
        _as_ptr(rmapq, ctypes.c_int32), _as_ptr(rrefid, ctypes.c_int32),
        _as_ptr(cig_off, ctypes.c_int64), _as_ptr(cig_op, ctypes.c_int32),
        _as_ptr(cig_len, ctypes.c_int32), _as_ptr(seq_off, ctypes.c_int64),
        _as_ptr(nt16, ctypes.c_uint8), _as_ptr(qual, ctypes.c_uint8),
        chrom_id, start, end, filter_flags, _as_ptr(n2c, ctypes.c_int32),
        _as_ptr(cov, ctypes.c_int64), _as_ptr(present, ctypes.c_uint8),
        _as_ptr(zero, ctypes.c_int64), _as_ptr(zero, ctypes.c_int64),
        _as_ptr(zero, ctypes.c_int64), 0)
    return cov, present.astype(bool)


def pileup_counts_native(flat, chrom_id, start, end, filter_flags,
                         num2countbase, colof, ncols, width):
    """Direct count matrix (ncols, width) int64 via the one-pass C
    scatter; None when the library is unavailable."""
    import numpy as np
    lib = readers_lib()
    if lib is None:
        return None
    (n, rpos, rflag, rmapq, rrefid, cig_off, cig_op, cig_len,
     seq_off, nt16, qual) = flat
    span = end - start
    cov = np.full(span, -1, np.int64)
    present = np.zeros(span, np.uint8)
    n2c = np.ascontiguousarray(num2countbase, np.int32)
    colof = np.ascontiguousarray(colof, np.int64)
    mat = np.zeros((max(ncols, 1), width), np.int64)
    lib.pileup_counts(
        n, _as_ptr(rpos, ctypes.c_int64), _as_ptr(rflag, ctypes.c_int32),
        _as_ptr(rmapq, ctypes.c_int32), _as_ptr(rrefid, ctypes.c_int32),
        _as_ptr(cig_off, ctypes.c_int64), _as_ptr(cig_op, ctypes.c_int32),
        _as_ptr(cig_len, ctypes.c_int32), _as_ptr(seq_off, ctypes.c_int64),
        _as_ptr(nt16, ctypes.c_uint8), _as_ptr(qual, ctypes.c_uint8),
        chrom_id, start, end, filter_flags, _as_ptr(n2c, ctypes.c_int32),
        _as_ptr(cov, ctypes.c_int64), _as_ptr(present, ctypes.c_uint8),
        _as_ptr(colof, ctypes.c_int64),
        _as_ptr(mat, ctypes.c_int64), width)
    return mat[:ncols]


def sais_native(codes):
    """Suffix array of `codes` (values < 250) via linear-time SA-IS in
    C; None when the native library is unavailable.  Matches the
    shorter-suffix-first (sentinel) lexicographic order."""
    import numpy as np
    lib = readers_lib()
    if lib is None:
        return None
    n = len(codes)
    T = np.empty(n + 1, np.uint8)
    T[:n] = codes + 1                       # shift so 0 is unique-min
    T[n] = 0
    SA = np.empty(n + 1, np.int64)
    K = int(T.max()) + 1
    if lib.sais_u8(_as_ptr(T, ctypes.c_uint8), n + 1, K,
                   _as_ptr(SA, ctypes.c_int64)) != 0:
        return None
    return SA[1:]                           # drop the sentinel row


def minimizer_scan_native(hashes, window: int):
    """Positions emitted by the Flye minimizer deque over `hashes`;
    None when the native library is unavailable."""
    import numpy as np
    lib = readers_lib()
    if lib is None:
        return None
    h = np.ascontiguousarray(hashes, np.uint64)
    out = np.empty(len(h), np.int64)
    m = lib.minimizer_scan(_as_ptr(h, ctypes.c_uint64), len(h),
                           window, _as_ptr(out, ctypes.c_int64))
    if m < 0:
        return None
    return out[:m]


def fast_chain_scores_native(ns, avg, x_lo, qi, span, parents):
    """Reconstruct fast-chain scores (B,N) i32 from padded parents;
    None when the native library is unavailable."""
    import numpy as np
    lib = readers_lib()
    if lib is None:
        return None
    B, N = parents.shape
    ns = np.ascontiguousarray(ns, np.int64)
    avg = np.ascontiguousarray(avg, np.float64)
    x_lo = np.ascontiguousarray(x_lo, np.uint32)
    qi = np.ascontiguousarray(qi, np.int32)
    span = np.ascontiguousarray(span, np.uint8)
    parents = np.ascontiguousarray(parents, np.int32)
    scores = np.zeros((B, N), np.int32)
    lib.fast_chain_scores(
        B, N, _as_ptr(ns, ctypes.c_int64), _as_ptr(avg, ctypes.c_double),
        _as_ptr(x_lo, ctypes.c_uint32), _as_ptr(qi, ctypes.c_int32),
        _as_ptr(span, ctypes.c_uint8), _as_ptr(parents, ctypes.c_int32),
        _as_ptr(scores, ctypes.c_int32))
    return scores


def chain_scores_peaks_native(ns, offs, avg, x_flat, qi_flat, span_flat,
                              sid_flat, delta):
    """Decode delta-u8 parents and reconstruct chain scores+peaks
    (B,N) i32 from the RAGGED flat anchor arrays (offs[b] = start of
    record b) with the reference's f64 gap cost; None when the native
    library is unavailable."""
    import numpy as np
    lib = readers_lib()
    if lib is None:
        return None
    B, N = delta.shape
    ns = np.ascontiguousarray(ns, np.int64)
    offs = np.ascontiguousarray(offs, np.int64)
    avg = np.ascontiguousarray(avg, np.float64)
    x_flat = np.ascontiguousarray(x_flat, np.uint32)
    qi_flat = np.ascontiguousarray(qi_flat, np.int32)
    span_flat = np.ascontiguousarray(span_flat, np.uint8)
    sid_flat = np.ascontiguousarray(sid_flat, np.uint8)
    delta = np.ascontiguousarray(delta, np.uint8)
    parents = np.full((B, N), -1, np.int32)
    scores = np.zeros((B, N), np.int32)
    peaks = np.zeros((B, N), np.int32)
    lib.chain_scores_peaks(
        ctypes.c_int64(B), ctypes.c_int64(N),
        _as_ptr(ns, ctypes.c_int64), _as_ptr(offs, ctypes.c_int64),
        _as_ptr(avg, ctypes.c_double),
        _as_ptr(x_flat, ctypes.c_uint32), _as_ptr(qi_flat, ctypes.c_int32),
        _as_ptr(span_flat, ctypes.c_uint8), _as_ptr(sid_flat, ctypes.c_uint8),
        _as_ptr(delta, ctypes.c_uint8), _as_ptr(parents, ctypes.c_int32),
        _as_ptr(scores, ctypes.c_int32), _as_ptr(peaks, ctypes.c_int32))
    return scores, parents, peaks


def chain_gap_corr_native(avg32, t_size, ck, safe_prod):
    """Sparse f32-vs-f64 gap-cost corrections per record: returns
    (corr_dd, corr_delta, over) with over a bool array of rows needing
    the exact-table path; None when the native library is
    unavailable."""
    import numpy as np
    lib = readers_lib()
    if lib is None:
        return None
    avg32 = np.ascontiguousarray(avg32, np.float32)
    nb = len(avg32)
    corr_dd = np.full((nb, ck), -1, np.int32)
    corr_delta = np.zeros((nb, ck), np.int32)
    over = np.zeros(nb, np.uint8)
    lib.chain_gap_corr(
        ctypes.c_int64(nb), _as_ptr(avg32, ctypes.c_float),
        ctypes.c_int64(t_size), ctypes.c_int64(ck),
        ctypes.c_double(safe_prod), _as_ptr(corr_dd, ctypes.c_int32),
        _as_ptr(corr_delta, ctypes.c_int32),
        _as_ptr(over, ctypes.c_uint8))
    return corr_dd, corr_delta, over


def bgzf_decompress(raw: bytes) -> Optional[bytes]:
    """Decode a whole BGZF byte string natively; None on any failure
    (caller falls back to the Python decoder)."""
    lib = bgzf_lib()
    if lib is None:
        return None
    n = lib.bgzf_decompressed_size(raw, len(raw))
    if n < 0:
        return None
    buf = (ctypes.c_uint8 * n)()
    w = lib.bgzf_decompress(raw, len(raw), buf, n)
    if w != n:
        return None
    return bytes(buf)


def nib_fill_pack(flat, off, src, lens, width: int, dummy: int):
    """C gather+4-bit-pack for bsw batch assembly; None -> caller falls
    back to the numpy path.  flat uint8, off int64 (n+1), src int64
    (rows,), lens int32 (rows,) -> (rows, width//2) uint8."""
    import numpy as np
    lib = readers_lib()
    if lib is None:
        return None
    rows = len(src)
    out = np.empty((rows, width // 2), np.uint8)
    lib.nib_fill_pack(_as_ptr(flat, ctypes.c_uint8),
                      _as_ptr(off, ctypes.c_int64),
                      _as_ptr(src, ctypes.c_int64),
                      _as_ptr(lens, ctypes.c_int32),
                      rows, width, dummy,
                      _as_ptr(out, ctypes.c_uint8))
    return out


def peak_detect_native(t1, t2, thr1, thr2, wl1, wl2, peak_height):
    """C short_long_peak_detector; None -> pure-Python fallback.
    t1/t2 float32 t-stat arrays -> int64 peak positions (count-sized)."""
    import numpy as np
    lib = readers_lib()
    if lib is None:
        return None
    n = len(t1)
    out = np.zeros(n, np.int64)
    pc = lib.peak_detect(_as_ptr(t1, ctypes.c_float),
                         _as_ptr(t2, ctypes.c_float), n,
                         thr1, thr2, wl1, wl2, peak_height,
                         _as_ptr(out, ctypes.c_int64))
    return out, int(pc)


def wfa_cigars_native(nmats, ops, gap_t, gap_v, fm, fd, fi, nsteps):
    """RLE-CIGAR strings from the wfa backtrace's emission-order
    records (kernels/wfa.py::_assemble_cigar semantics); None when the
    native library is unavailable.  The per-lane Python assembly was
    ~70% of the warm wfa wall time on the bench input."""
    import numpy as np
    lib = readers_lib()
    if lib is None:
        return None
    B, T = nmats.shape
    nmats = np.ascontiguousarray(nmats, np.int16)
    ops = np.ascontiguousarray(ops, np.int8)
    gap_t = np.ascontiguousarray(gap_t, np.int32)
    gap_v = np.ascontiguousarray(gap_v, np.int32)
    fm = np.ascontiguousarray(fm, np.int32)
    fd = np.ascontiguousarray(fd, np.int32)
    fi = np.ascontiguousarray(fi, np.int32)
    stride = 12 * max(int(nsteps), 1) + 96
    out = np.zeros((B, stride), np.uint8)
    outlen = np.zeros(B, np.int32)
    lib.wfa_cigars(
        ctypes.c_int64(B), ctypes.c_int64(T), ctypes.c_int64(nsteps),
        _as_ptr(nmats, ctypes.c_int16), _as_ptr(ops, ctypes.c_int8),
        _as_ptr(gap_t, ctypes.c_int32), _as_ptr(gap_v, ctypes.c_int32),
        _as_ptr(fm, ctypes.c_int32), _as_ptr(fd, ctypes.c_int32),
        _as_ptr(fi, ctypes.c_int32),
        out.ctypes.data_as(ctypes.c_char_p), ctypes.c_int64(stride),
        _as_ptr(outlen, ctypes.c_int32))
    return [out[b, :outlen[b]].tobytes().decode() for b in range(B)]


def chain_dp_scalar_native(records, idxs, with_heuristics, results):
    """Exact scalar chain DP for DEFERRED records (those whose sparse
    f32 gap corrections cannot be bounded): fills results[k] for each
    k in idxs and returns True, or False when the native library is
    unavailable.  A handful of records at O(n * window) scalar cost is
    microseconds — far below the device compile + dispatch the dense
    exact-table fallback paid."""
    import numpy as np
    lib = readers_lib()
    if lib is None:
        return False
    from genarchbench_tpu.io import chain_io
    from genarchbench_tpu.kernels.chain import MAX_ITER, _flat_decode
    recs = [records[k] for k in idxs]
    ns = np.array([r.n for r in recs], np.int64)
    offs = np.concatenate([[0], np.cumsum(ns)[:-1]]).astype(np.int64)
    M = int(ns.sum())
    x_lo, qi, span, sid = _flat_decode(
        [r.x for r in recs if r.n], [r.y for r in recs if r.n])
    st = np.zeros(M, np.int32)
    for o, ws in zip(offs, chain_io.window_starts_all(recs, MAX_ITER)):
        st[o:o + len(ws)] = ws
    avg = np.array([r.avg_qspan for r in recs], np.float64)
    mdx = np.array([r.max_dist_x for r in recs], np.int32)
    mdy = np.array([r.max_dist_y for r in recs], np.int32)
    bw = np.array([r.bw for r in recs], np.int32)
    nsegs = np.array([r.n_segs for r in recs], np.int32)
    scores = np.zeros(M, np.int32)
    parents = np.zeros(M, np.int32)
    peaks = np.zeros(M, np.int32)
    lib.chain_dp_scalar(
        ctypes.c_int64(len(recs)), _as_ptr(ns, ctypes.c_int64),
        _as_ptr(offs, ctypes.c_int64), _as_ptr(avg, ctypes.c_double),
        _as_ptr(mdx, ctypes.c_int32), _as_ptr(mdy, ctypes.c_int32),
        _as_ptr(bw, ctypes.c_int32), _as_ptr(nsegs, ctypes.c_int32),
        _as_ptr(x_lo, ctypes.c_uint32), _as_ptr(qi, ctypes.c_int32),
        _as_ptr(span, ctypes.c_uint8), _as_ptr(sid, ctypes.c_uint8),
        _as_ptr(st, ctypes.c_int32),
        ctypes.c_int32(1 if with_heuristics else 0),
        _as_ptr(scores, ctypes.c_int32), _as_ptr(parents, ctypes.c_int32),
        _as_ptr(peaks, ctypes.c_int32))
    for b, k in enumerate(idxs):
        o, m = int(offs[b]), int(ns[b])
        results[k] = (scores[o:o + m].copy(), parents[o:o + m].copy(),
                      peaks[o:o + m].copy())
    return True
