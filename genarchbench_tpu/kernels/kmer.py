"""kmer-cnt: canonical k-mer counting (Flye) — TPU-native.

Reference semantics: kmer-cnt/vertex_index.cpp COUNT_VERSION 3
(:790-860, equivalently the range-partitioned v2 at :683-785):
"Total k-mers" = number of DISTINCT canonical k-mers over all kept
reads (forward strand only, kmer-cnt/vertex_index.cpp:725-728), where
canonical = min(kmer, reverse_complement) (kmer.h:53-62), reads kept
when longer than max(min_read_length, min_overlap)
(kmer_cnt.cpp:200-210), k from the key=value config (config.h,
asm_raw_reads.cfg: kmer_size=17).

TPU-first design:
  * a k-mer code is an (hi, lo) int32 pair: hi = first (k-8) bases,
    lo = last 8 bases (34 bits for k=17 exceed int32; TPUs are
    int32-native so wide codes are pair-encoded instead of emulated
    64-bit).  Rolling fwd/rc codes for EVERY position of a read batch
    are computed as ~2k shifted multiply-adds on (B, L) tensors —
    no serial scan, no gathers.
  * distinct counting = lexicographic device sort of the (hi, lo)
    pairs + adjacent-difference reduction, replacing the reference's
    16 GB flat 4-bit counter (vertex_index.cpp:803-812): a sort does
    the same dedup with O(N log N) work on N actual k-mers instead of
    O(4^k) memory.
  * multi-chip: k-mer space is range-partitioned over the mesh by the
    code's top bits — exactly the reference v3's per-thread ranges —
    with an all_to_all exchange then per-device sort + psum
    (see `count_distinct_sharded`).
"""

from __future__ import annotations

import sys
import time
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from genarchbench_tpu.core.roi import ROITimer
from genarchbench_tpu.io.fasta_io import ReadSet, read_fasta
from genarchbench_tpu.sharding.batching import next_pow2

HI_SENTINEL = 1 << 29      # sorts after every valid hi code (hi < 4^9)


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@partial(jax.jit, static_argnames=("k",))
def _codes_device(seqs, lens, k):
    """Canonical (hi, lo) codes for every k-mer position of a read batch.

    seqs (B, L) int32 2-bit codes, lens (B,). Returns hi, lo (B, L) int32
    with invalid positions set to (HI_SENTINEL, 0)."""
    B, L = seqs.shape
    i32 = jnp.int32
    klo = min(k, 8)
    khi = k - klo

    pos = lax.broadcasted_iota(i32, (1, L), 1)

    def base(j):
        # seqs shifted left by j (base at position i+j), 0-padded
        if j == 0:
            return seqs
        return jnp.concatenate(
            [seqs[:, j:], jnp.zeros((B, j), i32)], axis=1)

    fwd_hi = jnp.zeros((B, L), i32)
    fwd_lo = jnp.zeros((B, L), i32)
    rc_hi = jnp.zeros((B, L), i32)
    rc_lo = jnp.zeros((B, L), i32)
    for j in range(k):
        b = base(j)
        c = 3 - b
        if j < khi:
            fwd_hi = fwd_hi * 4 + b        # big-endian: first bases high
        else:
            fwd_lo = fwd_lo * 4 + b
        # rc: base j contributes 4**j to the reversed-complement code
        if j < klo:
            rc_lo = rc_lo + c * (4 ** j)
        else:
            rc_hi = rc_hi + c * (4 ** (j - klo))

    use_rc = (rc_hi < fwd_hi) | ((rc_hi == fwd_hi) & (rc_lo < fwd_lo))
    hi = jnp.where(use_rc, rc_hi, fwd_hi)
    lo = jnp.where(use_rc, rc_lo, fwd_lo)
    # IterKmers stops at len-k (kmer.h:194-198): the final position is
    # NOT iterated — each read contributes len-k k-mers, not len-k+1.
    valid = pos < (lens[:, None] - k)
    hi = jnp.where(valid, hi, HI_SENTINEL)
    lo = jnp.where(valid, lo, 0)
    return hi, lo


@jax.jit
def _distinct_count_device(hi, lo):
    """ONE lexicographic sort, then count k-mers the way the reference
    does: its 8-bit flat counter re-counts a k-mer every time the
    counter wraps (vertex_index.cpp:820-833, 'WARNING: This is wrong if
    there is overflow'), so the reported total is
    sum(ceil(count / 256)) over distinct canonical k-mers — replicated
    here via the rank of each element within its sorted run.  Only the
    scalar leaves the device."""
    hi_s, lo_s = lax.sort((hi, lo), num_keys=2)
    n = hi_s.shape[0]
    first = jnp.concatenate([
        jnp.ones(1, bool),
        (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])])
    idx = jnp.arange(n, dtype=jnp.int32)
    seg_start = lax.associative_scan(
        jnp.maximum, jnp.where(first, idx, -1))
    rank = idx - seg_start
    return jnp.sum((rank % 256 == 0) & (hi_s < HI_SENTINEL))


def count_distinct(reads: ReadSet, k: int,
                   batch_bases: int = 1 << 25) -> int:
    """Total k-mers across all reads: per-batch (hi, lo) canonical-code
    computation on device (the ~2k-op rolling-code kernel is where the
    parallel work is), distinct-count merge on the HOST via np.unique.

    Reads are bucketed by POW2-padded length and processed in
    FIXED-size (B, L) chunks so the whole run compiles at most a couple
    of distinct programs — variable shapes would recompile the code
    kernel per batch (20-40 s each on a TPU tunnel).

    The merge is deliberately host-side: XLA's 1-D sort of millions of
    elements is minutes-slow on a single TPU core (measured), while
    np.unique on the packed 34-bit codes is sub-second; the device sort
    survives in `_distinct_count_device` for the multi-chip
    `count_distinct_sharded` path where each shard's slice is small.

    Replicates the reference's 8-bit counter overflow: a k-mer seen c
    times contributes ceil(c / 256) (vertex_index.cpp:820-833 re-counts
    on every wrap)."""
    from collections import defaultdict

    buckets = defaultdict(list)
    for i, s in enumerate(reads.seqs):
        Lpad = max(next_pow2(max(len(s), k), 2048), 2048)
        buckets[Lpad].append(i)

    parts = []
    for Lpad, idxs in sorted(buckets.items()):
        Bfix = max(8, min(_round_up(len(idxs), 8),
                          _round_up(batch_bases // Lpad, 8)))
        for lo_i in range(0, len(idxs), Bfix):
            chunk = idxs[lo_i:lo_i + Bfix]
            arr = np.zeros((Bfix, Lpad), np.int32)
            lens = np.zeros(Bfix, np.int32)
            for row, i in enumerate(chunk):
                s = reads.seqs[i]
                arr[row, :len(s)] = s
                lens[row] = len(s)
            hi, lo = _codes_device(jnp.asarray(arr), jnp.asarray(lens), k=k)
            hi = np.asarray(hi).ravel()
            lo = np.asarray(lo).ravel()
            real = hi < HI_SENTINEL
            parts.append(hi[real].astype(np.int64) * 65536
                         + lo[real].astype(np.int64))
    if not parts:
        return 0
    codes = np.concatenate(parts)
    _, counts = np.unique(codes, return_counts=True)
    return int(np.sum((counts + 255) // 256))


def count_distinct_hostmerge(reads: ReadSet, k: int,
                             batch_bases: int = 1 << 25) -> int:
    """Fallback for inputs whose code array exceeds device memory:
    per-batch device codes + np.unique merge on the host."""
    # pack reads into (B, L) batches bucketed by padded length
    order = np.argsort([len(s) for s in reads.seqs])[::-1]
    uniq_parts = []
    batch: list = []
    batch_cells = 0
    Lmax = 0

    def flush():
        nonlocal batch, batch_cells, Lmax
        if not batch:
            return
        B = len(batch)
        arr = np.zeros((B, Lmax), np.int32)
        lens = np.zeros(B, np.int32)
        for i, s in enumerate(batch):
            arr[i, :len(s)] = s
            lens[i] = len(s)
        hi, lo = _codes_device(jnp.asarray(arr), jnp.asarray(lens), k=k)
        hi = np.asarray(hi).ravel()
        lo = np.asarray(lo).ravel()
        real = hi < HI_SENTINEL
        code = hi[real].astype(np.int64) * 65536 + lo[real].astype(np.int64)
        uniq_parts.append(np.unique(code))
        batch, batch_cells, Lmax = [], 0, 0

    for i in order:
        s = reads.seqs[i].astype(np.int32)
        Lpad = _round_up(max(len(s), k), 256)
        if batch and (batch_cells + Lpad > batch_bases
                      or Lpad != Lmax):
            flush()
        Lmax = max(Lmax, Lpad)
        batch.append(s)
        batch_cells += Lpad
    flush()
    if not uniq_parts:
        return 0
    return int(np.unique(np.concatenate(uniq_parts)).size)


def count_distinct_sharded(reads: ReadSet, k: int, mesh=None,
                           capacity_factor: float = 2.0) -> int:
    """Multi-chip distinct count.

    K-mer space is partitioned over the mesh by a hash of the code (the
    role the reference v3's per-thread code ranges play,
    vertex_index.cpp:700-710; hashing instead of ranges balances skewed
    genomic k-mer distributions).  Each device buckets its local codes
    by owner, exchanges fixed-capacity buckets with `all_to_all` over
    ICI, then sorts + unique-counts its owned codes and `psum`s.  Bucket
    overflow is counted on device; if any overflow occurred the result
    falls back to the exact single-device path."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    if mesh is None:
        devs = np.array(jax.devices())
        mesh = Mesh(devs, ("kspace",))
    S = int(mesh.devices.size)
    if S == 1:
        return count_distinct(reads, k)

    Lmax = _round_up(max(max(len(s) for s in reads.seqs), k), 256)
    B = len(reads.seqs)
    arr = np.zeros((B, Lmax), np.int32)
    lens = np.zeros(B, np.int32)
    for i, s in enumerate(reads.seqs):
        arr[i, :len(s)] = s
        lens[i] = len(s)
    hi, lo = _codes_device(jnp.asarray(arr), jnp.asarray(lens), k=k)
    hi = np.asarray(hi).ravel()
    lo = np.asarray(lo).ravel()
    N = _round_up(len(hi), S * S * 128)
    hi = np.concatenate([hi, np.full(N - len(hi), HI_SENTINEL, np.int32)])
    lo = np.concatenate([lo, np.zeros(N - len(lo), np.int32)])
    C = _round_up(int(N // S // S * capacity_factor) + 128, 128)

    # multi-host mesh (after mesh.init_distributed): every process holds
    # the same full code array; hand jit this process's slice and stitch
    # them into one DCN-spanning global array
    mesh_procs = sorted({d.process_index for d in mesh.devices.flat})
    if len(mesh_procs) > 1:
        from jax.sharding import NamedSharding
        # rank within the processes actually in THIS mesh (a mesh over
        # a subset of jax.process_count() would otherwise misalign the
        # per-process slices)
        if jax.process_index() not in mesh_procs:
            raise ValueError(
                "count_kmers_sharded: calling process owns no devices "
                "in the mesh")
        pi = mesh_procs.index(jax.process_index())
        pc = len(mesh_procs)
        per = N // pc
        sh = NamedSharding(mesh, P("kspace"))
        hi = jax.make_array_from_process_local_data(
            sh, hi[pi * per:(pi + 1) * per], (N,))
        lo = jax.make_array_from_process_local_data(
            sh, lo[pi * per:(pi + 1) * per], (N,))

    @partial(shard_map, mesh=mesh, in_specs=(P("kspace"), P("kspace")),
             out_specs=(P(), P()))
    def shard_count(hi_l, lo_l):
        n = hi_l.shape[0]
        sent = hi_l >= HI_SENTINEL
        # uniform owner via an int32 mix of the code
        mix = (hi_l * jnp.int32(-1640531527)) ^ (lo_l * jnp.int32(-2048144789))
        mix = mix ^ (mix >> 15)
        owner = jnp.where(sent, S, jnp.abs(mix) % S)
        # stable sort by owner; rank within bucket -> fixed (S, C) sendbuf
        ow_s, hi_s, lo_s = lax.sort(
            (owner, hi_l, lo_l), num_keys=3)
        idx = jnp.arange(n, dtype=jnp.int32)
        start = jnp.searchsorted(ow_s, jnp.arange(S + 1, dtype=jnp.int32))
        rank = idx - start[jnp.clip(ow_s, 0, S)]
        keep = (ow_s < S) & (rank < C)
        dropped = jnp.sum((ow_s < S) & (rank >= C))
        slot = jnp.where(keep, ow_s * C + rank, S * C)   # last = scratch
        buf_hi = jnp.full(S * C + 1, HI_SENTINEL, jnp.int32)
        buf_lo = jnp.zeros(S * C + 1, jnp.int32)
        buf_hi = buf_hi.at[slot].set(jnp.where(keep, hi_s, HI_SENTINEL))
        buf_lo = buf_lo.at[slot].set(jnp.where(keep, lo_s, 0))
        send_hi = buf_hi[:S * C].reshape(S, C)
        send_lo = buf_lo[:S * C].reshape(S, C)
        recv_hi = lax.all_to_all(send_hi, "kspace", 0, 0).reshape(-1)
        recv_lo = lax.all_to_all(send_lo, "kspace", 0, 0).reshape(-1)
        hi_2, lo_2 = lax.sort((recv_hi, recv_lo), num_keys=2)
        firsts = jnp.concatenate([
            jnp.ones(1, bool),
            (hi_2[1:] != hi_2[:-1]) | (lo_2[1:] != lo_2[:-1])])
        cnt = jnp.sum(firsts & (hi_2 < HI_SENTINEL))
        return (lax.psum(cnt, "kspace")[None],
                lax.psum(dropped, "kspace")[None])

    with mesh:
        counts, dropped = shard_count(hi, lo)
    if int(np.asarray(dropped)[0]) > 0:
        return count_distinct(reads, k)
    return int(np.asarray(counts)[0])


# ---------------------------------------------------------------------------
# minimizer index (buildIndexMinimizers, vertex_index.cpp:394-470)
# ---------------------------------------------------------------------------

def _kmer_hash(x: int) -> int:
    """Kmer::hash (kmer.h:93-100): splitmix64 finalizer."""
    M = (1 << 64) - 1
    z = (x + 0x9E3779B97F4A7C15) & M
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
    return z ^ (z >> 31)


def _splitmix64_arr(x: np.ndarray) -> np.ndarray:
    """Vectorized Kmer::hash (kmer.h:93-100)."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _deque_scan_py(h: np.ndarray, window: int) -> np.ndarray:
    """Pure-Python fallback for the native minimizer deque scan."""
    from collections import deque
    q: deque = deque()           # positions
    out = []
    hl = h.tolist()
    for i in range(len(hl)):
        while q and hl[q[-1]] > hl[i]:
            q.pop()
        q.append(i)
        if q[0] <= i - window:
            while q[0] <= i - window:
                q.popleft()
            while len(q) >= 2 and hl[q[0]] == hl[q[1]]:
                q.popleft()
        if not out or out[-1] != q[0]:
            out.append(q[0])
    return np.asarray(out, np.int64)


def _minimizer_arrays(codes: np.ndarray, k: int, window: int):
    """(positions, fwd_codes, canonical_codes) of the minimizers of one
    read — vectorized kmer/hash computation + native C deque scan
    (exact yieldMinimizers semantics, kmer.h:206-260: strictly-greater
    back pops keep ties, equal-hash front skipping after expiry, emit
    once per front position)."""
    from genarchbench_tpu import native

    n = len(codes) - k          # IterKmers drops the final position
    z = np.zeros(0, np.uint64)
    if n <= 0:
        return np.zeros(0, np.int64), z, z
    c = codes.astype(np.uint64)
    sw = np.lib.stride_tricks.sliding_window_view(c, k)[:n]
    wf = np.uint64(1) << (np.uint64(2)
                          * np.arange(k - 1, -1, -1, dtype=np.uint64))
    wr = np.uint64(1) << (np.uint64(2) * np.arange(k, dtype=np.uint64))
    with np.errstate(over="ignore"):
        fwd = (sw * wf).sum(axis=1, dtype=np.uint64)
        rc = ((np.uint64(3) - sw) * wr).sum(axis=1, dtype=np.uint64)
    canon = np.minimum(fwd, rc)
    if window == 1:
        return np.arange(n, dtype=np.int64), fwd, canon
    h = _splitmix64_arr(canon)
    pos = native.minimizer_scan_native(h, window)
    if pos is None:
        pos = _deque_scan_py(h, window)
    return pos, fwd[pos], canon[pos]


def yield_minimizers(codes: np.ndarray, k: int, window: int):
    """Exact yieldMinimizers (kmer.h:206-260).
    Returns [(position, fwd_code)]."""
    pos, fwd, _ = _minimizer_arrays(codes, k, window)
    return list(zip(pos.tolist(), fwd.tolist()))


def build_minimizer_index(reads: ReadSet, k: int, window: int,
                          min_coverage: int = 1,
                          repeat_kmer_rate: float = 100.0):
    """buildIndexMinimizers: count canonical minimizers, mark
    repetitive ones above rate * mean-frequency
    (vertex_index.cpp:394-470 + filterFrequentKmers).  Returns
    (counts dict canonical_code -> n, repetitive set)."""
    cats = []
    for s in reads.seqs:
        _, _, canon = _minimizer_arrays(s, k, window)
        cats.append(canon)
    allc = (np.concatenate(cats) if cats else np.zeros(0, np.uint64))
    uniqv, cnts = np.unique(allc, return_counts=True)
    counts: dict = dict(zip(uniqv.tolist(), cnts.tolist()))
    total = sum(c for c in counts.values() if c >= min_coverage)
    uniq = sum(1 for c in counts.values() if c >= min_coverage)
    thresh = repeat_kmer_rate * (total / (uniq + 1))
    repetitive = {km for km, c in counts.items() if c > thresh}
    return counts, repetitive


def parse_config(path: str) -> dict:
    """Flye key=value config with %include (kmer-cnt/config.h)."""
    from genarchbench_tpu.core.config import load_kv_config
    return load_kv_config(path)


def run(argv: Sequence[str]) -> int:
    """CLI compatible with the reference kmer_cnt (kmer_cnt.cpp:80-130):
    --reads F --config F [--threads N] [--kmer K] [--min-ovlp N] [--debug]."""
    import argparse
    p = argparse.ArgumentParser(prog="kmer-cnt")
    p.add_argument("--reads", required=True)
    p.add_argument("--config", required=True)
    p.add_argument("--threads", type=int, default=1)
    p.add_argument("--kmer", type=int, default=-1)
    p.add_argument("--min-ovlp", dest="min_ovlp", type=int, default=5000)
    p.add_argument("--min-read", dest="min_read", type=int, default=0)
    p.add_argument("--debug", action="store_true")
    args = p.parse_args(argv)

    cfg = parse_config(args.config)
    k = args.kmer if args.kmer > 0 else int(cfg.get("kmer_size", 15))
    use_minimizers = int(cfg.get("use_minimizers", "0"))
    min_len = max(args.min_read, args.min_ovlp)

    print(f"DEBUG: Running with k-mer size: {k}", file=sys.stderr)
    print("INFO: Reading sequences", file=sys.stderr)
    reads = read_fasta(args.reads, min_len=min_len)
    total_bp = sum(len(s) for s in reads.seqs)
    print(f"DEBUG: Total sequence: {total_bp} bp", file=sys.stderr)

    t0 = time.perf_counter()
    roi = ROITimer("kmer-cnt", "Kernel time: {t:.3f} sec")
    with roi:
        if use_minimizers:
            wnd = int(cfg.get("minimizer_window", 5))
            counts, repetitive = build_minimizer_index(reads, k, wnd)
            print(f"DEBUG: Minimizers {len(counts)} "
                  f"(repetitive {len(repetitive)})", file=sys.stderr)
            n = len(counts)
        else:
            n = count_distinct(reads, k)
    print(f"DEBUG: Total k-mers {n}", file=sys.stderr)
    roi.report(file=sys.stderr)
    del t0
    return 0


if __name__ == "__main__":
    sys.exit(run(sys.argv[1:]))
