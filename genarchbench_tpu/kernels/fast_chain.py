"""mm2-fast simplified 32-bit anchor chaining — vectorized, no heuristics.

Reference semantics: fast-chain/src/host_kernel.cpp:803-866 (scalar version,
identical results to its AVX512/AVX2/SVE paths): like chain_dp but
  * 32-bit anchors (x truncated to uint32; exact within a window),
  * no seg-id logic, no skip heuristic / targets / break,
  * gap cost computed in float32: (int)(dd * 0.01f * avg_qspan) + (log_dd>>1).

TPU-first design: the reference dropped minimap2's skip heuristics
precisely because they serialize the j-loop (its own TODO comments,
host_kernel.cpp:819-850, call out the unvectorizable `continue`/`break`).
With them gone the whole backward window is data-parallel: each anchor's
window is processed in 128-wide VECTOR CHUNKS (one masked (B, 128)
tensor step per chunk instead of one device step per j), with the
running (max_f, max_j) reduction carried across chunks.  The strict
`sc > max_f` scan-descending tie rule ("first j seen wins" = largest j)
is preserved exactly: a chunk updates only when its masked max beats the
carry, selecting the largest j that attains it.

End-to-end the kernel is TRANSFER-bound, not compute-bound (the tunnel
moves device->host at ~45 MB/s vs ~1.4 GB/s host->device), so the host
boundary is designed around bytes pulled:
  * window starts ship from the host (vectorized searchsorted +
    running max) over the FAST h2d direction — the on-device
    lower_bound alternative (_device_window_starts, kept behind
    GENARCH_FASTCHAIN_DEVICE_ST=1) costs 18 full-batch gathers,
  * spans ship as uint8 (an 8-bit field of y by format, host_data.h),
  * only the argmax PARENTS come back (int16 when N allows), and the
    scores are reconstructed on the host in native C
    (native/readers.c::fast_chain_scores) from the parent chain with
    bit-identical f32 gap-cost arithmetic — an exact inverse because
    score[i] = sc(i, parent[i]) + score[parent[i]] by construction.
"""

from __future__ import annotations

import os
import sys
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from genarchbench_tpu.core.roi import ROITimer
from genarchbench_tpu.io import chain_io
from genarchbench_tpu.kernels.chain import MAX_ITER
from genarchbench_tpu.sharding.batching import plan_batches

CHUNK = 128
TILE = 128


def clin_table_f32(avg_qspan: float, size: int) -> np.ndarray:
    """Exact table of (int)(dd * 0.01f * avg_qspan) in f32 like the C scalar
    (host_kernel.cpp:843: float math, truncation toward zero)."""
    dd = np.arange(size, dtype=np.float32)
    return ((dd * np.float32(0.01)) * np.float32(avg_qspan)).astype(np.int32)


def _device_window_starts(x_hi, x_lo, n, mdx):
    """Per-anchor window start `st` on device (host_kernel.cpp:56-57 的
    two-pointer advance == running max of searchsorted, see
    chain_io.ChainRecord.window_starts).

    Branchless lower_bound over each row's valid prefix [0, n) with the
    64-bit anchor compared as a (hi, lo) uint32 pair; log2(N) unrolled
    gather steps, all (B, N) tensor ops."""
    B, N = x_lo.shape
    i32 = jnp.int32
    u32 = jnp.uint32
    mdx_u = mdx.astype(u32)[:, None]
    borrow = (x_lo < mdx_u).astype(u32)
    th_lo = x_lo - mdx_u
    th_hi_s = x_hi.astype(i32) - borrow.astype(i32)
    neg = th_hi_s < 0                      # x < mdx: clamp threshold to 0
    th_hi = jnp.where(neg, 0, th_hi_s).astype(u32)
    th_lo = jnp.where(neg, 0, th_lo)

    base = jnp.zeros((B, N), i32)
    nb = n[:, None]
    step = 1
    while step < N:
        step *= 2
    while step:
        cand = base + step
        idx = jnp.clip(cand - 1, 0, N - 1)
        ch = jnp.take_along_axis(x_hi, idx, axis=1)
        cl = jnp.take_along_axis(x_lo, idx, axis=1)
        less = (ch < th_hi) | ((ch == th_hi) & (cl < th_lo))
        base = jnp.where((cand <= nb) & less, cand, base)
        step //= 2

    iota = jnp.arange(N, dtype=i32)[None, :]
    st = jnp.maximum(base, iota - i32(MAX_ITER))
    st = lax.associative_scan(jnp.maximum, st, axis=1)
    st = jnp.minimum(st, iota)
    return jnp.where(iota < nb, st, iota)   # pad anchors: empty window


@jax.jit
def _fast_chain_device(x_lo, x_hi, qi, span8, st, n, mdx, mdxy, bw,
                       avg_qspan):
    """Tile-structured fast-chain DP.

    x_lo/x_hi (B,N) uint32; qi (B,N) int32; span8 (B,N) uint8 (y's 8-bit
    span field, host_data.h); n/mdx/mdxy/bw (B,) int32 (mdxy =
    min(max_dist_x, max_dist_y): the reference's two `dq >` tests
    collapse); avg_qspan (B,) float32.  N must be a multiple of T.
    Returns (parents_small, scores) — parents int16 when N fits, and the
    full int32 scores (left on device; only pulled by the no-native
    fallback).

    The anchor loop is the wall — score[i] can depend on score[i-1], so
    i must advance sequentially — but only the TRIANGLE of a T-wide
    band is truly sequential.  Anchors are processed T=128 at a time:
      * FAR pass: every predecessor j below the tile already has a final
        score, so all T windows scan the earlier anchors together in
        (B, T, CHUNK) fused chunks — the whole O(N·window) cell count
        collapses into ~N/CHUNK big VPU dispatches per tile instead of
        one small dispatch per anchor.
      * NEAR pass: the in-tile triangle runs one anchor per micro-step,
        a single (B, T) op against the tile-local score buffer.
    The strict `sc > max_f` descending-scan tie rule ("first j seen
    wins" = largest j) is preserved: near j's are all larger than far
    j's, so near wins ties (`nearf >= farf`), and each pass selects the
    largest j attaining its max.

    Perf notes (measured on the tunnel TPU):
      * gap linear term computed directly in f32 — the exact reference
        expression `(int)(dd * 0.01f * avg_qspan)` (host_kernel.cpp:843)
        — a gathered (B, max_dist_x) table was the dominant HBM traffic
        (22.6 s -> 8.5 s);
      * an anchor-major (N, B) transpose was tried and measured SLOWER
        (38 s) — keep batch-major;
      * peak_scores are NOT computed: the reference fills them
        (host_kernel.cpp:863) but never prints them, and the output
        contract (host_data_io.cpp:53-60) is scores + parents only."""
    B, N = x_lo.shape
    i32 = jnp.int32
    f32 = jnp.float32
    NEG = jnp.int32(-(1 << 30))
    span = span8.astype(i32)
    # st ships from the host (vectorized searchsorted + running max,
    # chain_io.window_starts): h2d is the FAST direction of the link,
    # while the former on-device branchless lower_bound cost 18
    # full-batch gathers per call (gathers measured ~100x slower than
    # elementwise on this TPU); set GENARCH_FASTCHAIN_DEVICE_ST=1 to
    # A/B the device version (_device_window_starts)
    CH = min(CHUNK, N)   # short records: chunk cannot exceed the row
    lane = jnp.arange(CH, dtype=i32)
    T = min(TILE, N)     # N is pow2, so N % T == 0 always
    tlane = jnp.arange(T, dtype=i32)

    def pair_scores(ri, qi_i, span_i, xs, qs, scj):
        """Reference score of anchor (ri, qi_i, span_i) vs predecessors
        (xs, qs) with scores scj; all args broadcastable."""
        dr = (ri - xs).astype(i32)
        dq = qi_i - qs
        dd = jnp.abs(dr - dq)
        cont = (dr == 0) | (dq <= 0) | (dq > mdxy[:, None, None]) \
            | (dd > bw[:, None, None])
        # explicit floor: TPU's f32->s32 convert rounds to NEAREST,
        # the C cast truncates (dd=40, avg=27.5: 10.999999 -> 11 vs 10).
        # optimization_barrier pins the C's (dd*0.01f)*avg evaluation
        # order: XLA duplicates this fusion into the score path AND the
        # argmax path, and was observed REASSOCIATING one duplicate to
        # dd*(0.01f*avg) (loop-invariant hoist) — which flips floor()
        # exactly at boundary products like dd=40, so the two paths
        # disagreed and the picked parent didn't match the reported
        # score (1 line in 4.2M on the bench input).
        t1 = lax.optimization_barrier(dd.astype(f32) * f32(0.01))
        c_lin = jnp.floor(lax.optimization_barrier(
            t1 * avg_qspan[:, None, None])).astype(i32)
        log_dd = jnp.where(dd > 0, 31 - lax.clz(dd), 0)
        sc0 = jnp.minimum(jnp.minimum(dq, dr), span_i)
        return jnp.where(cont, NEG, sc0 - (c_lin + (log_dd >> 1)) + scj)

    def tile_loop(t, state):
        scores, parents = state
        t0 = t * T
        ri_t = lax.dynamic_slice(x_lo, (0, t0), (B, T))
        qi_t = lax.dynamic_slice(qi, (0, t0), (B, T))
        span_t = lax.dynamic_slice(span, (0, t0), (B, T))
        st_t = lax.dynamic_slice(st, (0, t0), (B, T))
        act_t = (t0 + tlane)[None, :] < n[:, None]       # (B, T)
        min_st = jnp.min(st_t)                           # pad st=i >= t0

        # ---- FAR: finalized predecessors j < t0, chunked descending ----
        def fcond(c):
            cidx = c[0]
            top = t0 - 1 - cidx * CH
            return (top >= 0) & (top >= min_st)

        def fbody(c):
            cidx, farf, farj = c
            c0 = t0 - (cidx + 1) * CH
            js = c0 + lane                               # (CH,)
            xs = lax.dynamic_slice(x_lo, (0, c0), (B, CH))
            qs = lax.dynamic_slice(qi, (0, c0), (B, CH))
            scj = lax.dynamic_slice(scores, (0, c0), (B, CH))
            sc = pair_scores(ri_t[:, :, None], qi_t[:, :, None],
                             span_t[:, :, None], xs[:, None, :],
                             qs[:, None, :], scj[:, None, :])
            eff = (js[None, None, :] >= st_t[:, :, None]) & act_t[:, :, None]
            scm = jnp.where(eff, sc, NEG)                # (B, T, CHUNK)
            cm = jnp.max(scm, axis=2)
            # ties pick the LARGEST j = FIRST max of the reversed scan:
            # argmax on the j-reversed array.  (The previous
            # max(where(scm == cm, js, -1)) form was miscompiled by
            # XLA TPU inside this loop — score right, lower j on ties,
            # one line in 4.2M on the bench input — and
            # optimization_barrier did NOT fix it; argmax lowers
            # through a different reduce and verifies byte-exact.)
            jsel = jnp.where(
                cm > NEG,
                c0 + (CH - 1) - jnp.argmax(scm[:, :, ::-1], axis=2
                                           ).astype(i32), -1)
            upd = cm > farf                              # descending chunks:
            return (cidx + 1, jnp.where(upd, cm, farf),  # ties keep larger j
                    jnp.where(upd, jsel, farj))

        _, farf, farj = lax.while_loop(
            fcond, fbody,
            (jnp.int32(0), jnp.full((B, T), NEG, i32),
             jnp.full((B, T), -1, i32)))

        # ---- NEAR: the in-tile triangle, one anchor per micro-step ----
        js_t = (t0 + tlane)[None, :]                     # (1, T)

        def nbody(l, c):
            sc_t, pa_t = c
            ri = lax.dynamic_slice(ri_t, (0, l), (B, 1))
            qii = lax.dynamic_slice(qi_t, (0, l), (B, 1))
            spi = lax.dynamic_slice(span_t, (0, l), (B, 1))
            sti = lax.dynamic_slice(st_t, (0, l), (B, 1))
            sc = pair_scores(ri[:, :, None], qii[:, :, None],
                             spi[:, :, None], ri_t[:, None, :],
                             qi_t[:, None, :], sc_t[:, None, :])[:, 0, :]
            eff = (tlane[None, :] < l) & (js_t >= sti)
            scm = jnp.where(eff, sc, NEG)                # (B, T)
            nearf = jnp.max(scm, axis=1)
            # largest-j tie rule via reversed argmax (see far-pass note)
            nearj = jnp.where(
                nearf > NEG,
                t0 + (T - 1) - jnp.argmax(scm[:, ::-1], axis=1
                                          ).astype(i32), -1)
            ff = lax.dynamic_slice(farf, (0, l), (B, 1))[:, 0]
            fj = lax.dynamic_slice(farj, (0, l), (B, 1))[:, 0]
            nwin = nearf >= ff                           # near = larger j
            cand = jnp.maximum(nearf, ff)
            cj = jnp.where(nwin, nearj, fj)
            spi0 = spi[:, 0]
            good = cand > spi0                           # strict sc > max_f
            val = jnp.where(good, cand, spi0)
            pj = jnp.where(good, cj, -1)
            acl = act_t[:, l]
            one = (tlane[None, :] == l)
            sc_t = jnp.where(one, jnp.where(acl, val, 0)[:, None], sc_t)
            pa_t = jnp.where(one, jnp.where(acl, pj, -1)[:, None], pa_t)
            return (sc_t, pa_t)

        sc_t, pa_t = lax.fori_loop(
            0, T, nbody,
            (jnp.zeros((B, T), i32), jnp.full((B, T), -1, i32)))

        scores = lax.dynamic_update_slice(scores, sc_t, (0, t0))
        parents = lax.dynamic_update_slice(parents, pa_t, (0, t0))
        return (scores, parents)

    state = (jnp.zeros((B, N), i32), jnp.full((B, N), -1, i32))
    scores, parents = lax.fori_loop(0, N // T, tile_loop, state)
    pdtype = jnp.int16 if N <= (1 << 15) - 1 else jnp.int32
    return parents.astype(pdtype), scores


def fast_chain_batch(records: Sequence[chain_io.ChainRecord],
                     cell_budget: int = 1 << 23, mesh=None) -> List[tuple]:
    """cell_budget 8M cells: the kernel is bound by the SEQUENTIAL
    anchor loop (N steps), so wider batches amortize it — one (16k, 512)
    batch beats two (8k, 512) batches at identical results."""
    from genarchbench_tpu import native
    from genarchbench_tpu.sharding.mesh import pad_batch, shard_args

    results: List[tuple] = [None] * len(records)
    plans = plan_batches([r.n for r in records], cell_budget=cell_budget)

    pending = []           # (plan, host arrays, device result handles)
    for plan in plans:
        recs = [records[k] for k in plan.indices]
        B, N = pad_batch(plan.batch, mesh), plan.length
        nv = np.zeros(B, np.int64)
        nv[:len(recs)] = [r.n for r in recs]
        vmask = np.arange(N)[None, :] < nv[:, None]      # (B, N)
        x_pad = np.zeros((B, N), np.uint64)
        y_pad = np.zeros((B, N), np.uint64)
        # vectorized ragged fill: per-record python slice loops cost
        # ~0.3 s for a 16k-record plan
        x_pad[vmask] = np.concatenate([r.x for r in recs if r.n])
        y_pad[vmask] = np.concatenate([r.y for r in recs if r.n])
        # word/byte VIEWS, not uint64 arithmetic: numpy's u64 >>/& take
        # seconds per 2M-elem batch on this host (no SIMD path), views
        # are free (little-endian: word 0 = low, byte 4 = bits 32..39);
        # big-endian hosts fall back to the endian-independent shifts
        if sys.byteorder == "little":
            xv = x_pad.view(np.uint32).reshape(B, N, 2)
            x_lo = np.ascontiguousarray(xv[:, :, 0])
            x_hi = np.ascontiguousarray(xv[:, :, 1])
            yv = y_pad.view(np.uint32).reshape(B, N, 2)
            qi = np.ascontiguousarray(yv[:, :, 0]).view(np.int32)
            span = np.ascontiguousarray(
                y_pad.view(np.uint8).reshape(B, N, 8)[:, :, 4])
        else:
            x_lo = (x_pad & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            x_hi = (x_pad >> np.uint64(32)).astype(np.uint32)
            qi = (y_pad & np.uint64(0xFFFFFFFF)).astype(np.uint32) \
                .view(np.int32)
            span = ((y_pad >> np.uint64(32)) & np.uint64(0xFF)) \
                .astype(np.uint8)
        n = np.zeros(B, np.int32)
        n[:len(recs)] = [r.n for r in recs]
        mdx = np.zeros(B, np.int32)
        mdx[:len(recs)] = [r.max_dist_x for r in recs]
        mdxy = np.zeros(B, np.int32)
        mdxy[:len(recs)] = [min(r.max_dist_x, r.max_dist_y) for r in recs]
        bw = np.zeros(B, np.int32)
        bw[:len(recs)] = [r.bw for r in recs]
        avg = np.zeros(B, np.float32)
        avg[:len(recs)] = [np.float32(r.avg_qspan) for r in recs]

        if os.environ.get("GENARCH_FASTCHAIN_DEVICE_ST"):
            st_d = _device_window_starts(
                jnp.asarray(x_hi), jnp.asarray(x_lo), jnp.asarray(n),
                jnp.asarray(mdx))
            st_pad = np.asarray(st_d)
        else:
            st_pad = np.tile(np.arange(N, dtype=np.int32), (B, 1))
            for b, ws in enumerate(
                    chain_io.window_starts_all(recs)):
                st_pad[b, :len(ws)] = ws
        dargs = shard_args(mesh, x_lo, x_hi, qi, span, st_pad, n, mdx,
                           mdxy, bw, avg)
        parents_d, scores_d = _fast_chain_device(*dargs)
        # start the transfer NOW; pulls of later plans overlap it
        # (a ragged device-gather pull was tried and measured SLOWER:
        # the host-side flatnonzero + masked re-pad cost more than the
        # padded plane's extra d2h bytes)
        try:
            parents_d.copy_to_host_async()
        except AttributeError:
            pass
        pending.append((plan, recs, n, avg, x_lo, qi, span,
                        parents_d, scores_d))

    for (plan, recs, n, avg, x_lo, qi, span,
         parents_d, scores_d) in pending:
        parents = np.asarray(parents_d).astype(np.int32)
        scores = native.fast_chain_scores_native(
            n, avg, x_lo, qi, span, parents)
        if scores is None:                 # no C toolchain: pull wide
            scores = np.asarray(scores_d)
        for b, k in enumerate(plan.indices):
            m = records[k].n
            results[k] = (scores[b, :m], parents[b, :m], None)
    return results


def run(argv: Sequence[str]) -> int:
    """CLI driver compatible with the reference fast-chain binary
    (fast-chain/src/main.cpp): -i input -o output [-t ignored]."""
    import argparse
    p = argparse.ArgumentParser(prog="fast-chain")
    p.add_argument("-i", dest="input", required=True)
    p.add_argument("-o", dest="output", required=True)
    p.add_argument("-t", dest="threads", type=int, default=1)
    args = p.parse_args(argv)

    records = chain_io.read_records_path(args.input)

    from genarchbench_tpu.sharding.mesh import data_mesh
    roi = ROITimer("fast-chain", "Time in kernel: {t:.2f} sec")
    with roi:
        results = fast_chain_batch(records, mesh=data_mesh())
    roi.report()

    with open(args.output, "w") as f:
        chain_io.write_returns(f, [(s, p_) for s, p_, _ in results])
    return 0


if __name__ == "__main__":
    sys.exit(run(sys.argv[1:]))
