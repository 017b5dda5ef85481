"""minimap2 anchor-chaining DP — exact semantics, TPU-native formulation.

Reference semantics: chain/src/host_kernel.cpp:30-94 (`chain_dp`): for each
anchor i, scan predecessors j = i-1 .. st backwards, score
sc = min(dq,dr,q_span) - gap_cost + scores[j], keep the max, with minimap2's
skip heuristic (`n_skip`/`targets`, break after 25 skip hits) reproduced
bit-exactly.

TPU-first design (NOT a port of the OpenMP loop):
  * the reference parallelizes over records with OpenMP and runs each
    record's DP serially; here ALL records in a batch step through the DP in
    lock-step — the (i, j) loops are shared scalars while every arithmetic
    op is a (batch,)-wide VPU vector, so lanes replace threads.
  * `st` (window start, a pure function of x — host_kernel.cpp:56-57) is
    precomputed vectorized via searchsorted.
  * the float gap-cost `(int)(dd * .01 * avg_qspan)` (host_kernel.cpp:74,79)
    is precomputed on the host into an exact f64-truncated lookup table
    indexed by dd <= max_dist_x, so the device kernel is pure int32 and still
    bit-exact (TPUs have no fast f64).
  * anchor x values are uint64 in the reference; within a window
    dr = x[i]-x[j] <= max_dist_x < 2^31, so the kernel only needs the low 32
    bits (uint32 wraparound arithmetic is exact for the in-window range).
"""

from __future__ import annotations

import sys
from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from genarchbench_tpu.core.roi import ROITimer
from genarchbench_tpu.io import chain_io
from genarchbench_tpu.sharding.batching import plan_batches, pad_stack

MAX_SKIP = 25
MAX_ITER = 5000


def clin_table(avg_qspan: float, size: int) -> np.ndarray:
    """Exact table of (int)(dd * .01 * avg_qspan) computed in f64 like the C
    (host_kernel.cpp:74: double promotion, truncation toward zero)."""
    dd = np.arange(size, dtype=np.float64)
    return (dd * 0.01 * np.float64(np.float32(avg_qspan))).astype(np.int32)


def gap_corrections(avg32: np.ndarray, t_size: int, B: int):
    """Per-record sparse corrections making the device's f32 gap cost
    bit-equal to the C f64 one: (corr_dd, corr_delta) (B, CORR_K) and
    the list of LOCAL row indices needing more than CORR_K slots
    (rare — those records are deferred to a small exact-table batch
    instead of dragging the whole plan onto the gather path)."""
    nb = len(avg32)
    corr_dd = np.full((B, CORR_K), -1, np.int32)
    corr_delta = np.zeros((B, CORR_K), np.int32)
    t1 = np.arange(t_size, dtype=np.float64) * 0.01
    ddf = np.arange(t_size, dtype=np.float32) * np.float32(0.01)
    over_rows = []
    for lo in range(0, nb, 2048):
        hi = min(lo + 2048, nb)
        a32 = avg32[lo:hi]
        appr32 = ddf[None, :] * a32[:, None]          # device-identical
        # only near-integer products can truncate differently in f32
        # vs f64 (the two-op f32 product is within ~5e-4 of the f64
        # one for values <= ~20000); check exactly just those
        frac = appr32 - np.rint(appr32)
        rows, cols = np.nonzero(np.abs(frac) < 4e-3)
        if len(rows) == 0:
            continue
        appr_i = appr32[rows, cols].astype(np.int32)
        exact_i = (t1[cols] * a32[rows].astype(np.float64)
                   ).astype(np.int32)
        bad = appr_i != exact_i
        rows, cols = rows[bad], cols[bad]
        delta = exact_i[bad] - appr_i[bad]
        for r_ in np.unique(rows):
            m_ = rows == r_
            sel = cols[m_]
            if len(sel) > CORR_K:
                over_rows.append(lo + int(r_))
                continue
            corr_dd[lo + r_, :len(sel)] = sel
            corr_delta[lo + r_, :len(sel)] = delta[m_]
    return corr_dd, corr_delta, over_rows


CORR_K = 16


@partial(jax.jit, static_argnames=("with_heuristics", "use_table"))
def _chain_dp_device(x_lo, qi, span, sid, st, n, mdx, mdy, bw, nsegs,
                     clin, avg32, corr_dd, corr_delta,
                     with_heuristics=True, use_table=False):
    """Lock-step batched chain DP, DENSE per anchor: no inner j-loop.

    Key observation making the reference's sequential predecessor scan
    (host_kernel.cpp:58-94) fully vectorizable: the `t[]` skip-marker
    writes only matter WITHIN the same anchor's scan (the test is
    `t[j] == i`, and writes during anchor i store exactly i), and a
    break only truncates positions BELOW the break point, which were
    never consumed by positions above it.  So per anchor i, over the
    whole window at once:
      * sc_j, the distance/continue masks: dense (B, N) elementwise
      * "better" (sc beats the running max at moment j): a reversed
        exclusive cumulative max
      * "t[j] == i" (some processed j' had parents[j'] == j): one
        scatter-max of writer positions (parents[j'] < j' guarantees
        any writer is processed before its target is tested)
      * the n_skip counter: every step is n -> max(n + c, 0) with
        c in {-1, 0, +1}; these saturating-affine maps compose
        associatively ((C1+C2, max(M1+C2, M2))), so the running
        counter (and hence the break position) comes from one
        lax.associative_scan
    The winning predecessor is then the largest j above the break
    achieving the window max (the reference's strict > keeps the
    first-seen = largest j).  Shapes: (B, N) anchor arrays; (B,)
    per-record params; (B, T) exact gap tables."""
    B, N = x_lo.shape
    T = clin.shape[1] if use_table else int(jnp.iinfo(jnp.int32).max)
    i32 = jnp.int32
    NEGI = jnp.asarray(-(1 << 30), i32)
    bidx = jnp.arange(B, dtype=i32)
    jidx = jnp.arange(N, dtype=i32)

    scores0 = jnp.zeros((B, N), i32)
    parents0 = jnp.full((B, N), -1, i32)
    peaks0 = jnp.zeros((B, N), i32)
    NW = (N + 31) // 32
    # childbit[b, j, w] bit l set <=> parents[b, w*32+l] == j: the
    # incremental inverse of `parents`, maintained with one B-element
    # .add per anchor (bit i is unique per step, so add == bitwise-or).
    # The skip-marker membership test then becomes a dense AND+reduce
    # instead of a 2M-element scatter (which measured ~17 ms/anchor,
    # ~90% of the whole DP).
    childbit0 = jnp.zeros((B, N + 1, NW), jnp.uint32)

    def outer(i, state):
        scores, parents, peaks, childbit = state
        act_i = i < n                                   # (B,)
        ri = x_lo[:, i]
        qi_i = qi[:, i]
        span_i = span[:, i]
        sid_i = sid[:, i]
        st_i = st[:, i]
        win = (jidx[None, :] < i) & (jidx[None, :] >= st_i[:, None])
        dr = (ri[:, None] - x_lo).astype(i32)           # (B, N)
        dq = qi_i[:, None] - qi
        sid_eq = sid_i[:, None] == sid
        dd = jnp.abs(dr - dq)
        cont = ((sid_eq & (dr == 0)) | (dq <= 0)) \
             | ((sid_eq & (dq > mdy[:, None])) | (dq > mdx[:, None])) \
             | (sid_eq & (dd > bw[:, None])) \
             | ((nsegs[:, None] > 1) & sid_eq & (dr > mdy[:, None]))
        sc0 = jnp.minimum(jnp.minimum(dq, dr), span_i[:, None])
        ddc = jnp.clip(dd, 0, T - 1)
        if use_table:
            c_lin = jnp.take_along_axis(clin, ddc, axis=1)
        else:
            # elementwise f32 mirror of the C f64 gap cost, made exact
            # by the sparse per-record correction slots the host
            # computed (f32 trunc differs from f64 trunc for <1e-4 of
            # dd values); a 2M-element random gather per anchor into
            # the (B, T) table measured ~10x the cost of these flops
            appr = (ddc.astype(jnp.float32) * jnp.float32(0.01)
                    ) * avg32[:, None]
            c_lin = appr.astype(i32)
            for k in range(CORR_K):
                c_lin = c_lin + jnp.where(
                    ddc == corr_dd[:, k][:, None],
                    corr_delta[:, k][:, None], 0)
        log_dd = jnp.where(dd > 0, 31 - lax.clz(dd), 0)
        gap = jnp.where(sid_eq, c_lin + (log_dd >> 1),
                        jnp.where(dr == 0, 0,
                                  jnp.minimum(c_lin, log_dd)))
        bonus = ((~sid_eq) & (dr == 0)).astype(i32)
        sc = sc0 + bonus - gap + scores

        eff = act_i[:, None] & win & (~cont)
        scv = jnp.where(eff, sc, NEGI)
        # running max at moment j = max(span, sc over eff j' > j):
        # suffix max via hand-rolled Hillis-Steele shifts (static
        # pad+slice fuses on TPU; lax.cummax/associative_scan lower to
        # dynamic-slice towers that measured ~10x slower here)
        suff_excl = jnp.concatenate(
            [scv[:, 1:], jnp.full((B, 1), NEGI)], axis=1)
        d = 1
        while d < N:
            shifted = jnp.concatenate(
                [suff_excl[:, d:], jnp.full((B, d), NEGI)], axis=1)
            suff_excl = jnp.maximum(suff_excl, shifted)
            d *= 2
        runmax = jnp.maximum(span_i[:, None], suff_excl)
        better = eff & (sc > runmax)

        if with_heuristics:
            effp = eff.astype(jnp.uint32)
            if NW * 32 != N:
                effp = jnp.concatenate(
                    [effp, jnp.zeros((B, NW * 32 - N), jnp.uint32)],
                    axis=1)
            effw = (effp.reshape(B, NW, 32)
                    * (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
                    ).sum(axis=2, dtype=jnp.uint32)        # (B, NW)
            t_hit = jnp.any(
                childbit[:, :N, :] & effw[:, None, :] != 0, axis=2)
            skip_hit = eff & (~better) & t_hit
            c = jnp.where(skip_hit, 1, jnp.where(better, -1, 0))
            # running n_skip BEFORE j (j descending) = the suffix
            # composition over j' > j of n -> max(n + c, 0), applied
            # to 0: exclusive suffix scan of (C, M) pairs, hand-rolled
            # (compose: (C1+C2, max(M1+C2, M2)); here op-after is the
            # SMALLER j', i.e. the element nearer the suffix start)
            Cs = jnp.concatenate(
                [c[:, 1:], jnp.zeros((B, 1), i32)], axis=1)
            Ms = jnp.zeros((B, N), i32)
            d = 1
            while d < N:
                zs = jnp.zeros((B, d), i32)
                C2 = jnp.concatenate([Cs[:, d:], zs], axis=1)
                M2 = jnp.concatenate([Ms[:, d:], zs], axis=1)
                # segment [j+d+1, j+2d] (C2/M2) executes FIRST in the
                # descending scan, then [j+1, j+d] (Cs/Ms) after it
                Cs, Ms = Cs + C2, jnp.maximum(M2 + Cs, Ms)
                d *= 2
            nsk_before = jnp.maximum(Cs, Ms)
            newbrk = skip_hit & (nsk_before + 1 > MAX_SKIP)
            jstar = jnp.max(jnp.where(newbrk, jidx[None, :], -1), axis=1)
            valid = eff & (jidx[None, :] > jstar[:, None])
        else:
            valid = eff

        scv2 = jnp.where(valid, sc, NEGI)
        best = jnp.max(scv2, axis=1)                    # (B,)
        maxf = jnp.maximum(span_i, best)
        is_best = valid & (sc == best[:, None]) & (best > span_i)[:, None]
        maxj = jnp.max(jnp.where(is_best, jidx[None, :], -1), axis=1)

        scores = scores.at[:, i].set(jnp.where(act_i, maxf, 0))
        parents = parents.at[:, i].set(jnp.where(act_i, maxj, -1))
        if with_heuristics:
            row = jnp.where(act_i & (maxj >= 0), maxj, N)
            childbit = childbit.at[
                bidx, row, i >> 5].add(
                jnp.uint32(1) << jnp.uint32(i & 31),
                mode="promise_in_bounds")
        pk_j = peaks[bidx, jnp.maximum(maxj, 0)]
        pk = jnp.where((maxj >= 0) & (pk_j > maxf), pk_j, maxf)
        peaks = peaks.at[:, i].set(jnp.where(act_i, pk, 0))
        return (scores, parents, peaks, childbit)

    scores, parents, peaks, _ = lax.fori_loop(
        0, N, outer, (scores0, parents0, peaks0, childbit0))
    return scores, parents, peaks


@partial(jax.jit, static_argnames=("B", "N", "CK", "T",
                                   "with_heuristics", "use_table"))
def _chain_dp_blob(blob, B, N, CK, T, with_heuristics, use_table):
    """Single-transfer wrapper: all per-plan inputs arrive as ONE
    uint32 blob (the tunnel charges ~50-100 ms latency per transfer —
    11 h2d + 3 d2h per plan dominated warm runs), outputs leave as ONE
    stacked (3, B, N) int32 array."""
    off = [0]

    def take(sz, shape, dt):
        part = lax.slice(blob, (off[0],), (off[0] + sz,))
        off[0] += sz
        arr = part.reshape(shape)
        if dt is jnp.uint32:
            return arr
        return lax.bitcast_convert_type(arr, dt)

    x_lo = take(B * N, (B, N), jnp.uint32)
    qi = take(B * N, (B, N), jnp.int32)
    span = take(B * N, (B, N), jnp.int32)
    sid = take(B * N, (B, N), jnp.int32)
    st = take(B * N, (B, N), jnp.int32)
    n = take(B, (B,), jnp.int32)
    mdx = take(B, (B,), jnp.int32)
    mdy = take(B, (B,), jnp.int32)
    bw = take(B, (B,), jnp.int32)
    nsegs = take(B, (B,), jnp.int32)
    avg32 = take(B, (B,), jnp.float32)
    corr_dd = take(B * CK, (B, CK), jnp.int32)
    corr_delta = take(B * CK, (B, CK), jnp.int32)
    clin = take(B * T, (B, T), jnp.int32)
    scores, parents, peaks = _chain_dp_device(
        x_lo, qi, span, sid, st, n, mdx, mdy, bw, nsegs, clin,
        avg32, corr_dd, corr_delta,
        with_heuristics=with_heuristics, use_table=use_table)
    return jnp.stack([scores, parents, peaks])


def chain_batch(records: Sequence[chain_io.ChainRecord],
                with_heuristics: bool = True,
                cell_budget: int = 1 << 23, mesh=None,
                _force_table: bool = False) -> List[tuple]:
    """Run chain_dp over records; returns [(scores, parents, peaks)] in
    order.  With a mesh, records shard data-parallel along the batch axis
    (the OMP-dynamic-for equivalent, chain/src/host_kernel.cpp:98-107)."""
    from genarchbench_tpu.sharding.mesh import pad_batch, shard_args

    results: List[tuple] = [None] * len(records)
    plans = plan_batches([r.n for r in records], cell_budget=cell_budget,
                         max_batch=4096)
    deferred: List[int] = []
    for plan in plans:
        plan_idxs = list(plan.indices)
        recs = [records[k] for k in plan_idxs]
        B, N = pad_batch(plan.batch, mesh), plan.length
        t_size0 = int(max(r.max_dist_x for r in recs)) + 1
        if not _force_table:
            avg_r = np.array([np.float32(r.avg_qspan) for r in recs],
                             np.float32)
            cdd_r, cdel_r, over = gap_corrections(avg_r, t_size0, B)
            if over:
                oset = set(over)
                deferred += [plan_idxs[i] for i in over]
                keep = [i for i in range(len(recs)) if i not in oset]
                plan_idxs = [plan_idxs[i] for i in keep]
                recs = [recs[i] for i in keep]
                if not recs:
                    continue
                cdd_r = np.concatenate(
                    [cdd_r[keep],
                     np.full((B - len(keep), CORR_K), -1, np.int32)])
                cdel_r = np.concatenate(
                    [cdel_r[keep],
                     np.zeros((B - len(keep), CORR_K), np.int32)])
        x_lo = pad_stack([r.x_lo for r in recs], B, N, dtype=np.uint32)
        qi = pad_stack([r.qi for r in recs], B, N, dtype=np.int32)
        span = pad_stack([r.q_span for r in recs], B, N, dtype=np.int32)
        sid = pad_stack([r.sid for r in recs], B, N, dtype=np.int32)
        st = pad_stack(chain_io.window_starts_all(recs, MAX_ITER),
                       B, N, dtype=np.int32)
        n = np.zeros(B, np.int32)
        n[:len(recs)] = [r.n for r in recs]
        mdx = np.zeros(B, np.int32)
        mdx[:len(recs)] = [r.max_dist_x for r in recs]
        mdy = np.zeros(B, np.int32)
        mdy[:len(recs)] = [r.max_dist_y for r in recs]
        bw = np.zeros(B, np.int32)
        bw[:len(recs)] = [r.bw for r in recs]
        nsegs = np.zeros(B, np.int32)
        nsegs[:len(recs)] = [r.n_segs for r in recs]
        t_size = int(max(r.max_dist_x for r in recs)) + 1
        avg32 = np.zeros(B, np.float32)
        avg32[:len(recs)] = [np.float32(r.avg_qspan) for r in recs]
        use_table = _force_table
        if use_table:     # deferred >CORR_K rows: exact f64 table
            corr_dd = np.full((B, CORR_K), -1, np.int32)
            corr_delta = np.zeros((B, CORR_K), np.int32)
            clin = np.zeros((B, t_size), np.int32)
            for b, r in enumerate(recs):
                clin[b] = clin_table(r.avg_qspan, t_size)
        else:
            corr_dd, corr_delta = cdd_r, cdel_r
            clin = np.zeros((B, 1), np.int32)

        single = mesh is None or getattr(mesh, "size", 1) == 1
        if single:
            u = lambda a: np.ascontiguousarray(a).view(np.uint32).ravel()
            blob = np.concatenate([
                u(x_lo), u(qi), u(span), u(sid), u(st), u(n), u(mdx),
                u(mdy), u(bw), u(nsegs), u(avg32), u(corr_dd),
                u(corr_delta), u(clin)])
            out = np.asarray(_chain_dp_blob(
                jnp.asarray(blob), B=B, N=N, CK=CORR_K,
                T=clin.shape[1], with_heuristics=with_heuristics,
                use_table=use_table))
            scores, parents, peaks = out[0], out[1], out[2]
        else:
            (x_lo, qi, span, sid, st, n, mdx, mdy, bw, nsegs, clin,
             avg32, corr_dd, corr_delta) = shard_args(
                mesh, x_lo, qi, span, sid, st, n, mdx, mdy, bw, nsegs,
                clin, avg32, corr_dd, corr_delta)
            scores, parents, peaks = _chain_dp_device(
                x_lo, qi, span, sid, st, n, mdx, mdy, bw, nsegs, clin,
                avg32, corr_dd, corr_delta,
                with_heuristics=with_heuristics, use_table=use_table)
            scores = np.asarray(scores)
            parents = np.asarray(parents)
            peaks = np.asarray(peaks)
        for b, k in enumerate(plan_idxs):
            m = records[k].n
            results[k] = (scores[b, :m], parents[b, :m], peaks[b, :m])
    if deferred:
        sub = chain_batch([records[k] for k in deferred],
                          with_heuristics=with_heuristics,
                          cell_budget=cell_budget, mesh=mesh,
                          _force_table=True)
        for k, res in zip(deferred, sub):
            results[k] = res
    return results


def run(argv: Sequence[str]) -> int:
    """CLI driver byte-compatible with the reference chain binary
    (chain/src/main.cpp:60-207): -i input -o output [-t ignored]."""
    import argparse
    p = argparse.ArgumentParser(prog="chain")
    p.add_argument("-i", dest="input", required=True)
    p.add_argument("-o", dest="output", required=True)
    p.add_argument("-t", dest="threads", type=int, default=1)
    args = p.parse_args(argv)

    records = chain_io.read_records_path(args.input)

    from genarchbench_tpu.sharding.mesh import data_mesh
    roi = ROITimer("chain", "Time in kernel: {t:.2f} sec")
    with roi:
        results = chain_batch(records, mesh=data_mesh())
    roi.report()

    with open(args.output, "w") as f:
        chain_io.write_returns(f, [(s, p_) for s, p_, _ in results])
    return 0


if __name__ == "__main__":
    sys.exit(run(sys.argv[1:]))
