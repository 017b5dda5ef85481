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


@partial(jax.jit, static_argnames=("with_heuristics",))
def _chain_dp_device(x_lo, qi, span, sid, st, n, mdx, mdy, bw, nsegs, clin,
                     scores, parents, targets, peaks, with_heuristics=True):
    """Lock-step batched chain DP.

    Shapes: (B, N) int32/uint32 for x_lo/qi/span/sid/st and the four state
    arrays; (B,) for n/mdx/mdy/bw/nsegs; (B, T) for clin.
    """
    B, N = x_lo.shape
    T = clin.shape[1]
    bidx = jnp.arange(B, dtype=jnp.int32)
    i32 = jnp.int32

    def outer(i, state):
        scores, parents, targets, peaks = state
        act_i = i < n                                   # (B,)
        ri = x_lo[:, i]
        qi_i = qi[:, i]
        span_i = span[:, i]
        sid_i = sid[:, i]
        st_i = st[:, i]

        def cond(c):
            j = c[0]
            brk = c[2]
            act = act_i & (~brk) & (j >= st_i)
            return (j >= 0) & jnp.any(act)

        def body(c):
            j, nskip, brk, maxf, maxj, targets = c
            act = act_i & (~brk) & (j >= st_i)
            dr = (ri - x_lo[:, j]).astype(i32)
            dq = qi_i - qi[:, j]
            sid_eq = sid_i == sid[:, j]
            dd = jnp.abs(dr - dq)
            cont = ((sid_eq & (dr == 0)) | (dq <= 0)) \
                 | ((sid_eq & (dq > mdy)) | (dq > mdx)) \
                 | (sid_eq & (dd > bw)) \
                 | ((nsegs > 1) & sid_eq & (dr > mdy))
            min_d = jnp.minimum(dq, dr)
            sc0 = jnp.minimum(min_d, span_i)
            ddc = jnp.clip(dd, 0, T - 1)
            c_lin = jnp.take_along_axis(clin, ddc[:, None], axis=1)[:, 0]
            log_dd = jnp.where(dd > 0, 31 - lax.clz(dd), 0)
            gap = jnp.where(sid_eq, c_lin + (log_dd >> 1),
                            jnp.where(dr == 0, 0, jnp.minimum(c_lin, log_dd)))
            bonus = ((~sid_eq) & (dr == 0)).astype(i32)
            sc = sc0 + bonus - gap + scores[:, j]

            eff = act & (~cont)
            better = eff & (sc > maxf)
            if with_heuristics:
                skip_hit = eff & (~better) & (targets[:, j] == i)
                nskip = jnp.where(better & (nskip > 0), nskip - 1, nskip)
                nskip = jnp.where(skip_hit, nskip + 1, nskip)
                newbrk = skip_hit & (nskip > MAX_SKIP)
                brk = brk | newbrk
                # targets[parents[j]] = i for rows that processed j and did
                # not break on it (host_kernel.cpp:89); value i only grows,
                # so a masked scatter-max is an exact in-place update.
                pj = parents[:, j]
                do = eff & (~newbrk) & (pj >= 0)
                targets = targets.at[bidx, jnp.where(do, pj, 0)].max(
                    jnp.where(do, i, -2), mode="promise_in_bounds")
            maxj = jnp.where(better, j, maxj)
            maxf = jnp.where(better, sc, maxf)
            return (j - 1, nskip, brk, maxf, maxj, targets)

        init = (i - 1, jnp.zeros(B, i32), jnp.zeros(B, bool),
                span_i, jnp.full(B, -1, i32), targets)
        _, _, _, maxf, maxj, targets = lax.while_loop(cond, body, init)

        scores = scores.at[:, i].set(jnp.where(act_i, maxf, 0))
        parents = parents.at[:, i].set(jnp.where(act_i, maxj, -1))
        pk_j = peaks[bidx, jnp.maximum(maxj, 0)]
        pk = jnp.where((maxj >= 0) & (pk_j > maxf), pk_j, maxf)
        peaks = peaks.at[:, i].set(jnp.where(act_i, pk, 0))
        return (scores, parents, targets, peaks)

    scores, parents, targets, peaks = lax.fori_loop(
        0, N, outer, (scores, parents, targets, peaks))
    return scores, parents, peaks


def chain_batch(records: Sequence[chain_io.ChainRecord],
                with_heuristics: bool = True,
                cell_budget: int = 1 << 22, mesh=None) -> List[tuple]:
    """Run chain_dp over records; returns [(scores, parents, peaks)] in
    order.  With a mesh, records shard data-parallel along the batch axis
    (the OMP-dynamic-for equivalent, chain/src/host_kernel.cpp:98-107)."""
    from genarchbench_tpu.sharding.mesh import pad_batch, shard_args

    results: List[tuple] = [None] * len(records)
    plans = plan_batches([r.n for r in records], cell_budget=cell_budget)
    for plan in plans:
        recs = [records[k] for k in plan.indices]
        B, N = pad_batch(plan.batch, mesh), plan.length
        x_lo = pad_stack([r.x_lo for r in recs], B, N, dtype=np.uint32)
        qi = pad_stack([r.qi for r in recs], B, N, dtype=np.int32)
        span = pad_stack([r.q_span for r in recs], B, N, dtype=np.int32)
        sid = pad_stack([r.sid for r in recs], B, N, dtype=np.int32)
        st = pad_stack([r.window_starts(MAX_ITER) for r in recs], B, N,
                       dtype=np.int32)
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
        clin = np.zeros((B, t_size), np.int32)
        for b, r in enumerate(recs):
            clin[b] = clin_table(r.avg_qspan, t_size)

        (x_lo, qi, span, sid, st, n, mdx, mdy, bw, nsegs, clin) = shard_args(
            mesh, x_lo, qi, span, sid, st, n, mdx, mdy, bw, nsegs, clin)
        zeros = lambda: np.zeros((B, N), np.int32)
        neg = lambda: np.full((B, N), -1, np.int32)
        z, p0, t0, pk0 = shard_args(mesh, zeros(), neg(), neg(), zeros())
        scores, parents, peaks = _chain_dp_device(
            x_lo, qi, span, sid, st, n, mdx, mdy, bw, nsegs, clin,
            z, p0, t0, pk0, with_heuristics=with_heuristics)
        scores = np.asarray(scores)
        parents = np.asarray(parents)
        peaks = np.asarray(peaks)
        for b, k in enumerate(plan.indices):
            m = records[k].n
            results[k] = (scores[b, :m], parents[b, :m], peaks[b, :m])
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
