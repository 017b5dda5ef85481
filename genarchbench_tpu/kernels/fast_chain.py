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
from genarchbench_tpu.kernels.chain import MAX_ITER
from genarchbench_tpu.sharding.batching import plan_batches, pad_stack

CHUNK = 128


def clin_table_f32(avg_qspan: float, size: int) -> np.ndarray:
    """Exact table of (int)(dd * 0.01f * avg_qspan) in f32 like the C scalar
    (host_kernel.cpp:843: float math, truncation toward zero)."""
    dd = np.arange(size, dtype=np.float32)
    return ((dd * np.float32(0.01)) * np.float32(avg_qspan)).astype(np.int32)


@jax.jit
def _fast_chain_device(x_lo, qi, span, st, n, mdxy, bw, avg_qspan):
    """Chunk-vectorized fast-chain DP.

    x_lo (B,N) uint32; qi/span/st (B,N) int32; n/mdxy/bw (B,) int32
    (mdxy = min(max_dist_x, max_dist_y): the reference's two `dq >` tests
    collapse); avg_qspan (B,) float32.  Returns scores, parents (B,N).

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
    lane = jnp.arange(CHUNK, dtype=i32)

    def outer(i, state):
        scores, parents = state
        act_i = i < n                                    # (B,)
        ri = x_lo[:, i]
        qi_i = qi[:, i]
        span_i = span[:, i]
        st_i = jnp.where(act_i, st[:, i], i)             # empty window if pad
        min_st = jnp.min(jnp.where(act_i, st_i, i))

        def cond(c):
            cidx = c[0]
            jtop = i - 1 - cidx * CHUNK
            return (jtop >= 0) & (jtop >= min_st)

        def body(c):
            cidx, maxf, maxj = c
            jtop = i - 1 - cidx * CHUNK                  # top j this chunk
            start = jnp.maximum(jtop - CHUNK + 1, 0)
            js = start + lane                            # ascending (CHUNK,)
            valid = act_i[:, None] & (js[None, :] >= st_i[:, None]) \
                & (js[None, :] <= jtop)
            xs = lax.dynamic_slice(x_lo, (0, start), (B, CHUNK))
            qs = lax.dynamic_slice(qi, (0, start), (B, CHUNK))
            scj = lax.dynamic_slice(scores, (0, start), (B, CHUNK))
            dr = (ri[:, None] - xs).astype(i32)
            dq = qi_i[:, None] - qs
            dd = jnp.abs(dr - dq)
            cont = (dr == 0) | (dq <= 0) | (dq > mdxy[:, None]) \
                | (dd > bw[:, None])
            eff = valid & ~cont
            c_lin = ((dd.astype(f32) * f32(0.01))
                     * avg_qspan[:, None]).astype(i32)
            log_dd = jnp.where(dd > 0, 31 - lax.clz(dd), 0)
            sc0 = jnp.minimum(jnp.minimum(dq, dr), span_i[:, None])
            sc = sc0 - (c_lin + (log_dd >> 1)) + scj
            scm = jnp.where(eff, sc, NEG)
            cm = jnp.max(scm, axis=1)                    # (B,)
            # largest j attaining cm = "first seen" in the descending scan
            jsel = jnp.max(jnp.where(scm == cm[:, None], js[None, :], -1),
                           axis=1)
            upd = cm > maxf
            return (cidx + 1, jnp.where(upd, cm, maxf),
                    jnp.where(upd, jsel, maxj))

        _, maxf, maxj = lax.while_loop(
            cond, body, (jnp.int32(0), span_i, jnp.full(B, -1, i32)))

        scores = scores.at[:, i].set(jnp.where(act_i, maxf, 0))
        parents = parents.at[:, i].set(jnp.where(act_i, maxj, -1))
        return (scores, parents)

    state = (jnp.zeros((B, N), i32), jnp.full((B, N), -1, i32))
    scores, parents = lax.fori_loop(0, N, outer, state)
    return scores, parents


def fast_chain_batch(records: Sequence[chain_io.ChainRecord],
                     cell_budget: int = 1 << 23, mesh=None) -> List[tuple]:
    """cell_budget 8M cells: the kernel is bound by the SEQUENTIAL
    anchor loop (N steps), so wider batches amortize it — one (16k, 512)
    batch beats two (8k, 512) batches at identical results."""
    from genarchbench_tpu.sharding.mesh import pad_batch

    results: List[tuple] = [None] * len(records)
    plans = plan_batches([r.n for r in records], cell_budget=cell_budget)
    for plan in plans:
        recs = [records[k] for k in plan.indices]
        B, N = pad_batch(plan.batch, mesh), plan.length
        x_lo = pad_stack([r.x_lo for r in recs], B, N, dtype=np.uint32)
        qi = pad_stack([r.qi for r in recs], B, N, dtype=np.int32)
        span = pad_stack([r.q_span for r in recs], B, N, dtype=np.int32)
        st = pad_stack([r.window_starts(MAX_ITER) for r in recs], B, N,
                       dtype=np.int32)
        n = np.zeros(B, np.int32)
        n[:len(recs)] = [r.n for r in recs]
        mdxy = np.zeros(B, np.int32)
        mdxy[:len(recs)] = [min(r.max_dist_x, r.max_dist_y) for r in recs]
        bw = np.zeros(B, np.int32)
        bw[:len(recs)] = [r.bw for r in recs]
        avg = np.zeros(B, np.float32)
        avg[:len(recs)] = [np.float32(r.avg_qspan) for r in recs]

        from genarchbench_tpu.sharding.mesh import shard_args
        (x_lo, qi, span, st, n, mdxy, bw, avg) = shard_args(
            mesh, x_lo, qi, span, st, n, mdxy, bw, avg)
        scores, parents = _fast_chain_device(
            x_lo, qi, span, st, n, mdxy, bw, avg)
        scores = np.asarray(scores)
        parents = np.asarray(parents)
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
