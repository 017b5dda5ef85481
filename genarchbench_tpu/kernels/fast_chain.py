"""mm2-fast simplified 32-bit anchor chaining — vectorized, no heuristics.

Reference semantics: fast-chain/src/host_kernel.cpp:803-866 (scalar version,
identical results to its AVX512/AVX2/SVE paths): like chain_dp but
  * 32-bit anchors (x truncated to uint32; exact within a window),
  * no seg-id logic, no skip heuristic / targets / break,
  * gap cost computed in float32: (int)(dd * 0.01f * avg_qspan) + (log_dd>>1).

Shares the lock-step batched device kernel with `kernels.chain`
(with_heuristics=False disables the targets/n_skip carry entirely); the only
semantic deltas are encoded host-side: sid forced uniform, n_segs forced to 1
(which disables chain's extra sid/n_segs continue conditions), and the
gap-cost table computed with f32 rounding instead of f64.
"""

from __future__ import annotations

import sys
from typing import List, Sequence

import numpy as np

from genarchbench_tpu.core.roi import ROITimer
from genarchbench_tpu.io import chain_io
from genarchbench_tpu.kernels.chain import _chain_dp_device, MAX_ITER
from genarchbench_tpu.sharding.batching import plan_batches, pad_stack


def clin_table_f32(avg_qspan: float, size: int) -> np.ndarray:
    """Exact table of (int)(dd * 0.01f * avg_qspan) in f32 like the C scalar
    (host_kernel.cpp:843: float math, truncation toward zero)."""
    dd = np.arange(size, dtype=np.float32)
    return ((dd * np.float32(0.01)) * np.float32(avg_qspan)).astype(np.int32)


def fast_chain_batch(records: Sequence[chain_io.ChainRecord],
                     cell_budget: int = 1 << 22, mesh=None) -> List[tuple]:
    from genarchbench_tpu.sharding.mesh import pad_batch, shard_args

    results: List[tuple] = [None] * len(records)
    plans = plan_batches([r.n for r in records], cell_budget=cell_budget)
    for plan in plans:
        recs = [records[k] for k in plan.indices]
        B, N = pad_batch(plan.batch, mesh), plan.length
        x_lo = pad_stack([r.x_lo for r in recs], B, N, dtype=np.uint32)
        qi = pad_stack([r.qi for r in recs], B, N, dtype=np.int32)
        span = pad_stack([r.q_span for r in recs], B, N, dtype=np.int32)
        sid = np.zeros((B, N), np.int32)
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
        nsegs = np.ones(B, np.int32)
        t_size = int(max(r.max_dist_x for r in recs)) + 1
        clin = np.zeros((B, t_size), np.int32)
        for b, r in enumerate(recs):
            clin[b] = clin_table_f32(r.avg_qspan, t_size)

        (x_lo, qi, span, sid, st, n, mdx, mdy, bw, nsegs, clin) = shard_args(
            mesh, x_lo, qi, span, sid, st, n, mdx, mdy, bw, nsegs, clin)
        z, p0, t0, pk0 = shard_args(
            mesh, np.zeros((B, N), np.int32), np.full((B, N), -1, np.int32),
            np.full((B, N), -1, np.int32), np.zeros((B, N), np.int32))
        scores, parents, peaks = _chain_dp_device(
            x_lo, qi, span, sid, st, n, mdx, mdy, bw, nsegs, clin,
            z, p0, t0, pk0, with_heuristics=False)
        scores = np.asarray(scores)
        parents = np.asarray(parents)
        peaks = np.asarray(peaks)
        for b, k in enumerate(plan.indices):
            m = records[k].n
            results[k] = (scores[b, :m], parents[b, :m], peaks[b, :m])
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
