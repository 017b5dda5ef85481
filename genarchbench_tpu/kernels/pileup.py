"""pileup: Medaka base-count feature matrices — TPU-native.

Reference semantics: pileup/src/medaka_counts.c — region split into
100 kb chunks (:544-555), per chunk an htslib mpileup walk producing per
reference position: max insertion length, then per read a count into a
(featlen=10 bases x num_homop=5 quality strata) matrix column, with
insertion bases in minor columns (:375-476); read filter = primary,
mapQ >= 1 (medaka_bamiter.c:19-24); TSV printout (:222-249).  The count
base order is "acgtACGTdD" (lowercase = reverse strand,
medaka_counts.h:65-68), quality stratum = clamp(qual,1,num_homop)-1
(:457-461), deletions always stratum 0 (:437-441).

TPU-first design:
  * the host walks CIGARs once (numpy per read) to produce a flat event
    list (column, feature) — the irregular pointer-chasing part htslib's
    mpileup does — and the device turns millions of events into the
    count matrix with ONE `scatter-add` (`.at[].add`), the TPU-shaped
    formulation of "loop over reads at each position".
  * chunks are independent (the reference's OMP loop over batches) and
    shard naturally over devices by chunk.
"""

from __future__ import annotations

import sys
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from genarchbench_tpu.core.roi import ROITimer
from genarchbench_tpu.io.bam_io import (
    BamRecord, FDUP, FQCFAIL, FSECONDARY, FSUPPL, FUNMAP,
    parse_region, read_bam)

PLP_BASES = "acgtACGTdD"
FEATLEN = 10
FWD_DEL = 9
REV_DEL = 8
NUM_HOMOP = 5
CHUNK_LEN = 100000

# nt16 (+16 for reverse strand) -> feature index (medaka_counts.h:73-79)
NUM2COUNTBASE = np.array([
    -1, 4, 5, -1, 6, -1, -1, -1,
    7, -1, -1, -1, -1, -1, -1, -1,
    -1, 0, 1, -1, 2, -1, -1, -1,
    3, -1, -1, -1, -1, -1, -1, -1], np.int32)

FILTER_FLAGS = FUNMAP | FSECONDARY | FSUPPL | FQCFAIL | FDUP


def _read_events(r: BamRecord):
    """Per-read pileup states: arrays over covered reference positions of
    (pos, is_del, is_refskip, qpos, indel) mirroring htslib's
    resolve_cigar2 fields used by the reference."""
    pos_l, del_l, skip_l, qpos_l, indel_l = [], [], [], [], []
    rp = r.pos
    qp = 0
    ops = r.cigar
    for ci, (op, ln) in enumerate(ops):
        if op in (0, 7, 8):                     # M = X
            nxt_op, nxt_len = ops[ci + 1] if ci + 1 < len(ops) else (-1, 0)
            for i in range(ln):
                pos_l.append(rp + i)
                del_l.append(False)
                skip_l.append(False)
                qpos_l.append(qp + i)
                last = i == ln - 1
                indel_l.append(nxt_len if (last and nxt_op == 1) else 0)
            rp += ln
            qp += ln
        elif op == 1:                           # I (consumes query only)
            qp += ln
        elif op == 2:                           # D
            for i in range(ln):
                pos_l.append(rp + i)
                del_l.append(True)
                skip_l.append(False)
                qpos_l.append(qp)
                indel_l.append(0)
            rp += ln
        elif op == 3:                           # N
            for i in range(ln):
                pos_l.append(rp + i)
                del_l.append(False)
                skip_l.append(True)
                qpos_l.append(qp)
                indel_l.append(0)
            rp += ln
        elif op == 4:                           # S
            qp += ln
        # H, P consume nothing
    return (np.asarray(pos_l, np.int64), np.asarray(del_l, bool),
            np.asarray(skip_l, bool), np.asarray(qpos_l, np.int64),
            np.asarray(indel_l, np.int64))


def calculate_pileup(records: List[BamRecord], chrom_id: int,
                     start: int, end: int):
    """Count matrix for one chunk: returns (majors, minors,
    matrix (ncols, FEATLEN*NUM_HOMOP) int64)."""
    cov: Dict[int, int] = {}                 # pos -> max_ins
    events: List[Tuple[int, int, int]] = []  # (pos, j, feat_idx)

    for r in records:
        if r.ref_id != chrom_id or (r.flag & FILTER_FLAGS) or r.mapq < 1:
            continue
        if r.pos >= end or r.pos + r.ref_span() <= start:
            continue
        pos, is_del, is_skip, qpos, indel = _read_events(r)
        nt = r.nt16().astype(np.int32)
        qual = r.qual.astype(np.int32)
        rev = r.is_reverse
        sel = (pos >= start) & (pos < end)
        for p, d, sk, q, ind in zip(pos[sel], is_del[sel], is_skip[sel],
                                    qpos[sel], indel[sel]):
            m = cov.get(p, -1)
            cov[p] = max(m, ind)
            if sk:
                continue
            if d:
                events.append((p, 0, REV_DEL if rev else FWD_DEL))
            else:
                for j in range(int(ind) + 1):
                    b = int(nt[q + j]) + (16 if rev else 0)
                    fi = int(NUM2COUNTBASE[b])
                    if fi >= 0:
                        qs = min(int(qual[q + j]), NUM_HOMOP)
                        qs = max(0, qs - 1)
                        events.append((p, j, FEATLEN * qs + fi))

    if not cov:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros((0, FEATLEN * NUM_HOMOP), np.int64),
                2 * (end - start))

    positions = np.array(sorted(cov), np.int64)
    max_ins = np.array([cov[p] for p in positions], np.int64)

    # replicate the buffer growth bookkeeping (medaka_counts.c:389-396)
    # so the "with buffer of N columns" trailer matches byte-for-byte
    buffer_cols = 2 * (end - start)
    n_cols = 0
    for p, mi in zip(positions, max_ins):
        n_cols += 1
        if n_cols + mi > buffer_cols:
            cols_per_pos = float(n_cols + mi) / (p - start)
            buffer_cols = mi + max(2 * buffer_cols,
                                   int(cols_per_pos) * (end - start))
        n_cols += mi
    col_of = {}
    majors, minors = [], []
    for p, mi in zip(positions, max_ins):
        col_of[p] = len(majors)
        for j in range(mi + 1):
            majors.append(p)
            minors.append(j)
    ncols = len(majors)

    ev = np.asarray(events, np.int64).reshape(-1, 3)
    cols = np.array([col_of[p] for p in ev[:, 0]], np.int32) \
        + ev[:, 1].astype(np.int32)
    feats = ev[:, 2].astype(np.int32)
    mat = _scatter_counts(jnp.asarray(cols), jnp.asarray(feats), ncols)
    return (np.asarray(majors, np.int64), np.asarray(minors, np.int64),
            np.asarray(mat, np.int64), buffer_cols)


def _scatter_counts(cols, feats, ncols):
    from functools import partial

    @partial(jax.jit, static_argnames=("size",))
    def impl(flat_idx, size):
        return jnp.zeros((size,), jnp.int32).at[flat_idx].add(1, mode="drop")

    width = FEATLEN * NUM_HOMOP
    # pad sizes to pow2 buckets so chunk sizes don't each compile a
    # fresh program; padded indices point out of range => dropped
    size = ncols * width
    psize = 1 << max(size - 1, 1).bit_length()
    flat = np.asarray(cols * width + feats, np.int32)
    n = 1 << max(len(flat) - 1, 1).bit_length()
    flat = np.concatenate([flat, np.full(n - len(flat), psize, np.int32)])
    mat = impl(jnp.asarray(flat), size=psize)
    return np.asarray(mat[:size]).reshape(ncols, width)


def print_pileup_tsv(majors, minors, mat, out) -> None:
    """print_pileup_data (medaka_counts.c:222-249), num_dtypes=1."""
    head = ["pos", "ins"]
    for k in range(NUM_HOMOP):
        for b in PLP_BASES:
            head.append(f"{b}.{k + 1}")
    out.write("\t".join(head) + "\tdepth\n")
    for i in range(len(majors)):
        row = mat[i]
        out.write(f"{majors[i]}\t{minors[i]}\t")
        out.write("\t".join(str(int(c)) for c in row))
        out.write(f"\t{int(row.sum())}\n")


def run(argv: Sequence[str]) -> int:
    """CLI compatible with the reference pileup binary
    (medaka_counts.c:501-510): <bam> <region> <threads>."""
    if len(argv) < 3:
        print("Usage: pileup <bam> <region> <num_threads>", file=sys.stderr)
        return 1
    bam_file, region, _threads = argv[0], argv[1], int(argv[2])

    chrom, start, end = parse_region(region)
    refs, records = read_bam(bam_file)
    names = [n for n, _ in refs]
    if chrom not in names:
        print(f"Failed to parse region: '{region}'.", file=sys.stderr)
        return 1
    cid = names.index(chrom)
    if start is None:
        start, end = 0, refs[cid][1]
    if end is None:
        end = refs[cid][1]

    # The reference main() chunks with 0-based numbers but formats them
    # into "chr:beg-end" strings that calculate_pileup RE-parses as
    # 1-based (medaka_counts.c:534-549 vs :330-341): every chunk start
    # shifts one more position left (clamped at 0), and interior chunk
    # boundaries therefore overlap by one emitted column.
    chunks = [(max(s - 1, 0), min(s + CHUNK_LEN, end))
              for s in range(start, end, CHUNK_LEN)]
    print(f"Running {len(chunks)} batches with threads: {_threads}",
          file=sys.stderr)
    roi = ROITimer("pileup", "Kernel runtime: {t:.2f} s")
    results = []
    with roi:
        for s, e in chunks:
            results.append(calculate_pileup(records, cid, s, e))
    for majors, minors, mat, buffer_cols in results:
        print_pileup_tsv(majors, minors, mat, sys.stdout)
        print(f"pileup is length {len(majors)}, with buffer of "
              f"{buffer_cols} columns")
    roi.report()
    return 0


if __name__ == "__main__":
    sys.exit(run(sys.argv[1:]))
