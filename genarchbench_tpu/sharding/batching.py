"""Padding / bucketing policies.

TPU kernels need static shapes; variable-length genomics work items are
padded into shape buckets (the reference's analogue is fixed-slot padding,
e.g. bsw's MAX_SEQ_LEN_REF/QER slots, bsw/src/main_banded.cpp:260-290, and
fast-chain's vector-width padding, fast-chain/src/host_data_io.cpp:49).

`plan_batches` packs variable-length records into (batch, padded_len)
buckets with power-of-two shapes so the number of distinct compiled
programs stays small.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import numpy as np


def next_pow2(v: int, lo: int = 1) -> int:
    p = lo
    while p < v:
        p *= 2
    return p


@dataclasses.dataclass
class BatchPlan:
    indices: List[int]     # original record indices in this batch
    batch: int             # padded batch dimension (pow2, multiple of lane_min)
    length: int            # padded per-record length (pow2)


def plan_batches(lengths: Sequence[int],
                 cell_budget: int = 1 << 24,
                 max_batch: int = 4096,
                 lane_min: int = 8,
                 min_length: int = 16) -> List[BatchPlan]:
    """Pack records into batches with padded pow2 shapes.

    Sorts records by length (desc) so same-bucket records have similar
    padded length, then greedily fills batches under `cell_budget`
    (batch * padded_length) to bound device memory.
    Returns plans whose `indices` cover every input exactly once.
    """
    order = np.argsort(np.asarray(lengths))[::-1]
    plans: List[BatchPlan] = []
    i = 0
    nrec = len(order)
    while i < nrec:
        first = int(order[i])
        plen = next_pow2(max(int(lengths[first]), 1), min_length)
        max_b = max(1, min(max_batch, cell_budget // plen))
        members = [first]
        j = i + 1
        while j < nrec and len(members) < max_b:
            members.append(int(order[j]))
            j += 1
        b = next_pow2(len(members), lane_min)
        plans.append(BatchPlan(members, min(b, next_pow2(max_b)), plen))
        i = j
    return plans


def pad_stack(arrays: Sequence[np.ndarray], batch: int, length: int,
              fill=0, dtype=None) -> np.ndarray:
    """Stack 1-D arrays into a (batch, length) padded matrix."""
    dtype = dtype or arrays[0].dtype
    if fill == 0:
        out = np.zeros((batch, length), dtype=dtype)   # calloc: no fill pass
    else:
        out = np.full((batch, length), fill, dtype=dtype)
    for i, a in enumerate(arrays):
        out[i, :len(a)] = a
    return out
