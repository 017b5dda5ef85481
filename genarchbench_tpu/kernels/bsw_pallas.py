"""Banded Smith-Waterman — Pallas TPU kernel.

Same semantics as kernels/bsw.py::_bsw_device (they share
`_row_factory`, so the row step is literally one implementation), but
the whole row loop runs inside one Pallas program per group tile with
ALL DP state (H row, F row, band bounds, per-lane trackers) resident in
VMEM for the entire (R-row) scan.  The XLA path re-materializes ~10
(G, 8, C2) arrays through HBM every row; here HBM sees only the
one-time seq1/seq2 block loads (pipelined across the grid) and the six
(TG, 8, 1) result stores.

Layout: everything rank-3 — row state (TG, 8, C2) whose minor two dims
are native (sublane, lane) tiles, lane scalars (TG, 8, 1), group
scalars (TG, 1, 1).  No rank-changing reshapes anywhere (Mosaic's
layout inference rejects 1-D->3-D shape casts); `_row_factory` is
written to this contract.

Grid: one program per TG-group tile.  TG is chosen so the live state
(~12 arrays of (TG, 8, C2) int32) fits comfortably in the ~16 MB VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genarchbench_tpu.kernels.bsw import _row_factory

LANES = 8


def _pick_tg(C2: int) -> int:
    """Group-tile size: keep ~12 live (TG, 8, C2) i32 arrays + slack
    under ~12 MB of VMEM."""
    budget = 12 * (1 << 20)
    per_group = 12 * LANES * C2 * 4
    tg = max(1, budget // per_group)
    return int(min(64, 1 << (tg.bit_length() - 1)))


def _kernel(s1_ref, s2_ref, l1_ref, l2_ref, h0_ref, mb_ref,
            score_ref, x_ref, y_ref, moff_ref, gsc_ref, gtle_ref,
            *, R, match, mismatch, ambig,
            o_del, e_del, o_ins, e_ins, zdrop, w):
    # Mosaic requires lane-dim slice offsets to be 128-aligned, so the
    # per-row column pick is a masked max over an iota instead of a
    # dynamic slice (s1 is VMEM-resident; ~3 VPU ops over R lanes/row).
    s1 = s1_ref[...]                              # (TG, 8, R)
    cols_r = lax.broadcasted_iota(jnp.int32, (1, 1, s1.shape[2]), 2)

    def seq1_col(i):
        return jnp.max(jnp.where(cols_r == i, s1, -(1 << 28)),
                       axis=2, keepdims=True)     # (TG, 8, 1)

    state, row = _row_factory(
        seq1_col, s2_ref[...], l1_ref[...], l2_ref[...],
        h0_ref[...], mb_ref[...],
        match, mismatch, ambig, o_del, e_del, o_ins, e_ins, zdrop, w)
    st = lax.fori_loop(0, R, row, state)
    score_ref[...] = st["maxScore"]
    x_ref[...] = st["x"]
    y_ref[...] = st["y"]
    moff_ref[...] = st["max_off"]
    gsc_ref[...] = st["gscore"]
    gtle_ref[...] = st["max_ie"]


@partial(jax.jit, static_argnames=(
    "R", "match", "mismatch", "ambig",
    "o_del", "e_del", "o_ins", "e_ins", "zdrop", "w", "interpret"))
def _bsw_pallas(seq1, seq2, len1, len2, h0, myband,
                R, match, mismatch, ambig,
                o_del, e_del, o_ins, e_ins, zdrop, w, interpret=False):
    """Drop-in for _bsw_device (same nibble-packed uint8 seqs and (G, L)
    lane inputs/outputs); G must be a multiple of the group tile."""
    from genarchbench_tpu.kernels.bsw import _unpack_nibbles
    seq1 = _unpack_nibbles(seq1)      # on device: only packed bytes cross
    seq2 = _unpack_nibbles(seq2)      # the host->device link
    G, L, C2 = seq2.shape
    TG = _pick_tg(C2)
    while G % TG:
        TG //= 2
    grid = (G // TG,)

    gmap = lambda g: (g, 0, 0)
    spec3 = lambda width: pl.BlockSpec((TG, L, width), gmap,
                                       memory_space=pltpu.VMEM)
    kern = partial(_kernel, R=R, match=match, mismatch=mismatch,
                   ambig=ambig, o_del=o_del, e_del=e_del, o_ins=o_ins,
                   e_ins=e_ins, zdrop=zdrop, w=w)
    out3 = jax.ShapeDtypeStruct((G, L, 1), jnp.int32)
    outs = pl.pallas_call(
        kern,
        out_shape=(out3,) * 6,
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[spec3(seq1.shape[2]), spec3(C2)] + [spec3(1)] * 4,
            out_specs=(spec3(1),) * 6,
        ),
        interpret=interpret,
    )(seq1, seq2, len1[:, :, None], len2[:, :, None],
      h0[:, :, None], myband[:, :, None])
    return tuple(o[:, :, 0] for o in outs)
