"""Banded Smith-Waterman — Pallas TPU kernel.

Same semantics as kernels/bsw.py::_bsw_device (they share
`_row_factory`, so the row step is literally one implementation), but
the whole row loop runs inside one Pallas program per group tile with
ALL DP state (H row, F row, band bounds, per-lane trackers) resident in
VMEM for the entire (R-row) scan.  The XLA path re-materializes ~10
(G, 8, C2) arrays through HBM every row; here HBM sees only the
one-time seq1/seq2 block loads (pipelined across the grid) and the six
(TG, 8) result stores.

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
            *, TG, R, match, mismatch, ambig,
            o_del, e_del, o_ins, e_ins, zdrop, w):
    # the (G, 8) lane arrays live as FULL arrays in VMEM (Mosaic cannot
    # block a trailing dim of 8); each program slices its TG groups
    g0 = pl.program_id(0) * TG
    sl = pl.ds(g0, TG)

    def seq1_col(i):
        return s1_ref[:, :, pl.ds(i, 1)][:, :, 0]

    state, row = _row_factory(
        seq1_col, s2_ref[...], l1_ref[sl, :], l2_ref[sl, :],
        h0_ref[sl, :], mb_ref[sl, :],
        match, mismatch, ambig, o_del, e_del, o_ins, e_ins, zdrop, w)
    st = lax.fori_loop(0, R, row, state)
    score_ref[sl, :] = st["maxScore"]
    x_ref[sl, :] = st["x"]
    y_ref[sl, :] = st["y"]
    moff_ref[sl, :] = st["max_off"]
    gsc_ref[sl, :] = st["gscore"]
    gtle_ref[sl, :] = st["max_ie"]


@partial(jax.jit, static_argnames=(
    "R", "match", "mismatch", "ambig",
    "o_del", "e_del", "o_ins", "e_ins", "zdrop", "w", "interpret"))
def _bsw_pallas(seq1, seq2, len1, len2, h0, myband,
                R, match, mismatch, ambig,
                o_del, e_del, o_ins, e_ins, zdrop, w, interpret=False):
    """Drop-in for _bsw_device (same shapes/outputs); G must be a
    multiple of the group tile."""
    G, L, C2 = seq2.shape
    TG = _pick_tg(C2)
    while G % TG:
        TG //= 2
    grid = (G // TG,)

    def gmap(g):
        return (g, 0, 0)

    kern = partial(_kernel, TG=TG, R=R, match=match, mismatch=mismatch,
                   ambig=ambig, o_del=o_del, e_del=e_del, o_ins=o_ins,
                   e_ins=e_ins, zdrop=zdrop, w=w)
    out2 = jax.ShapeDtypeStruct((G, L), jnp.int32)
    spec3 = lambda width: pl.BlockSpec((TG, L, width), gmap,
                                       memory_space=pltpu.VMEM)
    full2 = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=(out2,) * 6,
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[spec3(seq1.shape[2]), spec3(C2),
                      full2, full2, full2, full2],
            out_specs=(full2,) * 6,
        ),
        interpret=interpret,
    )(seq1, seq2, len1, len2, h0, myband)
