"""Bit-Parallel Myers — Pallas TPU inner loop.

Same semantics as kernels/bpm.py::_bpm_distance_device (Myers 1999
blocked bit-vectors, reference bpm/edit/edit_bpm.c:47-67
`BPM_ADVANCE_BLOCK`), but the advance-block recurrence runs as a Pallas
kernel with ALL loop state (Pv/Mv words, score) resident in VMEM for
the whole text scan:

  * lanes are tiled (8, 128) — one native VPU tile of pairs per vector
    op; a grid program owns TILE=1024 pairs and scans their texts fully;
  * the XLA version's loop state (B, W) lives in HBM between `fori_loop`
    steps; here the state never leaves VMEM, so the only HBM traffic is
    the one-time text/PEQ block load (double-buffered by the pallas
    pipeline over the grid) and the final (8, 128) score store;
  * the word loop (W = ceil(plen/32)) is unrolled at trace time exactly
    like the XLA path, carrying PHin/MHin through uint32 lanes.

Text positions beyond a pair's length are encoded -1 (Eq = 0, step
masked), replacing the XLA path's `t < tlen` mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
TILE = SUB * LANE            # pairs per grid program


def _kernel(peq_ref, text_ref, plen_ref, out_ref, *, W, T):
    # refs carry a leading size-1 grid-block dim: peq (1,W,4,8,128),
    # text (1,T,8,128), plen/out (1,8,128)
    u32 = jnp.uint32
    plen = plen_ref[0]                                    # (8,128) i32
    top_mask = (jnp.ones((SUB, LANE), u32)
                << ((plen - 1) % 32).astype(u32))
    msb = jnp.full((SUB, LANE), 0x80000000, u32)

    ones = jnp.full((SUB, LANE), 0xFFFFFFFF, u32)
    zero = jnp.zeros((SUB, LANE), u32)
    # flat tuple carry (no (W,...) stack/unstack per step: Mosaic keeps
    # each word's Pv/Mv in registers/VMEM without reassembling an array)
    init = tuple([ones] * W + [zero] * W + [plen])

    def step(t, carry):
        Pv = carry[:W]
        Mv = carry[W:2 * W]
        score = carry[2 * W]
        tc = text_ref[0, t]                               # (8,128) i32
        valid = tc >= 0
        PHin = jnp.ones((SUB, LANE), u32)
        MHin = zero
        newPv = []
        newMv = []
        delta = None
        for w in range(W):
            cols = peq_ref[0, w]                          # (4,8,128) u32
            Eq = jnp.where(tc == 0, cols[0],
                 jnp.where(tc == 1, cols[1],
                 jnp.where(tc == 2, cols[2],
                 jnp.where(tc == 3, cols[3], zero))))
            pv, mv = Pv[w], Mv[w]
            Xv = Eq | mv
            _Eq = Eq | MHin
            Xh = (((_Eq & pv) + pv) ^ pv) | _Eq
            Ph = mv | ~(Xh | pv)
            Mh = pv & Xh
            mask = top_mask if w == W - 1 else msb
            PHout = (Ph & mask) != 0
            MHout = (Mh & mask) != 0
            if w == W - 1:
                delta = PHout.astype(jnp.int32) - MHout.astype(jnp.int32)
            Ph = (Ph << 1) | PHin
            Mh = (Mh << 1) | MHin
            newPv.append(Mh | ~(Xv | Ph))
            newMv.append(Ph & Xv)
            PHin = PHout.astype(u32)
            MHin = MHout.astype(u32)
        score = score + jnp.where(valid, delta, 0)
        return tuple(newPv + newMv + [score])

    final = jax.lax.fori_loop(0, T, step, init)
    out_ref[0] = final[2 * W]


@partial(jax.jit, static_argnames=("W", "T", "interpret"))
def _bpm_pallas(peq, text, plen, W, T, interpret=False):
    """peq (G,W,4,8,128) u32; text (G,T,8,128) i32 (-1 past tlen);
    plen (G,8,128) i32.  Returns (G,8,128) i32 scores."""
    G = peq.shape[0]
    grid = (G,)
    return pl.pallas_call(
        partial(_kernel, W=W, T=T),
        out_shape=jax.ShapeDtypeStruct((G, SUB, LANE), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, W, 4, SUB, LANE), lambda g: (g, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, SUB, LANE), lambda g: (g, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, SUB, LANE), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, SUB, LANE), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(peq, text, plen)


def bpm_distance_pallas(peq: np.ndarray, plen: np.ndarray,
                        text: np.ndarray, tlen: np.ndarray, W: int,
                        interpret: bool = False) -> np.ndarray:
    """Drop-in for _bpm_distance_device: peq (B,W,4) u32, text (B,T) i32,
    plen/tlen (B,) i32 -> (B,) i32."""
    B, T = text.shape
    Bp = ((B + TILE - 1) // TILE) * TILE
    G = Bp // TILE
    Tp = max(T, 1)

    peq_p = np.zeros((Bp, W, 4), np.uint32)
    peq_p[:B] = peq
    text_p = np.full((Bp, Tp), -1, np.int32)
    text_p[:B, :T] = np.where(
        np.arange(T)[None, :] < np.asarray(tlen)[:, None], text, -1)
    plen_p = np.ones(Bp, np.int32)
    plen_p[:B] = plen

    # (Bp, W, 4) -> (G, W, 4, 8, 128): lane k of tile g is pair g*TILE+k
    peq_t = peq_p.reshape(G, SUB, LANE, W, 4).transpose(0, 3, 4, 1, 2).copy()
    text_t = text_p.reshape(G, SUB, LANE, Tp).transpose(0, 3, 1, 2).copy()
    plen_t = plen_p.reshape(G, SUB, LANE)

    out = _bpm_pallas(jnp.asarray(peq_t), jnp.asarray(text_t),
                      jnp.asarray(plen_t), W=W, T=Tp, interpret=interpret)
    return np.asarray(out).reshape(Bp)[:B]
