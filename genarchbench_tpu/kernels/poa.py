"""poa: partial-order alignment consensus (spoa) — TPU-native.

Reference semantics: poa/src/msa_spoa_omp.cpp driver (batch format
:99-127, engine params m=2,x=-4,o=-4,e=-2,o2=-24,e2=-1 => convex NW
:169-215, output :371-375) over the bundled spoa library
(spoa.tar.bz2): graph add_alignment / aligned-node fusion
(graph.cpp:117-270), iterative-DFS topological sort with aligned-node
grouping (:293-352), heaviest-bundle consensus with branch completion
(:494-586), and the convex Needleman-Wunsch DP + traceback priorities
of SisdAlignmentEngine::convex (sisd_alignment_engine.cpp:94-230
boundary conditions, :600-912 DP & backtrack).

TPU-first design:
  * the graph-topological DP runs one RANK per step, all query columns
    at once: F/O come from gathered predecessor rows (vector max), the
    in-row coupled E/Q/H recurrence — a max-plus linear system in the
    state (H, E, Q) — is evaluated with ONE `lax.associative_scan`
    over 3x4 max-plus affine matrices (log-depth instead of the
    reference's serial column loop).
  * WINDOWS BATCH: all windows of a run align their s-th sequence in
    LOCK-STEP — the DP is vmapped over a (G, Rpad, Wpad) window batch,
    one device call per round instead of one per (window, sequence)
    (the reference instead data-parallelizes windows across OMP
    threads, msa_spoa_omp.cpp:289-312).
  * the DP emits packed per-cell TRACEBACK CODE PLANES (2 uint32/cell:
    which candidate the reference's if-chain priority picks —
    first-predecessor diag/up slot, left checks, gap-extension
    continuation bits, sisd_alignment_engine.cpp:700-912) and a
    device-side lock-step WALK consumes them, so only the (G, steps, 2)
    alignment paths ever cross the device->host link (the 5 full DP
    matrices never leave HBM).
  * graph surgery and consensus stay on the host (tiny, irregular,
    exact-order sensitive).
  * (R, W) shapes are padded to pow2 buckets to bound compilation.
"""

from __future__ import annotations

import sys
from collections import defaultdict
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from genarchbench_tpu.core.roi import ROITimer

NEG = -(1 << 28)         # kNegativeInfinity stand-in (int32-safe)


# ---------------------------------------------------------------------------
# graph (exact spoa semantics, host side)
# ---------------------------------------------------------------------------

class Node:
    __slots__ = ("id", "code", "in_edges", "out_edges", "aligned")

    def __init__(self, id_, code):
        self.id = id_
        self.code = code
        self.in_edges: List["Edge"] = []
        self.out_edges: List["Edge"] = []
        self.aligned: List[int] = []


class Edge:
    __slots__ = ("begin", "end", "labels", "weight")

    def __init__(self, begin, end, label, weight):
        self.begin = begin
        self.end = end
        self.labels = [label]
        self.weight = weight


class Graph:
    def __init__(self):
        self.nodes: List[Node] = []
        self.rank_to_node_id: List[int] = []
        self.num_sequences = 0
        self.num_codes = 0
        self.coder = {}
        self.decoder = {}
        self.sequences_begin: List[int] = []
        self.consensus: List[int] = []

    def add_node(self, code) -> int:
        nid = len(self.nodes)
        self.nodes.append(Node(nid, code))
        return nid

    def add_edge(self, begin, end, weight) -> None:
        for e in self.nodes[begin].out_edges:
            if e.end == end:
                e.labels.append(self.num_sequences)
                e.weight += weight
                return
        e = Edge(begin, end, self.num_sequences, weight)
        self.nodes[begin].out_edges.append(e)
        self.nodes[end].in_edges.append(e)

    def _add_sequence(self, seq, weights, begin, end) -> int:
        if begin == end:
            return -1
        first = self.add_node(self.coder[seq[begin]])
        for i in range(begin + 1, end):
            nid = self.add_node(self.coder[seq[i]])
            self.add_edge(nid - 1, nid, weights[i - 1] + weights[i])
        return first

    def add_alignment(self, alignment, seq: str,
                      weights: Optional[List[int]] = None) -> None:
        """graph.cpp:156-271."""
        n = len(seq)
        if n == 0:
            return
        weights = weights or [1] * n
        for ch in seq:
            if ch not in self.coder:
                self.coder[ch] = self.num_codes
                self.decoder[self.num_codes] = ch
                self.num_codes += 1

        if not alignment:
            begin_id = self._add_sequence(seq, weights, 0, n)
            self.num_sequences += 1
            self.sequences_begin.append(begin_id)
            self.topological_sort()
            return

        valid = [q for (_nid, q) in alignment if q != -1]
        tmp = len(self.nodes)
        begin_id = self._add_sequence(seq, weights, 0, valid[0])
        head = -1 if tmp == len(self.nodes) else len(self.nodes) - 1
        tail = self._add_sequence(seq, weights, valid[-1] + 1, n)

        new_id = -1
        prev_w = 0 if head == -1 else weights[valid[0] - 1]
        for (nid, q) in alignment:
            if q == -1:
                continue
            letter = seq[q]
            if nid == -1:
                new_id = self.add_node(self.coder[letter])
            else:
                if self.decoder[self.nodes[nid].code] == letter:
                    new_id = nid
                else:
                    aligned_to = -1
                    for aid in self.nodes[nid].aligned:
                        if self.decoder[self.nodes[aid].code] == letter:
                            aligned_to = aid
                            break
                    if aligned_to == -1:
                        new_id = self.add_node(self.coder[letter])
                        for aid in self.nodes[nid].aligned:
                            self.nodes[new_id].aligned.append(aid)
                            self.nodes[aid].aligned.append(new_id)
                        self.nodes[new_id].aligned.append(nid)
                        self.nodes[nid].aligned.append(new_id)
                    else:
                        new_id = aligned_to
            if begin_id == -1:
                begin_id = new_id
            if head != -1:
                self.add_edge(head, new_id, prev_w + weights[q])
            head = new_id
            prev_w = weights[q]
        if tail != -1:
            self.add_edge(head, tail, prev_w + weights[valid[-1] + 1])

        self.num_sequences += 1
        self.sequences_begin.append(begin_id)
        self.topological_sort()

    def topological_sort(self) -> None:
        """Iterative DFS with aligned-node grouping (graph.cpp:293-352);
        the exact visit order defines ranks, which the DP depends on."""
        self.rank_to_node_id = []
        marks = [0] * len(self.nodes)
        check_aligned = [True] * len(self.nodes)
        for i in range(len(self.nodes)):
            if marks[i] != 0:
                continue
            stack = [i]
            while stack:
                nid = stack[-1]
                valid = True
                if marks[nid] != 2:
                    for e in self.nodes[nid].in_edges:
                        if marks[e.begin] != 2:
                            stack.append(e.begin)
                            valid = False
                    if check_aligned[nid]:
                        for aid in self.nodes[nid].aligned:
                            if marks[aid] != 2:
                                stack.append(aid)
                                check_aligned[aid] = False
                                valid = False
                    if valid:
                        marks[nid] = 2
                        if check_aligned[nid]:
                            self.rank_to_node_id.append(nid)
                            for aid in self.nodes[nid].aligned:
                                self.rank_to_node_id.append(aid)
                    else:
                        marks[nid] = 1
                if valid:
                    stack.pop()

    # ---- DP-prep / walk interface (shared with NativeGraph) ----

    def num_ranks(self) -> int:
        return len(self.rank_to_node_id)

    def rank_ids(self):
        return self.rank_to_node_id

    def max_in_edges(self) -> int:
        return max((len(self.nodes[nid].in_edges)
                    for nid in self.rank_to_node_id), default=0)

    def export_dp(self, P: int, g_: int, e_: int, q_: int, c_: int):
        """(codes R, preds RxP, npred R, endmask R, O0 R+1, F0 R+1):
        rank-ordered DP prep incl. the column-0 boundary series."""
        rank = self.rank_to_node_id
        R = len(rank)
        codes = np.zeros(R, np.int32)
        preds = np.zeros((R, P), np.int32)
        npred = np.ones(R, np.int32)
        endmask = np.zeros(R, bool)
        O0 = np.full(R + 1, NEG, np.int64)
        F0 = np.full(R + 1, NEG, np.int64)
        O0[0] = 0
        F0[0] = 0
        id_to_rank = {nid: r for r, nid in enumerate(rank)}
        for r, nid in enumerate(rank):
            node = self.nodes[nid]
            codes[r] = ord(self.decoder[node.code])
            endmask[r] = not node.out_edges
            es = node.in_edges
            if not es:
                penO, penF = q_ - c_, g_ - e_
            else:
                npred[r] = len(es)
                penO = penF = None
                for p, ed in enumerate(es):
                    pi = id_to_rank[ed.begin] + 1
                    preds[r, p] = pi
                    penO = O0[pi] if penO is None else max(penO, O0[pi])
                    penF = F0[pi] if penF is None else max(penF, F0[pi])
            O0[r + 1] = penO + c_
            F0[r + 1] = penF + e_
        return codes, preds, npred, endmask, O0, F0

    def add_walk(self, walk, seq: str) -> None:
        """Consume a raw device walk ((ei, ej) int16 arrays in reverse
        step order, or None for the no-alignment case)."""
        if walk is None:
            self.add_alignment([], seq)
            return
        ei, ej = walk
        rank = self.rank_to_node_id
        path = [(rank[int(a) - 1] if a > 0 else -1,
                 int(b) if b >= 0 else -1)
                for a, b in zip(ei, ej)]
        path.reverse()
        self.add_alignment(path, seq)

    def generate_consensus(self) -> str:
        self._traverse_heaviest_bundle()
        return "".join(self.decoder[self.nodes[nid].code]
                       for nid in self.consensus)

    def _traverse_heaviest_bundle(self) -> None:
        """graph.cpp:494-541."""
        n = len(self.nodes)
        predecessors = [-1] * n
        scores = [-1] * n
        max_id = 0
        for nid in self.rank_to_node_id:
            for e in self.nodes[nid].in_edges:
                if (scores[nid] < e.weight
                        or (scores[nid] == e.weight
                            and scores[predecessors[nid]] <= scores[e.begin])):
                    scores[nid] = e.weight
                    predecessors[nid] = e.begin
            if predecessors[nid] != -1:
                scores[nid] += scores[predecessors[nid]]
            if scores[max_id] < scores[nid]:
                max_id = nid

        if self.nodes[max_id].out_edges:
            id_to_rank = [0] * n
            for r, nid in enumerate(self.rank_to_node_id):
                id_to_rank[nid] = r
            while self.nodes[max_id].out_edges:
                max_id = self._branch_completion(scores, predecessors,
                                                id_to_rank[max_id])

        self.consensus = []
        while predecessors[max_id] != -1:
            self.consensus.append(max_id)
            max_id = predecessors[max_id]
        self.consensus.append(max_id)
        self.consensus.reverse()

    def _branch_completion(self, scores, predecessors, rank) -> int:
        """graph.cpp:544-586."""
        nid0 = self.rank_to_node_id[rank]
        for e in self.nodes[nid0].out_edges:
            for oe in self.nodes[e.end].in_edges:
                if oe.begin != nid0:
                    scores[oe.begin] = -1
        max_score = 0
        max_id = 0
        for i in range(rank + 1, len(self.rank_to_node_id)):
            nid = self.rank_to_node_id[i]
            scores[nid] = -1
            predecessors[nid] = -1
            for e in self.nodes[nid].in_edges:
                if scores[e.begin] == -1:
                    continue
                if (scores[nid] < e.weight
                        or (scores[nid] == e.weight
                            and scores[predecessors[nid]] <= scores[e.begin])):
                    scores[nid] = e.weight
                    predecessors[nid] = e.begin
            if predecessors[nid] != -1:
                scores[nid] += scores[predecessors[nid]]
            if max_score < scores[nid]:
                max_score = scores[nid]
                max_id = nid
        return max_id


class NativeGraph:
    """C-backed graph (native/poa_graph.c) with the same semantics and
    interface as Graph — the reference's graph surgery is C++
    (spoa graph.cpp); round 3 measured the pure-Python surgery at ~14 s
    of the 16 s poa wall (2.5k add_alignment+toposort calls)."""

    def __init__(self, lib):
        import ctypes
        self._ct = ctypes
        self._lib = lib
        self._h = lib.poa_new()

    def __del__(self):
        try:
            if self._h:
                self._lib.poa_free(self._h)
                self._h = None
        except Exception:
            pass

    def num_ranks(self) -> int:
        return int(self._lib.poa_num_ranks(self._h))

    def rank_ids(self):
        R = self.num_ranks()
        out = np.zeros(max(R, 1), np.int32)
        self._lib.poa_get_ranks(
            self._h, out.ctypes.data_as(
                self._ct.POINTER(self._ct.c_int32)))
        return out[:R]

    def max_in_edges(self) -> int:
        return int(self._lib.poa_max_in_edges(self._h))

    def export_dp(self, P: int, g_: int, e_: int, q_: int, c_: int):
        ct = self._ct
        R = self.num_ranks()
        codes = np.zeros(max(R, 1), np.int32)
        preds = np.zeros((max(R, 1), P), np.int32)
        npred = np.ones(max(R, 1), np.int32)
        endmask = np.zeros(max(R, 1), np.uint8)
        O0 = np.full(R + 1, NEG, np.int64)
        F0 = np.full(R + 1, NEG, np.int64)
        p32 = ct.POINTER(ct.c_int32)
        p64 = ct.POINTER(ct.c_int64)
        self._lib.poa_export_dp(
            self._h, P, codes.ctypes.data_as(p32),
            preds.ctypes.data_as(p32), npred.ctypes.data_as(p32),
            endmask.ctypes.data_as(ct.POINTER(ct.c_uint8)),
            O0.ctypes.data_as(p64), F0.ctypes.data_as(p64),
            g_, e_, q_, c_)
        return (codes[:R], preds[:R], npred[:R],
                endmask[:R].astype(bool), O0, F0)

    def add_walk(self, walk, seq: str) -> None:
        ct = self._ct
        sb = np.frombuffer(seq.encode(), np.uint8)
        p16 = ct.POINTER(ct.c_int16)
        pu8 = ct.POINTER(ct.c_uint8)
        if walk is None or len(walk[0]) == 0:
            rc = self._lib.poa_add_alignment(
                self._h, None, None, 0,
                sb.ctypes.data_as(pu8), len(sb), 0)
        else:
            ei = np.ascontiguousarray(walk[0], np.int16)
            ej = np.ascontiguousarray(walk[1], np.int16)
            rc = self._lib.poa_add_alignment(
                self._h, ei.ctypes.data_as(p16),
                ej.ctypes.data_as(p16), len(ei),
                sb.ctypes.data_as(pu8), len(sb), 1)
        if rc != 0:
            raise RuntimeError("poa_add_alignment failed")

    def generate_consensus(self) -> str:
        ct = self._ct
        cap = max(self.num_ranks() + 2, 2)
        out = np.zeros(cap, np.uint8)
        m = self._lib.poa_consensus(
            self._h, out.ctypes.data_as(ct.POINTER(ct.c_uint8)), cap)
        return out[:m].tobytes().decode()


def new_graph():
    """NativeGraph when the C library is available, else Graph."""
    import os
    if not os.environ.get("GENARCH_POA_PYGRAPH"):
        from genarchbench_tpu import native
        lib = native.readers_lib()
        if lib is not None:
            return NativeGraph(lib)
    return Graph()


# ---------------------------------------------------------------------------
# convex NW alignment engine (device DP + host traceback)
# ---------------------------------------------------------------------------

def _round_up_pow2(v: int, lo: int = 16) -> int:
    p = lo
    while p < v:
        p *= 2
    return p


def _round_up_mult(v: int, m: int) -> int:
    return max(m, ((v + m - 1) // m) * m)


def _convex_dp_codes(node_ch, seq, preds, npred, H0col, F0col, O0col,
                     endmask, Wlen, nrank,
                     R, W, P, m, n, g, e, q, c):
    """DP over R ranks x W+1 columns for ONE window, emitting packed
    traceback CODE PLANES instead of returning the matrices.

    node_ch (R,) int32 rank-row characters and seq (W+1,) int32 query
    characters (one pad column at j=0): the (R, W+1) match-score
    profile is derived ON DEVICE one row at a time — shipping the
    materialized profile was 269 MB/round over the host link, vs 0.5 MB
    for the characters (the round-3 poa wall was this transfer, not
    compute).  preds (R, P) predecessor ROW indices (rank+1; 0 =
    virtual row); npred (R,); *0col (R+1,) column-0 boundary; the row-0
    boundary (H/E/Q0row) is the closed-form gap series, computed here;
    endmask (R,) rank has no out_edges; Wlen actual query length.

    plane1 per cell: bit0 dfound | 1-11 diag pred row | 12 ufound |
    13 up-extend | 14-24 up pred row | 25 lfound | 26 left-extend |
    27 left-extension-continues (shifted by one column: the bit at
    (i, j) answers the reference's loop check after j -> j-1,
    sisd_alignment_engine.cpp extend-left break condition).
    plane2: bit0 upx-found | 1-11 upx pred row | 12-22 up-stop pred
    row — the two lookups of the extend-up loop.  Every decision is
    evaluated with the if-chain candidate PRIORITY of the reference
    backtrack (:700-912), against the same stored matrix values."""
    i32 = jnp.int32
    u32 = jnp.uint32
    W1 = W + 1
    # row-0 boundary series (spoa initialize, sisd_alignment_engine.cpp
    # :116-160): E0row[j] = g + (j-1)e, Q0row[j] = q + (j-1)c, H = max
    jr = jnp.arange(W1, dtype=i32)
    E0row = jnp.where(jr == 0, 0, g + (jr - 1) * e)
    Q0row = jnp.where(jr == 0, 0, q + (jr - 1) * c)
    H0row = jnp.maximum(E0row, Q0row).at[0].set(0)
    Hm = jnp.full((R + 1, W1), NEG, i32).at[0].set(H0row)
    Fm = jnp.full((R + 1, W1), NEG, i32)
    Om = jnp.full((R + 1, W1), NEG, i32)
    Em = jnp.full((R + 1, W1), NEG, i32).at[0].set(E0row)
    Qm = jnp.full((R + 1, W1), NEG, i32).at[0].set(Q0row)
    Hm = Hm.at[:, 0].set(H0col)
    Fm = Fm.at[:, 0].set(F0col)
    Om = Om.at[:, 0].set(O0col)

    jok = jnp.arange(W1) >= 1

    def shift1(row):
        return jnp.concatenate([jnp.full((1,), NEG, i32), row[:-1]])

    def b(mask, bit):
        return jnp.where(mask, u32(1), u32(0)) << bit

    def left_codes(H_row, E_row, Q_row):
        H_sh, E_sh, Q_sh = shift1(H_row), shift1(E_row), shift1(Q_row)
        l0 = H_row == E_sh + e
        l1 = H_row == H_sh + g
        l2 = H_row == Q_sh + c
        l3 = H_row == H_sh + q
        lfound = l0 | l1 | l2 | l3
        lext = l0 | (~l0 & ~l1 & l2)
        contl = (E_sh + e == E_row) | (Q_sh + c == Q_row)
        return (b(lfound & jok, 25) | b(lext & jok, 26)
                | b(contl & jok, 27))

    plane1 = jnp.zeros((R + 1, W1), u32).at[0].set(
        left_codes(H0row, E0row, Q0row))
    plane2 = jnp.zeros((R + 1, W1), u32)

    def row_step(r, carry):
        Hm, Fm, Om, Em, Qm, plane1, plane2 = carry
        i = r + 1
        pidx = preds[r]                                       # (P,)
        pmask = jnp.arange(P) < npred[r]
        Hp = Hm[pidx]                                         # (P, W1)
        Fp = Fm[pidx]
        Op = Om[pidx]
        big = jnp.where(pmask[:, None], 0, NEG)
        F_row = jnp.max(jnp.maximum(Hp + g, Fp + e) + big, axis=0)
        O_row = jnp.max(jnp.maximum(Hp + q, Op + c) + big, axis=0)
        Hp_sh = jnp.concatenate(
            [jnp.full((P, 1), NEG, i32), Hp[:, :-1]], axis=1)
        prow = jnp.where(seq == node_ch[r], m, n)            # (W1,)
        Hdiag = jnp.max(Hp_sh + big, axis=0) + prow
        pre = jnp.maximum(Hdiag, jnp.maximum(F_row, O_row))
        pre = pre.at[0].set(Hm[i, 0])                         # col-0 boundary

        # in-row coupled (H, E, Q) recurrence:
        #   E_j = max(H_{j-1}+g, E_{j-1}+e); Q_j = max(H_{j-1}+q, Q_{j-1}+c)
        #   H_j = max(pre_j, E_j, Q_j)
        if (g <= e <= 0) and (q <= c <= 0) and (g <= c) and (q <= e):
            # CLOSED FORM under single-gap dominance (opening at least
            # as costly as extending, both gap types — the spoa
            # penalty regime): any two-gap composition is beaten by
            # one longer gap, so
            #   H_j = max(pre_j, g+(j-1)e + max_{k<j}(pre_k - k e),
            #                    q+(j-1)c + max_{k<j}(pre_k - k c))
            # and the exact stored E/Q values follow from H alone by
            # unrolling their recurrences:
            #   E_j = g+(j-1)e + max_{k<j}(H_k - k e)   (Q analogous).
            # Four exclusive prefix maxes replace the 3x3 max-plus
            # associative scan (measured ~2.9 ms/row -> the whole poa
            # DP round dropped ~4x; scan kept below for exotic
            # penalty settings).
            jre = jr * e
            jrc = jr * c

            def eprefmax(v):
                sh = jnp.concatenate(
                    [jnp.full((1,), NEG, i32), v[:-1]])
                d = 1
                while d < W1:
                    sh = jnp.maximum(sh, jnp.concatenate(
                        [jnp.full((d,), NEG, i32), sh[:-d]]))
                    d *= 2
                return sh

            A = eprefmax(pre - jre)
            Bv = eprefmax(pre - jrc)
            H_row = jnp.maximum(pre, jnp.maximum(
                g + (jr - 1) * e + A, q + (jr - 1) * c + Bv))
            H_row = jnp.maximum(H_row, NEG)
            E_row = jnp.maximum(
                g + (jr - 1) * e + eprefmax(H_row - jre), NEG)
            Q_row = jnp.maximum(
                q + (jr - 1) * c + eprefmax(H_row - jrc), NEG)
        else:
            # general max-plus affine scan:
            # state s=[H,E,Q]; s_j = M (x) s_{j-1} (+) [pre_j, NEG, NEG]
            M = jnp.array([[max(g, q), e, c],
                           [g, e, NEG],
                           [q, NEG, c]], i32)
            Ms = jnp.broadcast_to(M, (W1, 3, 3))
            cs = jnp.stack([pre,
                            jnp.full((W1,), NEG, i32),
                            jnp.full((W1,), NEG, i32)], axis=1)
            # j=0 element: "kill" matrix + constant = the boundary state
            ident = jnp.full((3, 3), NEG, i32)
            c0 = jnp.stack([pre[0], jnp.asarray(NEG, i32),
                            jnp.asarray(NEG, i32)])
            Ms = Ms.at[0].set(ident)
            cs = cs.at[0].set(c0)

            def compose(a, b_):
                # b after a; max-plus matmul Mo[x,y]=max_k Mb[x,k]+Ma[k,y],
                # clamped at NEG so -inf stand-ins cannot underflow int32
                Ma, ca = a
                Mb, cb = b_
                Mo = jnp.max(Mb[..., :, :, None] + Ma[..., None, :, :],
                             axis=-2)
                co = jnp.max(Mb + ca[..., None, :], axis=-1)
                co = jnp.maximum(co, cb)
                return jnp.maximum(Mo, NEG), jnp.maximum(co, NEG)

            Msc, csc = lax.associative_scan(compose, (Ms, cs), axis=0)
            # s_j = csc_j (x0 contribution is inside c0)
            H_row = jnp.maximum(csc[:, 0], NEG)
            E_row = csc[:, 1]
            Q_row = csc[:, 2]

        # ---- traceback code planes for row i ----
        # The barrier pins the DP row values before the code-plane
        # bit-packing: without it, XLA's fused TPU kernel for the
        # packing expression produces scattered zero cells at wide
        # batch (observed G>=129, W1=513 — plane1 lost dfound/left
        # bits for ~3k cells while plane2 and the H scores stayed
        # correct; CPU, G=1, and the barriered form all agree).
        (H_row, E_row, Q_row, F_row, O_row, Hp, Fp, Op, Hp_sh, prow) = \
            lax.optimization_barrier(
                (H_row, E_row, Q_row, F_row, O_row, Hp, Fp, Op, Hp_sh,
                 prow))
        preds_r = pidx
        zb = jnp.zeros((W1,), bool)
        zi = jnp.zeros((W1,), i32)
        dfound, dpi = zb, zi
        uf, upi, uext = zb, zi, zb
        xf, xpi, spi = zb, zi, zi
        Fl = F_row.at[0].set(Fm[i, 0])        # stored col-0 boundary
        Ol = O_row.at[0].set(Om[i, 0])
        for p in range(P - 1, -1, -1):        # ascending priority last
            ok = pmask[p]
            hit_d = ok & (H_row == Hp_sh[p] + prow)
            dfound = dfound | hit_d
            dpi = jnp.where(hit_d, preds_r[p], dpi)
            c0_ = H_row == Fp[p] + e
            c1_ = H_row == Hp[p] + g
            c2_ = H_row == Op[p] + c
            c3_ = H_row == Hp[p] + q
            hit_u = ok & (c0_ | c1_ | c2_ | c3_)
            uf = uf | hit_u
            upi = jnp.where(hit_u, preds_r[p], upi)
            uext = jnp.where(hit_u, c0_ | (~c0_ & ~c1_ & c2_), uext)
            hit_x = ok & ((Fl == Fp[p] + e) | (Ol == Op[p] + c))
            xf = xf | hit_x
            xpi = jnp.where(hit_x, preds_r[p], xpi)
            hit_s = ok & ((Fl == Hp[p] + g) | (Ol == Hp[p] + q))
            spi = jnp.where(hit_s, preds_r[p], spi)

        p1 = (b(dfound & jok, 0) | (dpi.astype(u32) << 1)
              | b(uf, 12) | b(uext & uf, 13) | (upi.astype(u32) << 14)
              | left_codes(H_row, E_row, Q_row))
        p2 = (b(xf, 0) | (xpi.astype(u32) << 1)
              | (spi.astype(u32) << 12))
        plane1 = plane1.at[i].set(p1)
        plane2 = plane2.at[i].set(p2)

        Hm = Hm.at[i].set(H_row)
        Fm = Fm.at[i, 1:].set(F_row[1:])
        Om = Om.at[i, 1:].set(O_row[1:])
        Em = Em.at[i].set(E_row)
        Qm = Qm.at[i].set(Q_row)
        return (Hm, Fm, Om, Em, Qm, plane1, plane2)

    # run only the rows that exist in this batch (padded rows past the
    # batch-wide max rank count are dead weight: R is the pad)
    Hm, Fm, Om, Em, Qm, plane1, plane2 = lax.fori_loop(
        0, jnp.minimum(nrank, R), row_step,
        (Hm, Fm, Om, Em, Qm, plane1, plane2))

    # NW start: last valid column, first (rank order) max over end rows
    # (reference: strict max_score < sc keeps the first, :459-463)
    Hcol = lax.dynamic_slice(Hm, (0, Wlen), (R + 1, 1))[:, 0]
    scores = jnp.where(endmask, Hcol[1:], NEG - 1)
    start_i = jnp.argmax(scores).astype(i32) + 1
    return plane1, plane2, start_i


@partial(jax.jit, static_argnames=("R", "W", "P", "m", "n", "g", "e",
                                   "q", "c", "MAXSTEP"))
def _poa_align_device(blob,
                      R, W, P, m, n, g, e, q, c, MAXSTEP):
    """Batched (vmapped) DP + lock-step traceback walk over G windows.
    All per-round inputs arrive as ONE flat int32 blob (array-major:
    node_ch | seq | preds | npred | H0col | F0col | O0col | endmask |
    Wlen) and the result returns as ONE packed uint32 (G, MAXSTEP)
    plane: per step the consumed node ROW (-1: none) in the low half
    and query index (-1: none) in the high half, -2 marking walk end.
    The remote-tunnel link pays ~100 ms per transfer regardless of
    size, so transfer COUNT dominates — 9 h2d calls measured 0.94 s
    against ~1 MB of payload."""
    i32 = jnp.int32
    W1 = W + 1
    per = R + W1 + R * P + R + 3 * (R + 1) + R + 1
    G = blob.shape[0] // per

    parts = []
    o = 0
    for sz, shape in ((R, (G, R)), (W1, (G, W1)), (R * P, (G, R, P)),
                      (R, (G, R)), (R + 1, (G, R + 1)),
                      (R + 1, (G, R + 1)), (R + 1, (G, R + 1)),
                      (R, (G, R)), (1, (G,))):
        parts.append(lax.slice(blob, (o,), (o + G * sz,)).reshape(shape))
        o += G * sz
    (node_ch, seq, preds, npred, H0col, F0col, O0col,
     endmask_i, Wlen) = parts
    endmask = endmask_i != 0

    nrank_dev = jnp.max(jnp.sum((node_ch >= 0).astype(jnp.int32),
                                axis=1))
    plane1, plane2, start_i = jax.vmap(
        partial(_convex_dp_codes, R=R, W=W, P=P, m=m, n=n, g=g, e=e,
                q=q, c=c), in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None)
        )(node_ch, seq, preds, npred, H0col, F0col,
          O0col, endmask, Wlen, nrank_dev)
    W1 = W + 1
    p1f = plane1.reshape(G, (R + 1) * W1)
    p2f = plane2.reshape(G, (R + 1) * W1)
    outi0 = jnp.full((G, MAXSTEP), -2, jnp.int16)
    outj0 = jnp.full((G, MAXSTEP), -2, jnp.int16)

    def step(carry):
        i, jx, mode, fin, t, outi, outj = carry
        act = ~fin
        flat = jnp.clip(i, 0, R) * W1 + jnp.clip(jx, 0, W1 - 1)
        c1 = jnp.take_along_axis(p1f, flat[:, None], 1)[:, 0]
        c2 = jnp.take_along_axis(p2f, flat[:, None], 1)[:, 0]
        dfound = (c1 & 1) != 0
        dpi = ((c1 >> 1) & 0x7FF).astype(i32)
        uf = ((c1 >> 12) & 1) != 0
        uext = ((c1 >> 13) & 1) != 0
        upi = ((c1 >> 14) & 0x7FF).astype(i32)
        lf = ((c1 >> 25) & 1) != 0
        lext = ((c1 >> 26) & 1) != 0
        contl = ((c1 >> 27) & 1) != 0
        xfound = (c2 & 1) != 0
        xpi = ((c2 >> 1) & 0x7FF).astype(i32)
        spi = ((c2 >> 12) & 0x7FF).astype(i32)

        normal = act & (mode == 0)
        el_step = act & (mode == 1)
        eu_step = act & (mode == 2)
        d_take = normal & dfound
        u_take = normal & ~dfound & uf
        l_take = normal & ~dfound & ~uf & lf
        none = normal & ~dfound & ~uf & ~lf

        emit_i = jnp.where(d_take | u_take | eu_step, i, -1)
        emit_j = jnp.where(d_take | l_take | el_step, jx - 1, -1)
        emit_i = jnp.where(act, emit_i, -2)
        emit_j = jnp.where(act, emit_j, -2)

        eu_prev = jnp.where(xfound, xpi, spi)
        ni = jnp.where(d_take, dpi,
             jnp.where(u_take, upi,
             jnp.where(eu_step, eu_prev, i)))
        nj = jnp.where(d_take | l_take | el_step, jx - 1, jx)
        nmode = jnp.where(d_take, 0,
                jnp.where(u_take, jnp.where(uext, 2, 0),
                jnp.where(l_take, jnp.where(lext, 1, 0),
                jnp.where(el_step, jnp.where(contl, 1, 0),
                jnp.where(eu_step,
                          jnp.where(xfound & (eu_prev != 0), 2, 0),
                          mode)))))
        nfin = fin | none | ((ni == 0) & (nj == 0))
        outi = lax.dynamic_update_slice(
            outi, emit_i.astype(jnp.int16)[:, None], (0, t))
        outj = lax.dynamic_update_slice(
            outj, emit_j.astype(jnp.int16)[:, None], (0, t))
        return (ni, nj, nmode, nfin, t + 1, outi, outj)

    def cond(carry):
        fin, t = carry[3], carry[4]
        return (~jnp.all(fin)) & (t < MAXSTEP)

    # live windows always have a non-empty query; the padded mask is
    # derived on device (a separate bool h2d cost ~75 ms of pure
    # tunnel latency per round)
    active = Wlen > 0
    carry = (start_i, Wlen, jnp.zeros((G,), i32), ~active,
             jnp.asarray(0, i32), outi0, outj0)
    (_, _, _, _, _, outi, outj) = lax.while_loop(cond, step, carry)
    return (outi.astype(jnp.int32) & 0xFFFF) | (
        outj.astype(jnp.int32) << 16)


class ConvexNWEngine:
    """spoa convex kNW engine equivalent (m=2,n=-4,g=-6,e=-2,q=-28,c=-1
    from the driver's o/e translation, msa_spoa_omp.cpp:171-215)."""

    def __init__(self, m=2, n=-4, g=-6, e=-2, q=-28, c=-1):
        self.m, self.n, self.g, self.e, self.q, self.c = m, n, g, e, q, c

    def align(self, seq: str, graph) -> list:
        """Single-window compat wrapper: spoa-exact (node_id, seq_idx)
        path."""
        walk = self.align_many([seq], [graph])[0]
        if walk is None:
            return []
        ei, ej = walk
        rank = graph.rank_ids()
        path = [(int(rank[int(a) - 1]) if a > 0 else -1,
                 int(b) if b >= 0 else -1)
                for a, b in zip(ei, ej)]
        path.reverse()
        return path

    def align_many(self, seqs: List[str], graphs) -> list:
        """Align seqs[w] to graphs[w] for every window w in ONE device
        round (batched DP + lock-step walk).  Returns per window the
        raw walk (ei, ej int16 arrays, reverse step order; rank+1
        row indices) or None for empty graphs/seqs — feed to
        graph.add_walk."""
        m_, n_, g_, e_, q_, c_ = (self.m, self.n, self.g, self.e,
                                  self.q, self.c)
        G = len(seqs)
        results: List = [None] * G
        nranks = [g.num_ranks() for g in graphs]
        all_live = [w for w in range(G) if nranks[w] and seqs[w]]
        if not all_live:
            return results
        # bucket windows by predecessor width: Pmax is a whole-round
        # max, and ONE window holding a node with 8 in-edges made every
        # round 6x more expensive than the P<=4 rounds (the per-row
        # (G, P, W1) predecessor reads scale superlinearly in P); the
        # rare wide-P windows run in their own small dispatch
        by_p = defaultdict(list)
        for w in all_live:
            by_p[_round_up_pow2(max(graphs[w].max_in_edges(), 1), 1)
                 ].append(w)
        for live in by_p.values():
            self._align_group(seqs, graphs, live, results)
        return results

    def _align_group(self, seqs, graphs, live, results):
        m_, n_, g_, e_, q_, c_ = (self.m, self.n, self.g, self.e,
                                  self.q, self.c)
        nranks = [g.num_ranks() for g in graphs]

        Rmax = max(nranks[w] for w in live)
        Wmax = max(len(seqs[w]) for w in live)
        Pmax = max(max(graphs[w].max_in_edges(), 1) for w in live)
        # 64-granular padding: pow2 rounding wasted up to 2x rows/cols
        # (e.g. W=275 -> 512); the DP cost is R*W so the finer buckets
        # pay for their extra compiles immediately (cache-persistent)
        Rpad = _round_up_mult(Rmax, 64)
        Wpad = _round_up_mult(Wmax, 64)
        Ppad = _round_up_pow2(max(Pmax, 1), 1)
        if Rpad + 1 > 2047:
            raise ValueError(
                f"poa: graph with {Rmax} ranks exceeds the 11-bit "
                "row-index budget of the packed traceback planes")
        W1 = Wpad + 1
        # pad the group count to a 64-multiple: Gn enters the compiled
        # shape, and specific raw counts hit an XLA tiling pathology
        # (two Gn values of the SAME (R, W, P) bucket ran 4x slower
        # than their neighbours on TPU); padding also bounds the
        # compile count.  Pad lanes carry Wlen=0 and never walk.
        Gn = _round_up_mult(len(live), 64)

        node_chs = np.full((Gn, Rpad), -2, np.int32)  # never matches seq
        seq_arrs = np.full((Gn, W1), -1, np.int32)    # col 0 + pads
        preds = np.zeros((Gn, Rpad, Ppad), np.int32)
        npred = np.ones((Gn, Rpad), np.int32)
        O0 = np.full((Gn, Rpad + 1), NEG, np.int64)
        F0 = np.full((Gn, Rpad + 1), NEG, np.int64)
        endmask = np.zeros((Gn, Rpad), bool)
        Wlen = np.zeros(Gn, np.int32)

        for gi, w in enumerate(live):
            graph, seq = graphs[w], seqs[w]
            R = nranks[w]
            W = len(seq)
            Wlen[gi] = W
            seq_arrs[gi, 1:W + 1] = np.frombuffer(seq.encode(), np.uint8)
            (codes, pr, npr, em, o0, f0) = graph.export_dp(
                Ppad, g_, e_, q_, c_)
            node_chs[gi, :R] = codes
            preds[gi, :R] = pr
            npred[gi, :R] = npr
            endmask[gi, :R] = em
            O0[gi, :R + 1] = o0
            F0[gi, :R + 1] = f0

        H0col = np.maximum(O0, F0)
        H0col[:, 0] = 0

        MAXSTEP = Rpad + W1 + 4
        blob = np.concatenate([
            node_chs.ravel(), seq_arrs.ravel(), preds.ravel(),
            npred.ravel(), H0col.astype(np.int32).ravel(),
            F0.astype(np.int32).ravel(), O0.astype(np.int32).ravel(),
            endmask.astype(np.int32).ravel(), Wlen])
        packed = _poa_align_device(
            jnp.asarray(blob),
            R=Rpad, W=Wpad, P=Ppad, m=m_, n=n_, g=g_, e=e_, q=q_,
            c=c_, MAXSTEP=MAXSTEP)
        halves = np.ascontiguousarray(np.asarray(packed)) \
            .view(np.int16).reshape(Gn, MAXSTEP, 2)
        if sys.byteorder == "little":
            outi, outj = halves[:, :, 0], halves[:, :, 1]
        else:
            outi, outj = halves[:, :, 1], halves[:, :, 0]

        ends = outi == -2
        for gi, w in enumerate(live):
            ei = outi[gi]
            nstep = int(np.argmax(ends[gi])) if ends[gi].any() \
                else MAXSTEP
            results[w] = (ei[:nstep], outj[gi][:nstep])
        return results


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def read_batches(path: str) -> List[List[str]]:
    """msa_spoa_omp.cpp:99-127: header lines whose 2nd char is '0'
    begin a new batch."""
    batches: List[List[str]] = []
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f]
    i = 0
    nline = len(lines)
    while i < nline:
        hdr = lines[i]
        if len(hdr) > 1 and hdr[1] == "0":
            seqs = []
            i += 1
            while i < nline:
                seqs.append(lines[i])
                i += 1
                if i >= nline:
                    break
                nxt = lines[i]
                if len(nxt) > 1 and nxt[1] == "0":
                    break
                i += 1
            batches.append(seqs)
        else:
            i += 1
    return batches


def consensus_for_batches(batches: List[List[str]],
                          engine: ConvexNWEngine) -> List[str]:
    """Consensus per window, aligning all windows' s-th sequences in
    lock-step device rounds (the add_alignment order within each window
    is exactly the reference's sequential order)."""
    graphs = [new_graph() for _ in batches]
    rounds = max((len(b) for b in batches), default=0)
    for s in range(rounds):
        idx = [w for w, seqs in enumerate(batches) if s < len(seqs)]
        walks = engine.align_many([batches[w][s] for w in idx],
                                  [graphs[w] for w in idx])
        for k, w in enumerate(idx):
            graphs[w].add_walk(walks[k], batches[w][s])
    return [g.generate_consensus() for g in graphs]


def consensus_for_batch(seqs: List[str], engine: ConvexNWEngine) -> str:
    return consensus_for_batches([seqs], engine)[0]


def run(argv: Sequence[str]) -> int:
    """CLI compatible with the reference msa_spoa_omp
    (msa_spoa_omp.cpp:167-215)."""
    import argparse
    p = argparse.ArgumentParser(prog="poa")
    p.add_argument("-s", dest="seq_file", default="seq.fa")
    p.add_argument("-t", dest="threads", type=int, default=1)
    p.add_argument("-m", type=int, default=2)
    p.add_argument("-x", type=int, default=4)
    p.add_argument("-o", default="4,24")
    p.add_argument("-e", default="2,1")
    p.add_argument("-n", type=int, default=10)
    args = p.parse_args(argv)

    o_parts = [int(t) for t in str(args.o).split(",")]
    e_parts = [int(t) for t in str(args.e).split(",")]
    o1 = -o_parts[0]
    o2 = -(o_parts[1] if len(o_parts) > 1 else 24)
    e1 = -e_parts[0]
    e2 = -(e_parts[1] if len(e_parts) > 1 else 1)
    engine = ConvexNWEngine(m=args.m, n=-args.x,
                            g=o1 + e1, e=e1, q=o2 + e2, c=e2)

    print(f"Running with threads: {args.threads}", file=sys.stderr)
    batches = read_batches(args.seq_file)
    print(f"Number of batches: {len(batches)}, Size of batch struct 64",
          file=sys.stderr)
    roi = ROITimer(
        "poa", "Runtime: {t:.2f}, GraphCreate: 0.00, Align: 0.00, "
        "AddSeqGraph: 0.00, Consensus 0.00 {t:.2f} 0.000 ")
    with roi:
        results = consensus_for_batches(batches, engine)
    for cons in results:
        print(">Consensus_sequence")
        print(cons)
    roi.report()
    return 0


if __name__ == "__main__":
    sys.exit(run(sys.argv[1:]))
