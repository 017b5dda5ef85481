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
  * graph surgery and consensus stay on the host (tiny, irregular,
    exact-order sensitive); the DP matrices are downloaded once per
    aligned sequence for the host traceback.
  * (R, W) shapes are padded to pow2 buckets to bound compilation.
"""

from __future__ import annotations

import sys
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


# ---------------------------------------------------------------------------
# convex NW alignment engine (device DP + host traceback)
# ---------------------------------------------------------------------------

def _round_up_pow2(v: int, lo: int = 16) -> int:
    p = lo
    while p < v:
        p *= 2
    return p


@partial(jax.jit, static_argnames=("R", "W", "P", "m", "n", "g", "e",
                                   "q", "c"))
def _convex_rows_device(prof, preds, npred, H0col, F0col, O0col,
                        H0row, E0row, Q0row, R, W, P, m, n, g, e, q, c):
    """DP over R ranks x W+1 columns.  prof (R, W+1) int32 match scores
    per rank row; preds (R, P) predecessor ROW indices (rank+1; 0 =
    virtual row); npred (R,); *0col (R+1,) column-0 boundary; *0row
    (W+1,) row-0 boundary.  Returns H, F, O, E, Q (R+1, W+1)."""
    i32 = jnp.int32
    W1 = W + 1
    Hm = jnp.full((R + 1, W1), NEG, i32).at[0].set(H0row)
    Fm = jnp.full((R + 1, W1), NEG, i32)
    Om = jnp.full((R + 1, W1), NEG, i32)
    Em = jnp.full((R + 1, W1), NEG, i32).at[0].set(E0row)
    Qm = jnp.full((R + 1, W1), NEG, i32).at[0].set(Q0row)
    Hm = Hm.at[:, 0].set(H0col)
    Fm = Fm.at[:, 0].set(F0col)
    Om = Om.at[:, 0].set(O0col)

    col = jnp.arange(W1)

    def row_step(r, carry):
        Hm, Fm, Om, Em, Qm = carry
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
        Hdiag = jnp.max(Hp_sh + big, axis=0) + prof[r]
        pre = jnp.maximum(Hdiag, jnp.maximum(F_row, O_row))
        pre = pre.at[0].set(Hm[i, 0])                         # col-0 boundary

        # in-row coupled (H, E, Q) max-plus affine scan:
        #   E_j = max(H_{j-1}+g, E_{j-1}+e); Q_j = max(H_{j-1}+q, Q_{j-1}+c)
        #   H_j = max(pre_j, E_j, Q_j)
        # state s=[H,E,Q]; s_j = M (x) s_{j-1} (+) [pre_j, NEG, NEG]
        M = jnp.array([[max(g, q), e, c],
                       [g, e, NEG],
                       [q, NEG, c]], i32)
        Ms = jnp.broadcast_to(M, (W1, 3, 3))
        cs = jnp.stack([pre,
                        jnp.full((W1,), NEG, i32),
                        jnp.full((W1,), NEG, i32)], axis=1)   # (W1, 3)
        # j=0 element: "kill" matrix + constant = the boundary state
        ident = jnp.full((3, 3), NEG, i32)
        c0 = jnp.stack([pre[0], jnp.asarray(NEG, i32),
                        jnp.asarray(NEG, i32)])
        Ms = Ms.at[0].set(ident)
        cs = cs.at[0].set(c0)

        def compose(a, b):
            # b after a; max-plus matmul Mo[x,y] = max_k Mb[x,k]+Ma[k,y],
            # clamped at NEG so -inf stand-ins cannot underflow int32
            Ma, ca = a
            Mb, cb = b
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

        Hm = Hm.at[i].set(H_row)
        Fm = Fm.at[i, 1:].set(F_row[1:])
        Om = Om.at[i, 1:].set(O_row[1:])
        Em = Em.at[i].set(E_row)
        Qm = Qm.at[i].set(Q_row)
        return (Hm, Fm, Om, Em, Qm)

    Hm, Fm, Om, Em, Qm = lax.fori_loop(0, R, row_step,
                                       (Hm, Fm, Om, Em, Qm))
    return Hm, Fm, Om, Em, Qm


class ConvexNWEngine:
    """spoa convex kNW engine equivalent (m=2,n=-4,g=-6,e=-2,q=-28,c=-1
    from the driver's o/e translation, msa_spoa_omp.cpp:171-215)."""

    def __init__(self, m=2, n=-4, g=-6, e=-2, q=-28, c=-1):
        self.m, self.n, self.g, self.e, self.q, self.c = m, n, g, e, q, c

    def align(self, seq: str, graph: Graph):
        if not graph.nodes or not seq:
            return []
        m_, n_, g_, e_, q_, c_ = (self.m, self.n, self.g, self.e,
                                  self.q, self.c)
        rank = graph.rank_to_node_id
        R = len(rank)
        W = len(seq)
        id_to_rank = {nid: r for r, nid in enumerate(rank)}

        Rpad = _round_up_pow2(R)
        Wpad = _round_up_pow2(W)
        W1 = Wpad + 1

        # per-rank match profile rows
        prof = np.full((Rpad, W1), n_, np.int32)
        seq_arr = np.frombuffer(seq.encode(), np.uint8)
        for r, nid in enumerate(rank):
            ch = ord(graph.decoder[graph.nodes[nid].code])
            prof[r, 1:W + 1] = np.where(seq_arr == ch, m_, n_)
        prof[:, 0] = 0

        Pmax = max(1, max((len(graph.nodes[nid].in_edges)
                           for nid in rank), default=1))
        Pmax = _round_up_pow2(Pmax, 1)
        preds = np.zeros((Rpad, Pmax), np.int32)
        npred = np.ones(Rpad, np.int32)
        for r, nid in enumerate(rank):
            es = graph.nodes[nid].in_edges
            if not es:
                preds[r, 0] = 0
                npred[r] = 1
            else:
                npred[r] = len(es)
                for p, e in enumerate(es):
                    preds[r, p] = id_to_rank[e.begin] + 1

        # boundaries (initialize(), sisd_alignment_engine.cpp:115-205)
        O0 = np.full(Rpad + 1, NEG, np.int64)
        F0 = np.full(Rpad + 1, NEG, np.int64)
        O0[0] = 0
        F0[0] = 0
        for r, nid in enumerate(rank):
            es = graph.nodes[nid].in_edges
            if not es:
                penO, penF = q_ - c_, g_ - e_
            else:
                penO = max(O0[id_to_rank[e.begin] + 1] for e in es)
                penF = max(F0[id_to_rank[e.begin] + 1] for e in es)
            O0[r + 1] = penO + c_
            F0[r + 1] = penF + e_
        H0col = np.maximum(O0, F0)
        H0col[0] = 0
        E0row = np.full(W1, NEG, np.int64)
        Q0row = np.full(W1, NEG, np.int64)
        E0row[1:] = g_ + np.arange(W1 - 1) * e_
        Q0row[1:] = q_ + np.arange(W1 - 1) * c_
        E0row[0] = 0
        Q0row[0] = 0
        H0row = np.maximum(E0row, Q0row)
        H0row[0] = 0
        # padded columns beyond W keep extending (harmless, never read)

        out = _convex_rows_device(
            jnp.asarray(prof), jnp.asarray(preds), jnp.asarray(npred),
            jnp.asarray(H0col.astype(np.int32)),
            jnp.asarray(F0.astype(np.int32)),
            jnp.asarray(O0.astype(np.int32)),
            jnp.asarray(H0row.astype(np.int32)),
            jnp.asarray(E0row.astype(np.int32)),
            jnp.asarray(Q0row.astype(np.int32)),
            R=Rpad, W=Wpad, P=Pmax,
            m=m_, n=n_, g=g_, e=e_, q=q_, c=c_)
        H, F, O, E, Q = (np.asarray(x) for x in out)

        return self._traceback(seq, graph, rank, id_to_rank,
                               H, F, O, E, Q, R, W)

    def _traceback(self, seq, graph, rank, id_to_rank, H, F, O, E, Q,
                   R, W):
        """sisd_alignment_engine.cpp convex backtrack (:700-912)."""
        m_, n_, g_, e_, q_, c_ = (self.m, self.n, self.g, self.e,
                                  self.q, self.c)
        # NW max: last column, rows whose node has no out_edges
        max_score = None
        max_i = max_j = -1
        for r, nid in enumerate(rank):
            if not graph.nodes[nid].out_edges:
                sc = H[r + 1, W]
                if max_score is None or max_score < sc:
                    max_score = sc
                    max_i, max_j = r + 1, W

        i, j = max_i, max_j
        alignment: List[Tuple[int, int]] = []
        prev_i = prev_j = 0
        while not (i == 0 and j == 0):
            H_ij = H[i, j]
            found = False
            extend_left = extend_up = False
            if i != 0 and j != 0:
                node = graph.nodes[rank[i - 1]]
                mc = (m_ if self.match(graph, node, seq[j - 1]) else n_)
                plist = ([0] if not node.in_edges else
                         [id_to_rank[e.begin] + 1 for e in node.in_edges])
                for pi in plist:
                    if H_ij == H[pi, j - 1] + mc:
                        prev_i, prev_j, found = pi, j - 1, True
                        break
            if not found and i != 0:
                node = graph.nodes[rank[i - 1]]
                plist = ([0] if not node.in_edges else
                         [id_to_rank[e.begin] + 1 for e in node.in_edges])
                for pi in plist:
                    if H_ij == F[pi, j] + e_:
                        extend_up = True
                        prev_i, prev_j, found = pi, j, True
                        break
                    if H_ij == H[pi, j] + g_:
                        prev_i, prev_j, found = pi, j, True
                        break
                    if H_ij == O[pi, j] + c_:
                        extend_up = True
                        prev_i, prev_j, found = pi, j, True
                        break
                    if H_ij == H[pi, j] + q_:
                        prev_i, prev_j, found = pi, j, True
                        break
            if not found and j != 0:
                if H_ij == E[i, j - 1] + e_:
                    extend_left = True
                    prev_i, prev_j, found = i, j - 1, True
                elif H_ij == H[i, j - 1] + g_:
                    prev_i, prev_j, found = i, j - 1, True
                elif H_ij == Q[i, j - 1] + c_:
                    extend_left = True
                    prev_i, prev_j, found = i, j - 1, True
                elif H_ij == H[i, j - 1] + q_:
                    prev_i, prev_j, found = i, j - 1, True

            alignment.append((
                -1 if i == prev_i else rank[i - 1],
                -1 if j == prev_j else j - 1))
            i, j = prev_i, prev_j

            if extend_left:
                while True:
                    alignment.append((-1, j - 1))
                    j -= 1
                    if (E[i, j] + e_ != E[i, j + 1]
                            and Q[i, j] + c_ != Q[i, j + 1]):
                        break
            elif extend_up:
                while True:
                    stop = True
                    prev_i = 0
                    node = graph.nodes[rank[i - 1]]
                    for ed in node.in_edges:
                        pi = id_to_rank[ed.begin] + 1
                        if (F[i, j] == F[pi, j] + e_
                                or O[i, j] == O[pi, j] + c_):
                            prev_i = pi
                            stop = False
                            break
                    if stop:
                        for ed in node.in_edges:
                            pi = id_to_rank[ed.begin] + 1
                            if (F[i, j] == H[pi, j] + g_
                                    or O[i, j] == H[pi, j] + q_):
                                prev_i = pi
                                break
                    alignment.append((rank[i - 1], -1))
                    i = prev_i
                    if stop or i == 0:
                        break

        alignment.reverse()
        return alignment

    @staticmethod
    def match(graph, node, ch):
        return graph.decoder[node.code] == ch


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


def consensus_for_batch(seqs: List[str], engine: ConvexNWEngine) -> str:
    graph = Graph()
    for s in seqs:
        aln = engine.align(s, graph)
        graph.add_alignment(aln, s)
    return graph.generate_consensus()


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
    results = []
    with roi:
        for seqs in batches:
            results.append(consensus_for_batch(seqs, engine))
    for cons in results:
        print(">Consensus_sequence")
        print(cons)
    roi.report()
    return 0


if __name__ == "__main__":
    sys.exit(run(sys.argv[1:]))
