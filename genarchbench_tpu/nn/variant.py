"""nn-variant: Clair3 pileup-model variant calling — TPU-native.

Reference semantics: nn-variant/Clair3 — the pileup network Clair3_P
(clair3/model.py:58-186): input (batch, 33 positions, 18 channels)
-> BiLSTM(128) -> BiLSTM(160) -> flatten -> Dense(128, selu) ->
heads Dense(128, selu) -> Dense(21|3|33|33, selu) -> softmax over
gt21 / genotype / two indel-length tasks; channel order
"A C G T I I1 D D1 * a c g t i i1 d d1 #" (shared/param_p.py:30);
pileup tensor = per-position signed counts from BAM
(preprocess/CreateTensorPileup.py); the benchmark checks the
pileup-stage VCF (scripts/regression_small.sh).

TPU-first design: the model is flax/linen with the LSTM expressed as a
`lax.scan` over (batch, hidden) matmul steps (MXU-shaped); inference
batches candidate positions into one padded (B, 33, 18) tensor; the
pileup tensor generation reuses the scatter-add pileup machinery.
Keras-checkpoint weights convert via `convert_keras_weights` (gate
order i,f,c,o preserved).
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

NO_OF_POSITIONS = 33
FLANKING = 16
CHANNELS = 18
GT21_LABELS = [
    "AA", "AC", "AG", "AT", "CC", "CG", "CT", "GG", "GT", "TT",
    "DelDel", "ADel", "CDel", "GDel", "TDel",
    "InsIns", "AIns", "CIns", "GIns", "TIns", "InsDel"]
GT21_SIZE = 21
GENOTYPE_SIZE = 3


class LSTMCellIFCO(nn.Module):
    """Keras-semantics LSTM cell: gates ordered i, f, c, o; tanh /
    sigmoid activations; bias on the input kernel only."""
    units: int

    @nn.compact
    def __call__(self, carry, x):
        h, c = carry
        u = self.units
        Wk = self.param("kernel", nn.initializers.lecun_normal(),
                        (x.shape[-1], 4 * u))
        Wr = self.param("recurrent", nn.initializers.orthogonal(),
                        (u, 4 * u))
        b = self.param("bias", nn.initializers.zeros, (4 * u,))
        z = x @ Wk + h @ Wr + b
        i = jax.nn.sigmoid(z[..., :u])
        f = jax.nn.sigmoid(z[..., u:2 * u])
        g = jnp.tanh(z[..., 2 * u:3 * u])
        o = jax.nn.sigmoid(z[..., 3 * u:])
        c2 = f * c + i * g
        h2 = o * jnp.tanh(c2)
        return (h2, c2), h2


class BiLSTM(nn.Module):
    units: int

    @nn.compact
    def __call__(self, x):
        B, T, _ = x.shape
        fwd = nn.scan(LSTMCellIFCO, variable_broadcast="params",
                      split_rngs={"params": False}, in_axes=1,
                      out_axes=1)(self.units, name="fwd")
        bwd = nn.scan(LSTMCellIFCO, variable_broadcast="params",
                      split_rngs={"params": False}, in_axes=1,
                      out_axes=1)(self.units, name="bwd")
        z = jnp.zeros((B, self.units), x.dtype)
        _, hf = fwd((z, z), x)
        _, hb = bwd((z, z), x[:, ::-1, :])
        return jnp.concatenate([hf, hb[:, ::-1, :]], axis=-1)


class Clair3P(nn.Module):
    """clair3/model.py Clair3_P (predict mode concatenates the
    softmaxed heads)."""
    add_indel_length: bool = True

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.float32)
        x = BiLSTM(128, name="LSTM1")(x)
        x = BiLSTM(160, name="LSTM2")(x)
        x = x.reshape(x.shape[0], -1)
        x = jax.nn.selu(nn.Dense(128, name="L4")(x))
        h1 = jax.nn.selu(nn.Dense(128, name="L5_1")(x))
        h2 = jax.nn.selu(nn.Dense(128, name="L5_2")(x))
        gt21 = jax.nn.softmax(
            jax.nn.selu(nn.Dense(GT21_SIZE, name="Y_gt21")(h1)))
        geno = jax.nn.softmax(
            jax.nn.selu(nn.Dense(GENOTYPE_SIZE, name="Y_genotype")(h2)))
        outs = [gt21, geno]
        if self.add_indel_length:
            h3 = jax.nn.selu(nn.Dense(128, name="L5_3")(x))
            h4 = jax.nn.selu(nn.Dense(128, name="L5_4")(x))
            outs.append(jax.nn.softmax(jax.nn.selu(
                nn.Dense(NO_OF_POSITIONS, name="Y_len1")(h3))))
            outs.append(jax.nn.softmax(jax.nn.selu(
                nn.Dense(NO_OF_POSITIONS, name="Y_len2")(h4))))
        return jnp.concatenate(outs, axis=1)


def convert_keras_weights(weights: Dict[str, np.ndarray],
                          add_indel_length: bool = True) -> Dict[str, Any]:
    """Map Keras-layer weight arrays onto the flax tree.

    `weights` keys: 'LSTM1/forward/kernel', 'LSTM1/forward/recurrent',
    'LSTM1/forward/bias' (+ 'backward'), same for LSTM2; dense layers
    'L4/kernel', 'L4/bias', 'L5_1/...', 'Y_gt21/...', etc.  Keras LSTM
    kernels are already (in, 4u) with gate order i,f,c,o — identical to
    our cell — so the mapping is a rename."""
    p: Dict[str, Any] = {}

    def lstm(dst, src):
        p[dst] = {
            "fwd": {"kernel": weights[f"{src}/forward/kernel"],
                    "recurrent": weights[f"{src}/forward/recurrent"],
                    "bias": weights[f"{src}/forward/bias"]},
            "bwd": {"kernel": weights[f"{src}/backward/kernel"],
                    "recurrent": weights[f"{src}/backward/recurrent"],
                    "bias": weights[f"{src}/backward/bias"]},
        }

    def dense(dst, src):
        p[dst] = {"kernel": weights[f"{src}/kernel"],
                  "bias": weights[f"{src}/bias"]}

    lstm("LSTM1", "LSTM1")
    lstm("LSTM2", "LSTM2")
    dense("L4", "L4")
    dense("L5_1", "L5_1")
    dense("L5_2", "L5_2")
    dense("Y_gt21", "Y_gt21")
    dense("Y_genotype", "Y_genotype")
    if add_indel_length:
        dense("L5_3", "L5_3")
        dense("L5_4", "L5_4")
        dense("Y_len1", "Y_len1")
        dense("Y_len2", "Y_len2")
    return {"params": jax.tree.map(jnp.asarray, p)}


# ---------------------------------------------------------------------------
# full-alignment model Clair3_F (clair3/model.py:295-440): residual CNN over
# the (depth, 33 positions, 8 channels) full-alignment tensor
# ---------------------------------------------------------------------------

FA_CHANNELS = 8            # shared/param_f.py:21-24
FA_DEPTH_ONT = 89          # matrix_depth_dict['ont'], param_f.py:10
FA_NORMALIZE = 100.0       # NORMALIZE_NUM, param_f.py:34


class BasicConv2D(nn.Module):
    """Conv 3x3 + BatchNorm + ReLU (model.py:189-206).  Inference-mode
    BN (moving statistics), like the reference's predict path."""
    filters: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.filters, (3, 3), strides=self.strides,
                    padding="SAME", name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="bn")(x)
        return jax.nn.relu(x)


class BasicBlock(nn.Module):
    """Residual block (model.py:208-247), stride 1 (identity shortcut,
    the only configuration Clair3_F instantiates)."""
    filters: int

    @nn.compact
    def __call__(self, x):
        r = x
        x = nn.Conv(self.filters, (3, 3), padding="SAME", name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="bn1")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.filters, (3, 3), padding="SAME", name="conv2")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="bn2")(x)
        return jax.nn.relu(r + x)


def _pyramid_pooling(x, pool_sizes=(3, 2, 1)):
    """PyramidPolling (model.py:260-293): SAME max-pool with
    window == stride == ceil(dim / p), flattened and concatenated."""
    B, H, W, C = x.shape
    parts = []
    for p in pool_sizes:
        wh = -(-H // p)
        ww = -(-W // p)
        pooled = nn.max_pool(x, (wh, ww), strides=(wh, ww), padding="SAME")
        parts.append(pooled.reshape(B, -1))
    return jnp.concatenate(parts, axis=-1)


class Clair3F(nn.Module):
    """Full-alignment residual CNN (model.py:295-440, predict mode)."""
    add_indel_length: bool = True

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.float32) / FA_NORMALIZE
        x = BasicConv2D(64, strides=2, name="conv1")(x)
        x = BasicBlock(64, name="res_block1")(x)
        x = BasicConv2D(128, strides=2, name="conv3")(x)
        x = BasicBlock(128, name="res_block2")(x)
        x = BasicConv2D(256, strides=2, name="conv5")(x)
        x = BasicBlock(256, name="res_block3")(x)
        x = _pyramid_pooling(x)
        x = jax.nn.selu(nn.Dense(256, name="L4")(x))   # L4_num_units=256
        h1 = jax.nn.selu(nn.Dense(128, name="L5_1")(x))
        h2 = jax.nn.selu(nn.Dense(128, name="L5_2")(x))
        outs = [
            jax.nn.softmax(jax.nn.selu(nn.Dense(GT21_SIZE,
                                                name="Y_gt21")(h1))),
            jax.nn.softmax(jax.nn.selu(nn.Dense(GENOTYPE_SIZE,
                                                name="Y_genotype")(h2))),
        ]
        if self.add_indel_length:
            h3 = jax.nn.selu(nn.Dense(128, name="L5_3")(x))
            h4 = jax.nn.selu(nn.Dense(128, name="L5_4")(x))
            outs.append(jax.nn.softmax(jax.nn.selu(
                nn.Dense(NO_OF_POSITIONS, name="Y_len1")(h3))))
            outs.append(jax.nn.softmax(jax.nn.selu(
                nn.Dense(NO_OF_POSITIONS, name="Y_len2")(h4))))
        return jnp.concatenate(outs, axis=1)


def convert_keras_weights_full(weights: Dict[str, np.ndarray],
                               add_indel_length: bool = True
                               ) -> Dict[str, Any]:
    """Keras Clair3_F checkpoint arrays -> flax variables.

    Key scheme mirrors the layer names: 'conv1/conv/kernel',
    'conv1/bn/{gamma,beta,moving_mean,moving_variance}',
    'res_block1/conv1/kernel', ..., dense 'L4/kernel' etc.  Keras conv
    kernels are (kh, kw, cin, cout) — flax's native layout."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def conv(dst, src):
        params.setdefault(dst, {})["conv"] = {
            "kernel": weights[f"{src}/conv/kernel"],
            "bias": weights.get(f"{src}/conv/bias",
                                np.zeros(weights[f"{src}/conv/kernel"]
                                         .shape[-1], np.float32))}
        params[dst]["bn"] = {"scale": weights[f"{src}/bn/gamma"],
                             "bias": weights[f"{src}/bn/beta"]}
        batch_stats.setdefault(dst, {})["bn"] = {
            "mean": weights[f"{src}/bn/moving_mean"],
            "var": weights[f"{src}/bn/moving_variance"]}

    def block(dst, src):
        p: Dict[str, Any] = {}
        s: Dict[str, Any] = {}
        for i in (1, 2):
            p[f"conv{i}"] = {
                "kernel": weights[f"{src}/conv{i}/kernel"],
                "bias": weights.get(f"{src}/conv{i}/bias",
                                    np.zeros(weights[f"{src}/conv{i}/kernel"]
                                             .shape[-1], np.float32))}
            p[f"bn{i}"] = {"scale": weights[f"{src}/bn{i}/gamma"],
                           "bias": weights[f"{src}/bn{i}/beta"]}
            s[f"bn{i}"] = {"mean": weights[f"{src}/bn{i}/moving_mean"],
                           "var": weights[f"{src}/bn{i}/moving_variance"]}
        params[dst] = p
        batch_stats[dst] = s

    conv("conv1", "conv1")
    block("res_block1", "res_block1")
    conv("conv3", "conv3")
    block("res_block2", "res_block2")
    conv("conv5", "conv5")
    block("res_block3", "res_block3")
    for name in (["L4", "L5_1", "L5_2", "Y_gt21", "Y_genotype"] +
                 (["L5_3", "L5_4", "Y_len1", "Y_len2"]
                  if add_indel_length else [])):
        params[name] = {"kernel": weights[f"{name}/kernel"],
                        "bias": weights[f"{name}/bias"]}
    return {"params": jax.tree.map(jnp.asarray, params),
            "batch_stats": jax.tree.map(jnp.asarray, batch_stats)}


# ---------------------------------------------------------------------------
# pileup tensor generation — exact CreateTensorPileup.py semantics
# ---------------------------------------------------------------------------

CHANNEL_ORDER = ("A", "C", "G", "T", "I", "I1", "D", "D1", "*",
                 "a", "c", "g", "t", "i", "i1", "d", "d1", "#")

# samtools view filter used by the mpileup stage (shared/param_p.py:39:
# SAMTOOLS_VIEW_FILTER_FLAG = 2316 = UNMAP|MUNMAP|SECONDARY|SUPPLEMENTARY)
CLAIR3_FILTER_FLAGS = 4 | 8 | 256 | 2048
CLAIR3_MIN_MQ = 5        # shared/param_p.py:19


def pileup_tensor_from_bam(records, chrom_id: int, center: int,
                           ref_seq: str) -> np.ndarray:
    """(33, 18) pileup count tensor around `center` (0-based), exact
    generate_tensor channel math (CreateTensorPileup.py:55-135):
    A/C/G/T by strand case, I/i = insertion events per strand,
    I1/i1 = count of the most frequent insertion ALLELE per strand,
    D/d and D1/d1 likewise for deletions, '*'/'#' = deletion bodies
    (mpileup --reverse-del; read filter = mpileup's --min-MQ 5 +
    --excl-flags 2316).  N bases count nowhere (BASE2INDEX has no N);
    insertions do not add to depth."""
    from collections import Counter

    from genarchbench_tpu.kernels.pileup import _read_events
    idx = {c: i for i, c in enumerate(CHANNEL_ORDER)}
    t = np.zeros((NO_OF_POSITIONS, CHANNELS), np.int32)
    lo = center - FLANKING
    hi = center + FLANKING + 1
    # per-column insertion/deletion ALLELE counters, keyed
    # (is_reverse, allele) — their maxima feed I1/i1/D1/d1
    ins_cnt = [Counter() for _ in range(NO_OF_POSITIONS)]
    del_cnt = [Counter() for _ in range(NO_OF_POSITIONS)]
    for r in records:
        if (r.ref_id != chrom_id or (r.flag & CLAIR3_FILTER_FLAGS)
                or r.mapq < CLAIR3_MIN_MQ):
            continue
        if r.pos >= hi or r.pos + r.ref_span() <= lo:
            continue
        pos, is_del, is_skip, qpos, indel = _read_events(r)
        rev = r.is_reverse
        sel = (pos >= max(lo, 0)) & (pos < hi)
        for p, d, sk, q, ind in zip(pos[sel].tolist(),
                                    is_del[sel].tolist(),
                                    is_skip[sel].tolist(),
                                    qpos[sel].tolist(),
                                    indel[sel].tolist()):
            if sk:
                continue
            col = p - lo
            if d:
                t[col, idx["#" if rev else "*"]] += 1
                continue
            b = r.seq[q].upper()
            if b in "ACGT":
                t[col, idx[b.lower() if rev else b]] += 1
            if ind > 0:
                ins_cnt[col][(rev, r.seq[q + 1:q + 1 + ind].upper())] += 1
            elif ind < 0:
                del_cnt[col][(rev, -ind)] += 1
    for col in range(NO_OF_POSITIONS):
        for (rev, _allele), count in ins_cnt[col].items():
            t[col, idx["i" if rev else "I"]] += count
            ch = idx["i1" if rev else "I1"]
            t[col, ch] = max(t[col, ch], count)
        for (rev, _allele), count in del_cnt[col].items():
            t[col, idx["d" if rev else "D"]] += count
            ch = idx["d1" if rev else "D1"]
            t[col, ch] = max(t[col, ch], count)
        # reference-base channels hold the NEGATED total per strand
        # (CreateTensorPileup.py:163-164)
        p = lo + col
        rb = ref_seq[p].upper() if 0 <= p < len(ref_seq) else "N"
        if rb in "ACGT":
            t[col, idx[rb]] = -sum(t[col, idx[c]] for c in "ACGT")
            t[col, idx[rb.lower()]] = -sum(t[col, idx[c]]
                                           for c in "acgt")
    return t


# ---------------------------------------------------------------------------
# SSW read realignment (preprocess/realign: the ctypes realigner's
# SswAlignReadsToHaplotypes step) + full-alignment tensors + het phasing
# ---------------------------------------------------------------------------


def realign_reads(records, ref_seq: str, lo: int, hi: int,
                  chrom_id: int):
    """SSW-realign the reads overlapping [lo, hi) against the reference
    window, adopting the new (position, cigar) when the alignment score
    clears the realigner's threshold (realigner.cpp:76-86:
    match*L*0.16934 - mismatch*L*(1-0.16934); SSW driven as
    realigner.cpp:132-143 with maskLen = max(L/2, 15)).  The reference
    window plays the haplotype role (the realigner always includes the
    reference among its haplotypes); reads below threshold keep their
    original alignment.  Returns a new record list."""
    import copy

    from genarchbench_tpu.nn.ssw import SswAligner

    win_lo = max(lo, 0)
    window = ref_seq[win_lo:hi]
    if not window:
        return records
    aligner = SswAligner(match=4, mismatch=6, gap_open=8, gap_extend=2)
    targets = [r for r in records
               if r.ref_id == chrom_id
               and not (r.flag & CLAIR3_FILTER_FLAGS)
               and r.pos < hi and r.pos + r.ref_span() > win_lo]
    if not targets:
        return records
    results = aligner.align_batch([r.seq for r in targets],
                                  [window] * len(targets))
    out = list(records)
    pos_of = {id(r): i for i, r in enumerate(records)}
    for r, a in zip(targets, results):
        L = len(r.seq)
        thresh = 4 * L * 0.16934 - 6 * L * (1 - 0.16934)
        if thresh < 0:
            thresh = 1
        if a.score1 < thresh or not a.cigar:
            continue
        nr = copy.copy(r)
        nr.pos = win_lo + a.ref_begin1
        cig = []
        if a.read_begin1 > 0:
            cig.append((4, a.read_begin1))            # soft-clip head
        cig += [(("MID".index(op)), n) for n, op in a.cigar]
        tail = L - 1 - a.read_end1
        if tail > 0:
            cig.append((4, tail))                     # soft-clip tail
        nr.cigar = cig
        out[pos_of[id(r)]] = nr
    return out

_BASE_CODE = {"A": 25, "C": 50, "G": 75, "T": 100}


def phase_hets(records, het_positions, het_alts, chrom_id: int):
    """Read-based het-SNP phasing — the role whatshap phase + haplotag
    plays in the pipeline (Clair3/scripts/clair3.sh:173-194).

    Spanning-forest parity phasing (the HapCUT/whatshap graph model):
    every read contributes allele observations (+1 alt / -1 ref) at the
    hets it covers; het pairs co-covered by reads get an agreement
    weight w = sum of allele products; pairs are committed strongest
    first into a parity union-find (s_i * s_j = sign(w)), which is
    exactly a maximum-weight spanning forest of the conflict graph —
    the wMEC heuristic whatshap reduces to at high confidence.  Reads
    are then haplotagged by majority vote against the component phase;
    ambiguous reads (tied vote) stay untagged, like whatshap haplotag.
    Returns {read_name: 1|2}."""
    from genarchbench_tpu.kernels.pileup import FILTER_FLAGS
    pos_list = sorted(set(het_positions))
    pos_alt = dict(zip(het_positions, het_alts))
    pidx = {p: i for i, p in enumerate(pos_list)}
    n = len(pos_list)

    # per read: observed alleles at covered hets
    read_obs: List[Tuple[str, List[Tuple[int, int]]]] = []
    for r in records:
        if r.ref_id != chrom_id or (r.flag & FILTER_FLAGS):
            continue
        obs = []
        for p in pos_list:
            if not (r.pos <= p < r.pos + r.ref_span()):
                continue
            qpos = _qpos_at(r, p)
            if qpos is None:
                continue
            a = 1 if r.seq[qpos].upper() == pos_alt[p] else -1
            obs.append((pidx[p], a))
        if obs:
            read_obs.append((r.qname, obs))

    # pairwise agreement weights from co-covering reads
    w: Dict[Tuple[int, int], int] = {}
    for _, obs in read_obs:
        for k in range(len(obs)):
            i, ai = obs[k]
            for l in range(k + 1, len(obs)):
                j, aj = obs[l]
                key = (i, j) if i < j else (j, i)
                w[key] = w.get(key, 0) + ai * aj

    # maximum-|weight| spanning forest with parity union-find
    parent = list(range(n))
    rel = [1] * n                  # phase of node relative to its parent

    def find(x):
        # iterative two-pass root-then-compress: a long phased het
        # chain (thousands of hets in a 10 Mb region) built O(n)-deep
        # trees under the recursive version and could hit the
        # interpreter recursion limit
        path = []
        while parent[x] != x:
            path.append(x)
            x = parent[x]
        sign = 1
        for y in reversed(path):
            sign *= rel[y]
            parent[y] = x
            rel[y] = sign
        return x, (rel[path[0]] if path else 1)

    for (i, j), wij in sorted(w.items(),
                              key=lambda kv: (-abs(kv[1]), kv[0])):
        if wij == 0:
            continue
        ri, si = find(i)
        rj, sj = find(j)
        if ri == rj:
            continue               # parity fixed already (forest edge)
        # want s_i * s_j = sign(wij):  rel[rj -> ri]
        parent[rj] = ri
        rel[rj] = si * sj * (1 if wij > 0 else -1)

    phase = [find(i)[1] for i in range(n)]

    tags: Dict[str, int] = {}
    for qname, obs in read_obs:
        score = sum(a * phase[i] for i, a in obs)
        if score > 0:
            tags[qname] = 2
        elif score < 0:
            tags[qname] = 1
    return tags


def _qpos_at(r, p: int) -> Optional[int]:
    """Query offset aligned at reference position p (None in deletions)."""
    from genarchbench_tpu.kernels.pileup import _read_events
    pos, is_del, is_skip, qpos, _ = _read_events(r)
    for pp, d, sk, q in zip(pos, is_del, is_skip, qpos):
        if pp == p:
            return None if (d or sk) else q
    return None


# CreateTensorFullAlignment.py:26-31 constants
FA_MAX_BQ, FA_MAX_MQ = 40.0, 60.0
FA_STRAND_0, FA_STRAND_1 = 100, 50
FA_HAP_TYPE = {1: 30, 0: 60, 2: 90}            # hap1 UNKNOWN hap2
FA_ACGT_NUM = dict(zip("ACGT+-*#N",
                       (100, 25, 75, 50, -50, -100, 0, 0, 100)))


def _fa_evc_base(base: str) -> str:
    """evc_base_from (CreateTensorFullAlignment.py:92-103)."""
    if base == "N":
        return "A"
    if base == "n":
        return "a"
    if base in "ACGTacgt":
        return base
    return "A" if base.isupper() else "a"


def full_alignment_tensor(records, chrom_id: int, center: int,
                          ref_seq: str, haplotags: Optional[Dict[str, int]]
                          = None, depth: int = FA_DEPTH_ONT) -> np.ndarray:
    """(rows, 33, 8) full-alignment tensor around `center`, exact
    CreateTensorFullAlignment.py semantics: per-cell channels from
    get_tensor_info (:136-169 — note the CODE's layout is ref, alt,
    strand, mq, bq, af, ins, hap; the param_f.py channel-name tuple
    lists a different order than the indices the code writes),
    insertion bases spread over following columns (:358-361), the
    per-read center-allele frequency and haplotype written onto
    non-deletion columns (:363-381), and rows ordered by
    sorted_by_hap_read_name (:105-134: window first-seen order,
    seed-0 random downsample past matrix_depth, then stable
    (hap, order) sort)."""
    import random as _random
    from genarchbench_tpu.kernels.pileup import _read_events
    lo = center - FLANKING
    hi = center + FLANKING + 1

    # per covering read: per-position (base_str, indel_str, bq) events
    reads_info = []                        # (first_p, qname, events, mq, hap)
    for r in records:
        if r.ref_id != chrom_id or (r.flag & CLAIR3_FILTER_FLAGS) \
                or r.mapq < CLAIR3_MIN_MQ:
            continue
        if r.pos >= hi or r.pos + r.ref_span() <= lo:
            continue
        pos, is_del, is_skip, qpos, indel = _read_events(r)
        rev = r.is_reverse
        ev: Dict[int, tuple] = {}
        first_p = None
        for p, d, sk, q, ind in zip(pos, is_del, is_skip, qpos, indel):
            if p < lo or p >= hi or sk:
                continue
            if first_p is None:
                first_p = int(p)
            if d:
                ev[int(p)] = ("#" if rev else "*", "", 0)
                continue
            b = r.seq[q]
            base = b.lower() if rev else b.upper()
            ind_s = ""
            if ind > 0:
                ins = r.seq[q + 1:q + 1 + ind]
                ind_s = "+" + (ins.lower() if rev else ins.upper())
            elif ind < 0:
                dl = ref_seq[p + 1:p + 1 - ind]
                ind_s = "-" + (dl.lower() if rev else dl.upper())
            ev[int(p)] = (base, ind_s, int(r.qual[q]))
        if first_p is None:
            continue
        hap = haplotags.get(r.qname, 0) if haplotags else 0
        reads_info.append((first_p, r.qname, ev, int(r.mapq), hap))

    # window first-seen order = (first covered position, record order)
    order_idx = sorted(range(len(reads_info)),
                       key=lambda i: (reads_info[i][0], i))
    if len(order_idx) > depth:
        _random.seed(0)
        keep = sorted(_random.sample(range(len(order_idx)), depth))
        order_idx = [order_idx[i] for i in keep]
    rows = sorted(range(len(order_idx)),
                  key=lambda k: (reads_info[order_idx[k]][4], k))

    n_rows = len(rows)
    t = np.zeros((n_rows, NO_OF_POSITIONS, FA_CHANNELS), np.int32)
    if n_rows == 0:
        return t

    # center-position allele counts for the af channel (:335-350)
    alt_dict: Dict[str, int] = {}
    cdepth = 0
    for first_p, qn, ev, mq, hap in reads_info:
        info = ev.get(center)
        if info is None:
            continue
        base, ind_s, bq = info
        cdepth += 1
        if base in "#*":
            continue
        bu = base.upper()
        if ind_s:
            if ind_s[0] == "+":
                alt_dict["+" + bu + ind_s[1:].upper()] = \
                    alt_dict.get("+" + bu + ind_s[1:].upper(), 0) + 1
            else:
                alt_dict[ind_s.upper()] = \
                    alt_dict.get(ind_s.upper(), 0) + 1
        elif bu != ref_seq[center].upper():
            alt_dict[bu] = alt_dict.get(bu, 0) + 1

    for ridx, k in enumerate(rows):
        first_p, qn, ev, mq, hap = reads_info[order_idx[k]]
        mqn = int(100 * min(mq, FA_MAX_MQ) / FA_MAX_MQ)
        for p, (base, ind_s, bq) in ev.items():
            off = p - lo
            if base in "#*":
                continue                    # all-zero cell
            bu = base.upper()
            alt = 0
            if ind_s:
                alt = FA_ACGT_NUM[ind_s[0]]
            elif bu != ref_seq[p].upper() and bu in "ACGT":
                alt = FA_ACGT_NUM[_fa_evc_base(bu).upper()]
            strand = FA_STRAND_0 if base in "ACGT" else FA_STRAND_1
            t[ridx, off, 0] = FA_ACGT_NUM[ref_seq[p].upper()]
            t[ridx, off, 1] = alt
            t[ridx, off, 2] = strand
            t[ridx, off, 3] = mqn
            t[ridx, off, 4] = int(100 * min(bq, FA_MAX_BQ) / FA_MAX_BQ)
            # insertion bases spread over following columns (:358-361)
            if ind_s and ind_s[0] == "+" and p < hi - 1:
                ins = ind_s[1:].upper()
                for ii in range(min(len(ins), NO_OF_POSITIONS - off)):
                    t[ridx, off + ii, 6] = FA_ACGT_NUM[ins[ii]]
        # af + hap on non-deletion columns (:363-381)
        af_num = 0
        info = ev.get(center)
        if info is not None:
            base, ind_s, bq = info
            bu = base.upper()
            key = None
            if ind_s:
                key = ("+" + bu + ind_s[1:].upper()) if ind_s[0] == "+" \
                    else ind_s.upper()
            elif bu in alt_dict:
                key = bu
            if key is not None and key in alt_dict:
                af_num = alt_dict[key] / max(1.0, float(cdepth))
        if af_num != 0:
            af_num = int(100 * min(af_num, 1.0))
        hap_t = FA_HAP_TYPE[hap]
        nz = t[ridx, :, 2] != 0
        t[ridx, nz, 5] = af_num
        t[ridx, nz, 7] = hap_t
    return t


@dataclasses.dataclass
class FullAlignmentCaller:
    """Clair3_F inference wrapper (the stage-6 caller,
    clair3.sh:224-240)."""
    variables: Dict[str, Any]
    add_indel_length: bool = True

    def __post_init__(self):
        self.model = Clair3F(add_indel_length=self.add_indel_length)
        self._fwd = jax.jit(lambda v, x: self.model.apply(v, x))

    @classmethod
    def init(cls, seed: int = 0, add_indel_length: bool = True,
             depth: int = FA_DEPTH_ONT):
        model = Clair3F(add_indel_length=add_indel_length)
        x = jnp.zeros((1, depth, NO_OF_POSITIONS, FA_CHANNELS))
        return cls(model.init(jax.random.PRNGKey(seed), x),
                   add_indel_length)

    def predict(self, tensors: np.ndarray) -> np.ndarray:
        return np.asarray(self._fwd(self.variables, jnp.asarray(tensors)))


def merge_vcf_rows(pileup_rows: List[str], fa_rows: List[str],
                   examined_pos: Optional[set] = None) -> List[str]:
    """MergeVcf semantics (clair3.sh:267-280): at every position the
    full-alignment stage examined, its decision wins (including "no
    variant": an examined position with no FA row drops the pileup
    call); other pileup calls pass through.  Rows stay sorted."""
    examined = set(examined_pos or ()) | {
        int(r.split("\t")[1]) for r in fa_rows}
    merged = [r for r in pileup_rows
              if int(r.split("\t")[1]) not in examined] + fa_rows
    return sorted(merged, key=lambda r: (r.split("\t")[0],
                                         int(r.split("\t")[1])))


# ---------------------------------------------------------------------------
# variant calling output
# ---------------------------------------------------------------------------

def gt21_to_alleles(label: str, ref_base: str) -> Tuple[str, str, str]:
    """gt21 label -> (ref, alt, genotype-string)."""
    if label in ("AA", "CC", "GG", "TT"):
        b = label[0]
        if b == ref_base:
            return ref_base, ".", "0/0"
        return ref_base, b, "1/1"
    if len(label) == 2 and label[0] in "ACGT" and label[1] in "ACGT":
        a, b = label[0], label[1]
        if ref_base == a:
            return ref_base, b, "0/1"
        if ref_base == b:
            return ref_base, a, "0/1"
        return ref_base, f"{a},{b}", "1/2"
    return ref_base, ".", "./."        # indel classes need realignment


@dataclasses.dataclass
class PileupCaller:
    variables: Dict[str, Any]
    add_indel_length: bool = True

    def __post_init__(self):
        self.model = Clair3P(add_indel_length=self.add_indel_length)
        self._fwd = jax.jit(lambda v, x: self.model.apply(v, x))

    @classmethod
    def init(cls, seed: int = 0, add_indel_length: bool = True):
        model = Clair3P(add_indel_length=add_indel_length)
        x = jnp.zeros((1, NO_OF_POSITIONS, CHANNELS))
        return cls(model.init(jax.random.PRNGKey(seed), x),
                   add_indel_length)

    def predict(self, tensors: np.ndarray) -> np.ndarray:
        return np.asarray(self._fwd(self.variables, jnp.asarray(tensors)))

    def call_variants(self, tensors, positions, ref_bases, chrom,
                      qual_cutoff=0.0):
        """VCF rows for candidate positions (CallVariants.py pileup
        output shape: CHROM POS ID REF ALT QUAL FILTER INFO FORMAT)."""
        return rows_from_probs(self.predict(tensors), positions,
                               ref_bases, chrom, qual_cutoff)


def rows_from_probs(probs, positions, ref_bases, chrom,
                    qual_cutoff=0.0) -> List[str]:
    """gt21/genotype head probabilities -> VCF rows (shared by the
    pileup and full-alignment callers)."""
    rows = []
    for k, pos in enumerate(positions):
        gt21 = probs[k, :GT21_SIZE]
        geno = probs[k, GT21_SIZE:GT21_SIZE + GENOTYPE_SIZE]
        gi = int(np.argmax(gt21))
        label = GT21_LABELS[gi]
        ref, alt, gt = gt21_to_alleles(label, ref_bases[k])
        if alt == ".":
            continue
        qual = float(gt21[gi]) * float(np.max(geno))
        if qual < qual_cutoff:
            continue
        q10 = min(99.0, -10.0 * np.log10(max(1e-10, 1 - qual)))
        rows.append(f"{chrom}\t{pos + 1}\t.\t{ref}\t{alt}\t"
                    f"{q10:.2f}\tPASS\t.\tGT\t{gt}")
    return rows


def run(argv: Sequence[str]) -> int:
    """Pileup-stage variant calling: --bam --ref --region --output
    [--model weights.npz]."""
    import argparse
    from genarchbench_tpu.io.bam_io import parse_region, read_bam
    p = argparse.ArgumentParser(prog="nn-variant")
    p.add_argument("--bam", required=True)
    p.add_argument("--ref", required=True)
    p.add_argument("--region", required=True)
    p.add_argument("--output", default=None)
    p.add_argument("--model", default=None)
    p.add_argument("--min_af", type=float, default=0.25)
    p.add_argument("--full-alignment", dest="full_alignment",
                   action="store_true",
                   help="run the Clair3_F full-alignment stage on "
                        "low-quality pileup calls (clair3.sh:211-240)")
    p.add_argument("--fa-model", dest="fa_model", default=None)
    p.add_argument("--fa-qual", dest="fa_qual", type=float, default=30.0,
                   help="pileup QUAL below which a call is re-examined "
                        "by the full-alignment model")
    p.add_argument("--realign", action="store_true",
                   help="SSW-realign reads around re-examined sites "
                        "before building full-alignment tensors (the "
                        "realign/ ctypes stage, ilmn platform)")
    args = p.parse_args(argv)

    chrom, beg, end = parse_region(args.region)
    refs, records = read_bam(args.bam)
    names = [n for n, _ in refs]
    cid = names.index(chrom)
    if beg is None:
        beg, end = 0, refs[cid][1]

    ref_seq = ""
    with open(args.ref) as f:
        cur, take = [], False
        for line in f:
            line = line.rstrip()
            if line.startswith(">"):
                take = line[1:].split()[0] == chrom
            elif take:
                cur.append(line)
        ref_seq = "".join(cur)

    if args.model:
        z = np.load(args.model)
        caller = PileupCaller(convert_keras_weights(dict(z)))
    else:
        caller = PileupCaller.init()

    # candidate selection: positions whose non-ref support >= min_af
    from genarchbench_tpu.kernels.pileup import calculate_pileup
    majors, minors, mat, _ = calculate_pileup(records, cid, beg, end)
    cands = []
    base_cols = {b: i for i, b in enumerate("acgtACGT")}
    for i in range(len(majors)):
        if minors[i] != 0:
            continue
        pos = int(majors[i])
        ref_b = ref_seq[pos].upper() if pos < len(ref_seq) else "N"
        row = mat[i].reshape(-1, 10).sum(axis=0)
        depth = row.sum()
        if depth == 0 or ref_b not in "ACGT":
            continue
        ref_cnt = row[base_cols[ref_b]] + row[base_cols[ref_b.lower()]]
        if depth - ref_cnt >= max(2, args.min_af * depth):
            cands.append((pos, ref_b))

    roi_lines: List[str] = []
    if cands:
        tensors = np.stack([
            pileup_tensor_from_bam(records, cid, pos, ref_seq)
            for pos, _ in cands])
        roi_lines = caller.call_variants(
            tensors, [p_ for p_, _ in cands],
            [b for _, b in cands], chrom)

    if args.full_alignment and roi_lines:
        # stages 2-4 (phase hets) + 5 (select low-qual) + 6 (Clair3_F)
        # + 7 (merge), clair3.sh:173-280
        hets = [(int(r.split("\t")[1]) - 1, r.split("\t")[4])
                for r in roi_lines
                if r.split("\t")[9] == "0/1" and len(r.split("\t")[4]) == 1]
        tags = phase_hets(records, [h[0] for h in hets],
                          [h[1] for h in hets], cid) if hets else {}
        sel = [r for r in roi_lines
               if float(r.split("\t")[5]) < args.fa_qual]
        if sel:
            if args.fa_model:
                z = np.load(args.fa_model)
                fa_caller = FullAlignmentCaller(
                    convert_keras_weights_full(dict(z)))
            else:
                fa_caller = FullAlignmentCaller.init()
            sel_pos = [int(r.split("\t")[1]) - 1 for r in sel]
            fa_records = records
            if args.realign and sel_pos:
                fa_records = realign_reads(
                    records, ref_seq, min(sel_pos) - 2 * FLANKING,
                    max(sel_pos) + 2 * FLANKING + 1, cid)
            fa_tensors = np.stack([
                full_alignment_tensor(fa_records, cid, pos, ref_seq,
                                      tags)
                for pos in sel_pos])
            fa_rows = rows_from_probs(
                fa_caller.predict(fa_tensors), sel_pos,
                [ref_seq[p_].upper() for p_ in sel_pos], chrom)
            roi_lines = merge_vcf_rows(
                roi_lines, fa_rows,
                examined_pos={p_ + 1 for p_ in sel_pos})
            print(f"[INFO] full-alignment re-called {len(sel)} sites "
                  f"({len(tags)} reads haplotagged)", file=sys.stderr)

    out = open(args.output, "w") if args.output else sys.stdout
    out.write("##fileformat=VCFv4.2\n")
    out.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
              "SAMPLE\n")
    for row in roi_lines:
        out.write(row + "\n")
    if args.output:
        out.close()
    print(f"[INFO] VariantCalling executed: {len(roi_lines)} variants "
          f"from {len(cands)} candidates", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(run(sys.argv[1:]))
