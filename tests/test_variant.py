"""nn-variant: Clair3P model semantics (BiLSTM parity vs torch),
weight conversion, and the pileup-caller pipeline end-to-end on a
synthetic BAM with a known SNP."""

import numpy as np
import pytest

from genarchbench_tpu.nn import variant as var


def test_model_shapes():
    caller = var.PileupCaller.init()
    x = np.random.default_rng(0).normal(
        size=(3, var.NO_OF_POSITIONS, var.CHANNELS)).astype(np.float32)
    out = caller.predict(x)
    assert out.shape == (3, 21 + 3 + 33 + 33)
    np.testing.assert_allclose(out[:, :21].sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(out[:, 21:24].sum(-1), 1.0, rtol=1e-5)


def test_bilstm_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    B, T, F, U = 2, 9, 6, 5
    x = rng.normal(size=(B, T, F)).astype(np.float32)

    tl = torch.nn.LSTM(F, U, batch_first=True, bidirectional=True)
    with torch.no_grad():
        out_t, _ = tl(torch.from_numpy(x))
    out_t = out_t.numpy()

    # torch gate order i,f,g,o == keras i,f,c,o; torch weights are
    # (4u, in) transposed; bias = b_ih + b_hh
    sd = {k: v.detach().numpy() for k, v in tl.state_dict().items()}
    params = {"params": {
        "fwd": {"kernel": sd["weight_ih_l0"].T,
                "recurrent": sd["weight_hh_l0"].T,
                "bias": sd["bias_ih_l0"] + sd["bias_hh_l0"]},
        "bwd": {"kernel": sd["weight_ih_l0_reverse"].T,
                "recurrent": sd["weight_hh_l0_reverse"].T,
                "bias": sd["bias_ih_l0_reverse"] + sd["bias_hh_l0_reverse"]},
    }}
    import jax.numpy as jnp
    model = var.BiLSTM(U)
    ours = np.asarray(model.apply(
        {"params": {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
                    for k, v in params["params"].items()}},
        jnp.asarray(x)))
    np.testing.assert_allclose(ours, out_t, atol=1e-5)


def test_keras_weight_conversion_roundtrip():
    rng = np.random.default_rng(2)
    w = {}
    for name, u, fin in [("LSTM1", 128, var.CHANNELS),
                         ("LSTM2", 160, 256)]:
        for d in ("forward", "backward"):
            w[f"{name}/{d}/kernel"] = rng.normal(
                size=(fin, 4 * u)).astype(np.float32) * 0.05
            w[f"{name}/{d}/recurrent"] = rng.normal(
                size=(u, 4 * u)).astype(np.float32) * 0.05
            w[f"{name}/{d}/bias"] = np.zeros(4 * u, np.float32)
    for name, fin, fout in [("L4", 320 * 33, 128), ("L5_1", 128, 128),
                            ("L5_2", 128, 128), ("L5_3", 128, 128),
                            ("L5_4", 128, 128), ("Y_gt21", 128, 21),
                            ("Y_genotype", 128, 3), ("Y_len1", 128, 33),
                            ("Y_len2", 128, 33)]:
        w[f"{name}/kernel"] = rng.normal(
            size=(fin, fout)).astype(np.float32) * 0.05
        w[f"{name}/bias"] = np.zeros(fout, np.float32)
    variables = var.convert_keras_weights(w)
    caller = var.PileupCaller(variables)
    out = caller.predict(np.zeros((1, 33, 18), np.float32))
    assert out.shape == (1, 90)
    assert np.isfinite(out).all()


def test_gt21_allele_mapping():
    assert var.gt21_to_alleles("AA", "A") == ("A", ".", "0/0")
    assert var.gt21_to_alleles("CC", "A") == ("A", "C", "1/1")
    assert var.gt21_to_alleles("AC", "A") == ("A", "C", "0/1")
    assert var.gt21_to_alleles("CG", "A") == ("A", "C,G", "1/2")


def test_pipeline_on_synthetic_snp(tmp_path):
    from genarchbench_tpu.io import bam_io
    rng = np.random.default_rng(3)
    ref_len = 400
    ref = "".join("ACGT"[c] for c in rng.integers(0, 4, ref_len))
    fa = tmp_path / "ref.fa"
    fa.write_text(f">c1\n{ref}\n")
    # reads: all carry an alt base at position 200
    alt = "A" if ref[200] != "A" else "G"
    records = []
    for i in range(30):
        pos = int(rng.integers(120, 180))
        ln = 150
        s = list(ref[pos:pos + ln])
        s[200 - pos] = alt
        records.append(bam_io.BamRecord(
            f"r{i}", 0 if i % 2 else 16, 0, pos, 40, [(0, ln)],
            "".join(s), rng.integers(20, 40, ln).astype(np.uint8)))
    records.sort(key=lambda r: r.pos)
    bam = tmp_path / "x.bam"
    bam_io.write_bam(str(bam), [("c1", ref_len)], records)

    out = tmp_path / "out.vcf"
    var.run(["--bam", str(bam), "--ref", str(fa),
             "--region", "c1:1-400", "--output", str(out)])
    text = out.read_text()
    assert text.startswith("##fileformat=VCF")
    # candidate selection found the SNP position; with random weights
    # the genotype is arbitrary, but the tensor row exists
    tensor = var.pileup_tensor_from_bam(records, 0, 200, ref)
    ch = dict(zip(var.CHANNEL_ORDER, range(18)))
    alt_count = tensor[var.FLANKING, ch[alt]] + \
        tensor[var.FLANKING, ch[alt.lower()]]
    assert alt_count == sum(1 for r in records
                            if r.pos <= 200 < r.pos + 150)


# ---------------------------------------------------------------------------
# Clair3_F full-alignment stage
# ---------------------------------------------------------------------------

def test_clair3f_shapes_and_softmax():
    caller = var.FullAlignmentCaller.init()
    x = np.random.default_rng(4).integers(
        0, 100, size=(2, var.FA_DEPTH_ONT, var.NO_OF_POSITIONS,
                      var.FA_CHANNELS)).astype(np.float32)
    out = caller.predict(x)
    assert out.shape == (2, 21 + 3 + 33 + 33)
    np.testing.assert_allclose(out[:, :21].sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(out[:, 21:24].sum(-1), 1.0, rtol=1e-5)


def test_basic_conv2d_matches_torch_same_stride2():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    B, H, W, Cin, Cout = 2, 9, 7, 3, 4
    x = rng.normal(size=(B, H, W, Cin)).astype(np.float32)
    k = rng.normal(size=(3, 3, Cin, Cout)).astype(np.float32) * 0.2
    gamma = rng.normal(size=Cout).astype(np.float32)
    beta = rng.normal(size=Cout).astype(np.float32)
    mean = rng.normal(size=Cout).astype(np.float32) * 0.1
    varr = rng.uniform(0.5, 2.0, size=Cout).astype(np.float32)

    # torch: TF-SAME for stride 2 pads (pad_beg, pad_end) per dim with
    # pad_total = max((ceil(d/2)-1)*2 + 3 - d, 0), beg = total // 2
    def same_pad(d):
        out = -(-d // 2)
        total = max((out - 1) * 2 + 3 - d, 0)
        return total // 2, total - total // 2

    ph = same_pad(H)
    pw = same_pad(W)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    xt = F.pad(xt, (pw[0], pw[1], ph[0], ph[1]))
    with torch.no_grad():
        yt = F.conv2d(xt, torch.from_numpy(k.transpose(3, 2, 0, 1)),
                      stride=2)
        yt = F.batch_norm(yt, torch.from_numpy(mean),
                          torch.from_numpy(varr),
                          torch.from_numpy(gamma), torch.from_numpy(beta),
                          training=False, eps=1e-3)
        yt = F.relu(yt).numpy().transpose(0, 2, 3, 1)

    m = var.BasicConv2D(Cout, strides=2)
    variables = {
        "params": {"conv": {"kernel": jnp.asarray(k),
                            "bias": jnp.zeros(Cout)},
                   "bn": {"scale": jnp.asarray(gamma),
                          "bias": jnp.asarray(beta)}},
        "batch_stats": {"bn": {"mean": jnp.asarray(mean),
                               "var": jnp.asarray(varr)}}}
    ours = np.asarray(m.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, yt, atol=1e-5)


def test_clair3f_weight_conversion_roundtrip():
    rng = np.random.default_rng(6)
    w = {}

    def conv(name, cin, cout):
        w[f"{name}/conv/kernel"] = rng.normal(
            size=(3, 3, cin, cout)).astype(np.float32) * 0.05
        w[f"{name}/conv/bias"] = np.zeros(cout, np.float32)
        w[f"{name}/bn/gamma"] = np.ones(cout, np.float32)
        w[f"{name}/bn/beta"] = np.zeros(cout, np.float32)
        w[f"{name}/bn/moving_mean"] = np.zeros(cout, np.float32)
        w[f"{name}/bn/moving_variance"] = np.ones(cout, np.float32)

    def block(name, c):
        for i in (1, 2):
            w[f"{name}/conv{i}/kernel"] = rng.normal(
                size=(3, 3, c, c)).astype(np.float32) * 0.05
            w[f"{name}/conv{i}/bias"] = np.zeros(c, np.float32)
            w[f"{name}/bn{i}/gamma"] = np.ones(c, np.float32)
            w[f"{name}/bn{i}/beta"] = np.zeros(c, np.float32)
            w[f"{name}/bn{i}/moving_mean"] = np.zeros(c, np.float32)
            w[f"{name}/bn{i}/moving_variance"] = np.ones(c, np.float32)

    conv("conv1", var.FA_CHANNELS, 64)
    block("res_block1", 64)
    conv("conv3", 64, 128)
    block("res_block2", 128)
    conv("conv5", 128, 256)
    block("res_block3", 256)
    # pyramid pooling over (89,33)->(45,17)->(23,9)->(12,5): (9+4+1)*256
    for name, fin, fout in [("L4", 14 * 256, 256), ("L5_1", 256, 128),
                            ("L5_2", 256, 128), ("L5_3", 256, 128),
                            ("L5_4", 256, 128), ("Y_gt21", 128, 21),
                            ("Y_genotype", 128, 3), ("Y_len1", 128, 33),
                            ("Y_len2", 128, 33)]:
        w[f"{name}/kernel"] = rng.normal(
            size=(fin, fout)).astype(np.float32) * 0.05
        w[f"{name}/bias"] = np.zeros(fout, np.float32)
    caller = var.FullAlignmentCaller(var.convert_keras_weights_full(w))
    out = caller.predict(np.zeros(
        (1, var.FA_DEPTH_ONT, 33, var.FA_CHANNELS), np.float32))
    assert out.shape == (1, 90) and np.isfinite(out).all()


def _two_hap_records(rng, ref, het_sites):
    """Reads from two haplotypes differing at het_sites (pos -> alt)."""
    from genarchbench_tpu.io import bam_io
    records = []
    for i in range(40):
        hap = i % 2
        pos = int(rng.integers(0, 100))
        ln = 200
        s = list(ref[pos:pos + ln])
        if hap:
            for p, alt in het_sites.items():
                if pos <= p < pos + ln:
                    s[p - pos] = alt
        records.append(bam_io.BamRecord(
            f"r{i}", 0, 0, pos, 40, [(0, ln)], "".join(s),
            np.full(ln, 30, np.uint8)))
    records.sort(key=lambda r: r.pos)
    return records


def test_phase_hets_two_haplotypes():
    rng = np.random.default_rng(7)
    ref = "".join("ACGT"[c] for c in rng.integers(0, 4, 400))
    sites = {}
    for p in (150, 180, 220):
        sites[p] = "A" if ref[p] != "A" else "C"
    records = _two_hap_records(rng, ref, sites)
    tags = var.phase_hets(records, sorted(sites), [sites[p] for p in
                                                   sorted(sites)], 0)
    # every read spanning a het got a tag, and tags split by haplotype
    by_hap = {1: set(), 2: set()}
    for r in records:
        if r.qname in tags:
            by_hap[tags[r.qname]].add(int(r.qname[1:]) % 2)
    assert len(by_hap[1]) == 1 and len(by_hap[2]) == 1
    assert by_hap[1] != by_hap[2]


def test_full_alignment_tensor_channels():
    rng = np.random.default_rng(8)
    ref = "".join("ACGT"[c] for c in rng.integers(0, 4, 400))
    alt = "A" if ref[200] != "A" else "G"
    records = _two_hap_records(rng, ref, {200: alt})
    t = var.full_alignment_tensor(records, 0, 200, ref)
    used = t.shape[0]
    # ref-base channel (CreateTensorFullAlignment ACGT_NUM scale) on
    # every row at the center column
    center = var.FLANKING
    assert (t[:used, center, 0] == var.FA_ACGT_NUM[ref[200]]).all()
    # half the rows carry the alt in channel 1 (alternative base)
    n_alt = int((t[:used, center, 1] == var.FA_ACGT_NUM[alt]).sum())
    assert 0 < n_alt < used
    # strand channel (index 2 in the code's layout) is 50/100
    assert set(np.unique(t[:used, center, 2])) <= {50, 100}
    assert len(np.unique(t[:used, center, 2])) >= 1


def test_merge_vcf_rows_examined_wins():
    pile = ["c1\t10\t.\tA\tC\t20.00\tPASS\t.\tGT\t0/1",
            "c1\t50\t.\tG\tT\t40.00\tPASS\t.\tGT\t1/1"]
    fa = ["c1\t10\t.\tA\tC\t35.00\tPASS\t.\tGT\t1/1"]
    merged = var.merge_vcf_rows(pile, fa, examined_pos={10, 50})
    # pos 10 replaced by FA row; pos 50 examined with no FA row -> dropped
    assert merged == fa


def test_pipeline_full_alignment_end_to_end(tmp_path):
    from genarchbench_tpu.io import bam_io
    rng = np.random.default_rng(9)
    ref_len = 400
    ref = "".join("ACGT"[c] for c in rng.integers(0, 4, ref_len))
    fa_path = tmp_path / "ref.fa"
    fa_path.write_text(f">c1\n{ref}\n")
    alt = "A" if ref[200] != "A" else "G"
    records = _two_hap_records(rng, ref, {200: alt})
    bam = tmp_path / "x.bam"
    bam_io.write_bam(str(bam), [("c1", ref_len)], records)
    out = tmp_path / "out.vcf"
    rc = var.run(["--bam", str(bam), "--ref", str(fa_path),
                  "--region", "c1:1-400", "--output", str(out),
                  "--full-alignment", "--fa-qual", "100"])
    assert rc == 0
    assert out.read_text().startswith("##fileformat=VCF")


# ---------------------------------------------------------------------------
# exact pileup-tensor parity vs the reference's own generate_tensor
# ---------------------------------------------------------------------------

def _load_clair3_generate_tensor():
    import importlib
    import sys as _sys
    clair3 = "/root/reference/benchmarks/nn-variant/Clair3"
    if clair3 not in _sys.path:
        _sys.path.insert(0, clair3)
    try:
        mod = importlib.import_module("preprocess.CreateTensorPileup")
    except Exception as e:                      # missing cffi etc.
        pytest.skip(f"cannot import Clair3 oracle: {e}")
    return mod.generate_tensor


def _mpileup_string(records, p, ref):
    """samtools-mpileup-style base string for position p (--reverse-del:
    '*' forward / '#' reverse deletion bodies; inserted and deleted
    bases in the strand's case)."""
    from genarchbench_tpu.kernels.pileup import _read_events
    from genarchbench_tpu.nn.variant import (CLAIR3_FILTER_FLAGS,
                                             CLAIR3_MIN_MQ)
    out = []
    for r in records:
        if (r.flag & CLAIR3_FILTER_FLAGS) or r.mapq < CLAIR3_MIN_MQ:
            continue
        if not (r.pos <= p < r.pos + r.ref_span()):
            continue
        pos, is_del, is_skip, qpos, indel = _read_events(r)
        at = np.flatnonzero(pos == p)
        if not len(at):
            continue
        i = int(at[0])
        if is_skip[i]:
            continue
        rev = r.is_reverse
        if p == r.pos:
            out.append("^~")
        if is_del[i]:
            out.append("#" if rev else "*")
        else:
            q = int(qpos[i])
            b = r.seq[q]
            out.append(b.lower() if rev else b.upper())
            ind = int(indel[i])
            if ind > 0:
                ins = r.seq[q + 1:q + 1 + ind]
                out.append(f"+{ind}" + (ins.lower() if rev
                                        else ins.upper()))
            elif ind < 0:
                dl = ref[p + 1:p + 1 - ind]
                out.append(f"{ind}" + (dl.lower() if rev
                                       else dl.upper()))
        if p == r.pos + r.ref_span() - 1:
            out.append("$")
    return "".join(out)


def test_pileup_tensor_matches_clair3_generate_tensor():
    gen = _load_clair3_generate_tensor()
    from genarchbench_tpu.io import bam_io
    rng = np.random.default_rng(11)
    ref = "".join("ACGT"[c] for c in rng.integers(0, 4, 300))
    records = []
    for i in range(40):
        pos = int(rng.integers(60, 120))
        ln = int(rng.integers(80, 120))
        s = list(ref[pos:pos + ln])
        cig = [(0, ln)]
        kind = i % 4
        if kind == 1:                        # SNP at center-ish
            s[150 - pos] = "A" if ref[150] != "A" else "G"
        elif kind == 2 and 150 - pos > 5:    # insertion after 150
            at = 150 - pos
            cig = [(0, at + 1), (1, 2 + i % 2), (0, ln - at - 1)]
            s = s[:at + 1] + ["T", "T", "G"][:2 + i % 2] + s[at + 1:]
        elif kind == 3 and 150 - pos > 5:    # deletion after 150
            at = 150 - pos
            dl = 1 + i % 3
            cig = [(0, at + 1), (2, dl), (0, ln - at - 1 - dl)]
            s = s[:at + 1] + s[at + 1 + dl:]
        seq = "".join(s)
        records.append(bam_io.BamRecord(
            f"r{i}", 0 if i % 2 else 16, 0, pos, 30 + i % 30, cig,
            seq, np.full(len(seq), 30, np.uint8)))
    records.sort(key=lambda r: r.pos)

    from genarchbench_tpu.nn import variant as var_mod
    t = var_mod.pileup_tensor_from_bam(records, 0, 150, ref)
    for col in range(var_mod.NO_OF_POSITIONS):
        p = 150 - var_mod.FLANKING + col
        s = _mpileup_string(records, p, ref)
        want, *_ = gen(p, s, ref, 0, ref[p], 0.08, 0.08, 0.15,
                       "ont", False, False)
        assert list(t[col]) == list(want), (col, p, s, list(t[col]), want)


def _load_clair3_fa_module():
    import importlib
    import sys as _sys
    clair3 = "/root/reference/benchmarks/nn-variant/Clair3"
    if clair3 not in _sys.path:
        _sys.path.insert(0, clair3)
    try:
        mod = importlib.import_module(
            "preprocess.CreateTensorFullAlignment")
    except Exception as e:
        pytest.skip(f"cannot import Clair3 FA oracle: {e}")
    return mod


def test_full_alignment_tensor_matches_clair3():
    """Drive Clair3's own generate_tensor (CreateTensorFullAlignment
    .py:306-430) with Position objects built from the same reads and
    compare the whole (depth, 33, 8) tensor cell for cell."""
    fa = _load_clair3_fa_module()
    from genarchbench_tpu.io import bam_io
    from genarchbench_tpu.kernels.pileup import _read_events
    from genarchbench_tpu.nn import variant as var_mod

    rng = np.random.default_rng(23)
    ref = "".join("ACGT"[c] for c in rng.integers(0, 4, 400))
    center = 200
    records = []
    for i in range(120):                    # > matrix_depth: downsample
        pos = int(rng.integers(140, 196))
        ln = int(rng.integers(40, 80))
        s = list(ref[pos:pos + ln])
        cig = [(0, ln)]
        kind = i % 5
        at = center - pos
        if kind == 1 and 0 <= at < ln:
            s[at] = "A" if ref[center] != "A" else "G"
        elif kind == 2 and 3 <= at < ln - 4:
            nins = 1 + i % 3
            cig = [(0, at + 1), (1, nins), (0, ln - at - 1)]
            s = s[:at + 1] + list("TGA"[:nins]) + s[at + 1:]
        elif kind == 3 and 3 <= at < ln - 5:
            dl = 1 + i % 2
            cig = [(0, at + 1), (2, dl), (0, ln - at - 1 - dl)]
            s = s[:at + 1] + s[at + 1 + dl:]
        seq = "".join(s)
        qual = rng.integers(10, 50, len(seq)).astype(np.uint8)
        records.append(bam_io.BamRecord(
            f"r{i:03d}", 0 if i % 3 else 16, 0, pos, 5 + i % 55, cig,
            seq, qual))
    records.sort(key=lambda r: r.pos)
    haplotags = {f"r{i:03d}": (i % 3) for i in range(120)}  # 0/1/2 mix

    # ---- build the oracle's pileup_dict from the same reads ----
    lo, hi = center - var_mod.FLANKING, center + var_mod.FLANKING + 1
    per_pos = {}
    for r in records:
        if (r.flag & var_mod.CLAIR3_FILTER_FLAGS) \
                or r.mapq < var_mod.CLAIR3_MIN_MQ:
            continue
        pos, is_del, is_skip, qpos, indel = _read_events(r)
        rev = r.is_reverse
        for p, d, sk, q, ind in zip(pos, is_del, is_skip, qpos, indel):
            if p < lo or p >= hi or sk:
                continue
            if d:
                base, ind_s, bq = ("#" if rev else "*"), "", 0
            else:
                b = r.seq[q]
                base = b.lower() if rev else b.upper()
                ind_s = ""
                if ind > 0:
                    ins = r.seq[q + 1:q + 1 + ind]
                    ind_s = "+" + (ins.lower() if rev else ins.upper())
                elif ind < 0:
                    dl = ref[p + 1:p + 1 - ind]
                    ind_s = "-" + (dl.lower() if rev else dl.upper())
                bq = int(r.qual[q])
            e = per_pos.setdefault(int(p), ([], [], [], []))
            e[0].append(r.qname)
            e[1].append((base, ind_s))
            e[2].append(chr(bq + 33))
            e[3].append(chr(int(r.mapq) + 33))
    pileup_dict = {}
    for p, (names, bases, bqs, mqs) in per_pos.items():
        pileup_dict[p] = fa.Position(
            pos=p, ref_base=ref[p], read_name_list=names,
            base_list=bases, raw_base_quality=bqs,
            raw_mapping_quality=mqs)
    hap_dict = {q: 0 for q in haplotags}
    srnl = fa.sorted_by_hap_read_name(
        center, haplotags, pileup_dict, hap_dict, "ont")
    out, alt_info = fa.generate_tensor(
        "c", center, srnl, pileup_dict, ref[lo:hi], ref, 0, "ont",
        {}, False)
    assert out is not None
    fields = out.split("\t")
    flat = np.array([int(x) for x in fields[3].split()], np.int32)
    want = flat.reshape(len(srnl), var_mod.NO_OF_POSITIONS,
                        var_mod.FA_CHANNELS)

    got = var_mod.full_alignment_tensor(records, 0, center, ref,
                                        haplotags=haplotags)
    assert got.shape == want.shape, (got.shape, want.shape)
    mism = np.nonzero(got != want)
    assert got.shape == want.shape and not len(mism[0]), \
        (mism[0][:5], mism[1][:5], mism[2][:5],
         got[mism][:10], want[mism][:10])
