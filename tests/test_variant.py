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
