"""nn-base basecaller: shapes, torch-checkpoint parity, CTC decoding,
chunk/stitch semantics (reference: nn-base/bonito/basecall.py)."""

import itertools

import numpy as np
import pytest

from genarchbench_tpu.nn import basecall as bc

TINY = {
    "input": {"features": 1},
    "encoder": {"activation": "swish"},
    "labels": {"labels": ["N", "A", "C", "G", "T"]},
    "block": [
        dict(filters=8, repeat=1, kernel=[9], stride=[3], dilation=[1],
             dropout=0.0, residual=False, separable=False),
        dict(filters=12, repeat=3, kernel=[7], stride=[1], dilation=[1],
             dropout=0.0, residual=True, separable=True),
        dict(filters=16, repeat=1, kernel=[1], stride=[1], dilation=[1],
             dropout=0.0, residual=False, separable=False),
    ],
}


def test_forward_shape():
    caller = bc.Basecaller.init(TINY, chunksize=99)
    out = caller.forward(np.zeros((2, 99, 1), np.float32))
    assert out.shape == (2, 33, 5)           # stride 3
    # log-probs sum to 1
    np.testing.assert_allclose(np.exp(out).sum(-1), 1.0, rtol=1e-5)


def _torch_quartznet(config):
    """Independently-built torch model producing bonito's state_dict naming
    (encoder.encoder.<i>.conv.<j>..., residual.<j>, decoder.layers.0)."""
    torch = pytest.importorskip("torch")
    from torch import nn as tnn

    class Swish(tnn.Module):
        def forward(self, x):
            return x * torch.sigmoid(x)

    class TCS(tnn.Module):
        def __init__(self, cin, cout, k, stride=1, dilation=1, sep=False):
            super().__init__()
            pad = (k // 2) * dilation
            if sep:
                self.depthwise = tnn.Conv1d(cin, cin, k, stride, pad,
                                            dilation, groups=cin, bias=False)
                self.pointwise = tnn.Conv1d(cin, cout, 1, stride, 0,
                                            bias=False)
            else:
                self.conv = tnn.Conv1d(cin, cout, k, stride, pad, dilation,
                                       bias=False)
            self.sep = sep

        def forward(self, x):
            if self.sep:
                return self.pointwise(self.depthwise(x))
            return self.conv(x)

    class Block(tnn.Module):
        def __init__(self, cin, layer):
            super().__init__()
            f, k = layer["filters"], layer["kernel"][0]
            s, d = layer["stride"][0], layer["dilation"][0]
            sep = layer["separable"]
            mods, c = [], cin
            for _ in range(layer["repeat"] - 1):
                mods += [TCS(c, f, k, s, d, sep),
                         tnn.BatchNorm1d(f, eps=1e-3), Swish(),
                         tnn.Dropout(0.0)]
                c = f
            mods += [TCS(c, f, k, s, d, sep), tnn.BatchNorm1d(f, eps=1e-3)]
            self.conv = tnn.ModuleList(mods)
            self.use_res = layer["residual"]
            if self.use_res:
                self.residual = tnn.Sequential(
                    TCS(cin, f, 1), tnn.BatchNorm1d(f, eps=1e-3))
            self.act = Swish()

        def forward(self, x):
            h = x
            for m in self.conv:
                h = m(h)
            if self.use_res:
                h = h + self.residual(x)
            return self.act(h)

    class Enc(tnn.Module):
        def __init__(self):
            super().__init__()
            c = config["input"]["features"]
            blocks = []
            for layer in config["block"]:
                blocks.append(Block(c, layer))
                c = layer["filters"]
            self.encoder = tnn.Sequential(*blocks)

        def forward(self, x):
            return self.encoder(x)

    class Dec(tnn.Module):
        def __init__(self, f, classes):
            super().__init__()
            self.layers = tnn.Sequential(tnn.Conv1d(f, classes, 1, bias=True))

        def forward(self, x):
            return torch.nn.functional.log_softmax(
                self.layers(x).transpose(1, 2), dim=2)

    class Model(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Enc()
            self.decoder = Dec(config["block"][-1]["filters"],
                               len(config["labels"]["labels"]))

        def forward(self, x):
            return self.decoder(self.encoder(x))

    return Model()


def test_torch_checkpoint_parity():
    torch = pytest.importorskip("torch")
    tm = _torch_quartznet(TINY).eval()
    # randomize running stats so BN folding is actually exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1, 0.2)
                m.bias.normal_(0, 0.2)

    variables = bc.convert_torch_state_dict(
        dict(tm.state_dict()), TINY)
    caller = bc.Basecaller(TINY, variables)

    x = np.random.default_rng(0).normal(size=(3, 120, 1)).astype(np.float32)
    ours = caller.forward(x)
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_viterbi_decode_collapse():
    # frames argmax: N A A N C C -> "AC"
    post = np.full((6, 5), 0.01, np.float32)
    for t, c in enumerate([0, 1, 1, 0, 2, 2]):
        post[t, c] = 0.9
    seq, path = bc.viterbi_decode(post, "NACGT")
    assert seq == "AC"
    assert list(path) == [1, 4]


def _brute_force_ctc_best(post, alphabet):
    """Enumerate all label paths, sum probabilities per collapsed string."""
    T, C = post.shape
    totals = {}
    for path in itertools.product(range(C), repeat=T):
        p = 1.0
        for t, c in enumerate(path):
            p *= post[t, c]
        # collapse
        out = []
        prev = 0
        for c in path:
            if c != 0 and c != prev:
                out.append(c)
            prev = c
        s = "".join(alphabet[c] for c in out)
        totals[s] = totals.get(s, 0.0) + p
    return max(totals.items(), key=lambda kv: kv[1])[0]


def test_beam_search_matches_bruteforce():
    rng = np.random.default_rng(3)
    for _ in range(5):
        post = rng.dirichlet(np.ones(4), size=5).astype(np.float64)
        best = _brute_force_ctc_best(post, "NACG")
        seq, _ = bc.beam_search_decode(post, "NACG", beamsize=32,
                                       threshold=0.0)
        assert seq == best


def test_chunk_stitch_roundtrip():
    rng = np.random.default_rng(1)
    sig = rng.normal(size=1000).astype(np.float32)
    chunks = bc.chunk_signal(sig, 300, 60)
    assert chunks.shape[1:] == (300, 1)
    # chunks overlap by `overlap`; stitching identity predictions recovers
    # a sequence whose length covers the padded signal
    preds = chunks[:, :, 0]
    st = bc.stitch_predictions(preds[:, :, None], 30)
    assert st.shape[0] >= 1
    # short signal passes through unchunked
    short = bc.chunk_signal(sig[:100], 300, 60)
    assert short.shape == (1, 100, 1)


def test_norm_by_noisiest_section():
    rng = np.random.default_rng(2)
    sig = np.concatenate([rng.normal(0, 1, 500),
                          rng.normal(5, 10, 200),
                          rng.normal(0, 1, 300)])
    norm = bc.norm_by_noisiest_section(sig.astype(np.float64))
    assert norm.dtype == np.float32
    assert abs(np.median(norm[500:700])) < 1.0
