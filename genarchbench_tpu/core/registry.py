"""Kernel registry.

Every kernel registers a `KernelSpec` describing its CLI name, runner
entrypoint, and golden-check rule.  The CLI and regression harness are
generic over this registry (the reference's equivalent is the per-benchmark
scripts/ + Makefile pairs, e.g. /root/reference/benchmarks/chain/scripts/).
"""

from __future__ import annotations

import dataclasses
import importlib
from typing import Callable, Dict, Optional


@dataclasses.dataclass(frozen=True)
class KernelSpec:
    name: str                      # CLI name, e.g. "chain"
    module: str                    # python module implementing run(args) -> None
    description: str
    check_rule: str                # one of: exact | sorted | tolerant_abea | scalar
    timing_line: str               # greppable stderr timing-line prefix
    # optional regex extracting the work-item count from the kernel's
    # own output, for the regress sweep's items/s scaling table
    # (BASELINE.md north-star metric: reads/s at 1 chip / 1 host / N)
    items_re: Optional[str] = None
    items_unit: str = "items"


_REGISTRY: Dict[str, KernelSpec] = {}


def register_kernel(spec: KernelSpec) -> KernelSpec:
    _REGISTRY[spec.name] = spec
    return spec


def get_kernel(name: str) -> KernelSpec:
    _ensure_builtin()
    if name not in _REGISTRY:
        raise KeyError(f"unknown kernel {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def list_kernels():
    _ensure_builtin()
    return sorted(_REGISTRY.values(), key=lambda s: s.name)


def load_runner(name: str) -> Callable:
    spec = get_kernel(name)
    mod = importlib.import_module(spec.module)
    return getattr(mod, "run")


_BUILTIN = [
    # (name, module, description, check_rule, timing_line)
    ("chain", "genarchbench_tpu.kernels.chain",
     "minimap2 anchor chaining DP (exact, with skip heuristics)", "exact",
     "Time in kernel:"),
    ("fast-chain", "genarchbench_tpu.kernels.fast_chain",
     "simplified 32-bit anchor chaining (vectorized, no heuristics)", "exact",
     "Time in kernel:"),
    ("bpm", "genarchbench_tpu.kernels.bpm",
     "bit-parallel Myers edit distance", "sorted",
     "Time.Benchmark"),
    ("bsw", "genarchbench_tpu.kernels.bsw",
     "banded affine-gap Smith-Waterman (BWA-MEM2 extension)", "exact",
     "Overall SW cycles"),
    ("wfa", "genarchbench_tpu.kernels.wfa",
     "gap-affine wavefront alignment", "sorted",
     "Time.Alignment:", r"Total.reads: (\d+)", "pairs"),
    ("fmi", "genarchbench_tpu.kernels.fmi",
     "FM-index SMEM search (BWA-MEM2 seeding)", "exact",
     "Computing time:", r"numReads = (\d+)", "reads"),
    ("kmer-cnt", "genarchbench_tpu.kernels.kmer",
     "canonical k-mer counting (Flye)", "scalar",
     "Kernel time:"),
    ("dbg", "genarchbench_tpu.kernels.dbg",
     "windowed de-Bruijn-graph variant paths (Platypus)", "sorted",
     "Kernel runtime:"),
    ("pileup", "genarchbench_tpu.kernels.pileup",
     "pileup base-count matrices (Medaka)", "exact",
     "Kernel runtime:"),
    ("poa", "genarchbench_tpu.kernels.poa",
     "partial-order alignment consensus (spoa)", "exact",
     "Runtime:"),
    ("abea", "genarchbench_tpu.kernels.abea",
     "adaptive banded event alignment (f5c/nanopolish)", "tolerant_abea",
     "Data processing time:"),
    ("nn-base", "genarchbench_tpu.nn.basecall",
     "QuartzNet-CTC nanopore basecalling (Bonito)", "exact",
     "> samples per second"),
    ("nn-variant", "genarchbench_tpu.nn.variant",
     "Clair3-style NN variant calling (pileup model)", "sorted",
     "VariantCalling execution time:"),
]


_loaded = False


def _ensure_builtin() -> None:
    global _loaded
    if _loaded:
        return
    _loaded = True
    for name, module, desc, rule, tline, *items in _BUILTIN:
        register_kernel(KernelSpec(name, module, desc, rule, tline,
                                   *items))
