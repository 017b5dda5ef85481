"""GenArchBench-TPU: a TPU-native genomics kernel framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
LorienLV/genarchbench (see /root/reference): 13 genomics kernels
(sequence alignment, chaining, indexing, counting, assembly-graph,
pileup, consensus, signal alignment, NN basecalling/variant calling),
a batch-execution runtime with device-mesh sharding, and a regression
harness with golden-output checking.

Layers (mirroring SURVEY.md §1 but TPU-first):
  core/      config, kernel registry, ROI timing, golden-check rules
  io/        host-side readers/writers byte-matching the reference formats
  sharding/  mesh construction, padding/bucketing, collective merges
  kernels/   the 13 algorithms as JAX/Pallas device kernels
  nn/        flax models (basecalling QuartzNet-CTC, Clair3-style variant)
  harness/   regression runner (device-count sweeps, timing lines)
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compilation cache: kernel shapes recur across runs and the
# first XLA compile of the DP loops is expensive (minutes via the remote
# TPU compile path), so cache aggressively by default.
if not _os.environ.get("GENARCH_NO_COMPILE_CACHE"):
    _cache = _os.environ.get(
        "GENARCH_COMPILE_CACHE",
        _os.path.join(_os.path.dirname(__file__), "..", ".cache", "jax"))
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from genarchbench_tpu.core.registry import get_kernel, list_kernels  # noqa: F401
