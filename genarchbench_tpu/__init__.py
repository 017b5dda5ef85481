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

from genarchbench_tpu.core.registry import get_kernel, list_kernels  # noqa: F401
