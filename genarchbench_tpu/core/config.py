"""Typed configuration covering the reference's three config tiers
(SURVEY.md §5.6):

  1. environment (reference: benchmarks/setup.sh:3-23 env vars) —
     `EnvConfig.from_env()` reads every GENARCH_* variable in one place;
  2. build-time kernel variants (reference: make flags like kmer-cnt's
     COUNT_VERSION, chain's arch=) — `KernelVariants`, plumbed as plain
     typed fields instead of -D defines;
  3. runtime key=value config files (reference: Flye's config.h loader
     with %include, kmer-cnt/config.h) — `load_kv_config`.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Tier 1: the process environment (setup.sh equivalent)."""
    inputs_root: Optional[str] = None   # GENARCH_BENCH_INPUTS_ROOT
    platform: Optional[str] = None      # GENARCH_PLATFORM ("cpu" forces host)
    devices: int = 1                    # GENARCH_DEVICES (job scripts export)
    hosts: int = 1                      # GENARCH_HOSTS
    trace_dir: Optional[str] = None     # GENARCH_TRACE_DIR (jax.profiler)
    job_scheduler: Optional[str] = None  # GENARCH_JOB_SCHEDULER override
    job_dir: Optional[str] = None       # GENARCH_JOB_DIR (stage dirs)
    regress_timeout_s: float = 1800.0   # GENARCH_REGRESS_TIMEOUT

    @classmethod
    def from_env(cls, env: Optional[Dict[str, str]] = None) -> "EnvConfig":
        e = os.environ if env is None else env

        def _int(k, d):
            try:
                return int(e.get(k, d))
            except ValueError:
                return d

        def _float(k, d):
            try:
                return float(e.get(k, d))
            except ValueError:
                return d

        return cls(
            inputs_root=e.get("GENARCH_BENCH_INPUTS_ROOT"),
            platform=e.get("GENARCH_PLATFORM"),
            devices=max(1, _int("GENARCH_DEVICES", 1)),
            hosts=max(1, _int("GENARCH_HOSTS", 1)),
            trace_dir=e.get("GENARCH_TRACE_DIR"),
            job_scheduler=e.get("GENARCH_JOB_SCHEDULER"),
            job_dir=e.get("GENARCH_JOB_DIR"),
            regress_timeout_s=_float("GENARCH_REGRESS_TIMEOUT", 1800.0),
        )


@dataclasses.dataclass(frozen=True)
class KernelVariants:
    """Tier 2: the reference's make-time kernel variants as typed flags.

    kmer_count_version — kmer-cnt COUNT_VERSION (vertex_index.h:23); the
        TPU build implements the v3 semantics (range-partitioned distinct
        count) on one device and the hash-sharded equivalent multi-chip.
    chain_with_heuristics — chain vs fast-chain inner-loop semantics
        (fast-chain drops the skip heuristic, host_kernel.cpp:803-866).
    abea_2d_band — abea ALIGN_2D_ARRAY (align.c:225): band storage
        layout; results identical, kept for parity documentation.
    """
    kmer_count_version: int = 3
    chain_with_heuristics: bool = True
    abea_2d_band: bool = False


def load_kv_config(path: str) -> Dict[str, str]:
    """Tier 3: Flye-style key=value config with %include and # comments
    (kmer-cnt/config.h semantics)."""
    cfg: Dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.split("#")[0].strip()
            if not line:
                continue
            if line.startswith("%include"):
                inc = line.split(None, 1)[1].strip()
                cfg.update(load_kv_config(
                    os.path.join(os.path.dirname(path), inc)))
                continue
            if "=" in line:
                key, val = (t.strip() for t in line.split("=", 1))
                cfg[key] = val
    return cfg
