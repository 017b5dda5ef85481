"""Compute-backend selection: XLA formulation everywhere, Pallas inner
loops on real TPU (interpreted Pallas off-TPU is for tests only).
Override per-call with backend="pallas"|"xla" or globally with the
GENARCH_BACKEND env var."""

from __future__ import annotations

import os

import jax


def use_pallas(backend: str = "auto") -> bool:
    backend = os.environ.get("GENARCH_BACKEND", backend)
    if backend == "pallas":
        return True
    if backend == "xla":
        return False
    return jax.default_backend() == "tpu"


def pallas_interpret() -> bool:
    """Interpret mode whenever not on real TPU hardware."""
    return jax.default_backend() != "tpu"
