"""Native (C) runtime components, built on demand with the system
compiler and loaded via ctypes; every user has a pure-Python fallback.

The reference's runtime around its kernels is C/C++ (htslib BAM I/O,
drivers); these fill the same role for the hot host-side paths."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build(so_path: str) -> bool:
    src = os.path.join(_DIR, "bgzf_native.c")
    cc = os.environ.get("CC", "cc")
    r = subprocess.run(
        [cc, "-O3", "-shared", "-fPIC", "-o", so_path, src, "-lz"],
        capture_output=True, text=True)
    if r.returncode != 0:
        print(f"[genarchbench_tpu.native] build failed: "
              f"{r.stderr[-200:]}", file=sys.stderr)
        return False
    return True


def bgzf_lib() -> Optional[ctypes.CDLL]:
    """The native BGZF decoder, building it on first use; None when no
    compiler is available (callers fall back to pure Python)."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so_path = os.path.join(_DIR, "bgzf_native.so")
    if not os.path.exists(so_path) or (
            os.path.getmtime(so_path)
            < os.path.getmtime(os.path.join(_DIR, "bgzf_native.c"))):
        if not _build(so_path):
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.bgzf_decompressed_size.restype = ctypes.c_int64
    lib.bgzf_decompressed_size.argtypes = [
        ctypes.c_char_p, ctypes.c_int64]
    lib.bgzf_decompress.restype = ctypes.c_int64
    lib.bgzf_decompress.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    _LIB = lib
    return lib


def bgzf_decompress(raw: bytes) -> Optional[bytes]:
    """Decode a whole BGZF byte string natively; None on any failure
    (caller falls back to the Python decoder)."""
    lib = bgzf_lib()
    if lib is None:
        return None
    n = lib.bgzf_decompressed_size(raw, len(raw))
    if n < 0:
        return None
    buf = (ctypes.c_uint8 * n)()
    w = lib.bgzf_decompress(raw, len(raw), buf, n)
    if w != n:
        return None
    return bytes(buf)
