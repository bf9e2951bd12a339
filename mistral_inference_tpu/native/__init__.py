"""ctypes bindings for the native runtime components (C++, see bpe.cc).

``lib()`` builds libbpe.so on first use (make, ~1s) and caches the handle;
callers fall back to pure-Python paths when no compiler is available."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

_DIR = Path(__file__).parent
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _DIR / "libbpe.so"
    try:
        if not so.is_file() or so.stat().st_mtime < (_DIR / "bpe.cc").stat().st_mtime:
            subprocess.run(
                ["make", "-C", str(_DIR)], check=True, capture_output=True, timeout=120
            )
        L = ctypes.CDLL(str(so))
        L.spm_create.restype = ctypes.c_void_p
        L.spm_create.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        L.spm_destroy.argtypes = [ctypes.c_void_p]
        L.spm_encode.restype = ctypes.c_int32
        L.spm_encode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        L.bbpe_create.restype = ctypes.c_void_p
        L.bbpe_create.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        L.bbpe_destroy.argtypes = [ctypes.c_void_p]
        L.bbpe_encode.restype = ctypes.c_int32
        L.bbpe_encode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = L
    except Exception:
        _LIB = None
    return _LIB
