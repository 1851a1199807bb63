"""On-demand compilation and loading of the native library."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

_DIR = Path(__file__).parent
_SRC = _DIR / "bytetree.cpp"
_SO = _DIR / "_vmn_native.so"

_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO), str(_SRC)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, compiling it on first use; None if no
    toolchain is available (callers fall back to numpy)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None
        lib.bt_encoded_size.restype = ctypes.c_size_t
        lib.bt_encoded_size.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
        lib.bt_encode_array.restype = ctypes.c_size_t
        lib.bt_encode_array.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_char_p,
        ]
        lib.bt_decode_array.restype = ctypes.c_int
        lib.bt_decode_array.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.bt_probe_array.restype = ctypes.c_int
        lib.bt_probe_array.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.prg_expand_sha256.restype = None
        lib.prg_expand_sha256.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int32,
            ctypes.c_size_t, ctypes.c_char_p,
        ]
        _lib = lib
        return _lib
