"""Native (C++) host-side components, loaded via ctypes.

The compute path is device-native (JAX/Pallas); these cover the host
runtime pieces that are C++ in the reference and genuinely hot on the
host: currently the DBoW2 text-vocabulary parser (the reference spends
~10 s parsing its 145 MB ORBvoc.txt at every startup).

Libraries build on demand with g++ and cache next to the source; every
entry point has a pure-Python fallback so the package works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(__file__)


def _build(name: str, src: str) -> str | None:
    so = os.path.join(_DIR, f"lib{name}.so")
    cpp = os.path.join(_DIR, src)
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(cpp):
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", so, cpp],
            check=True, capture_output=True,
        )
        return so
    except (OSError, subprocess.CalledProcessError):
        return None


def load_voc_parser():
    """ctypes handle to the vocabulary parser, or None (use Python fallback)."""
    so = _build("vocparser", "voc_parser.cpp")
    if so is None:
        return None
    lib = ctypes.CDLL(so)

    class VocHeader(ctypes.Structure):
        _fields_ = [
            ("k", ctypes.c_int32),
            ("levels", ctypes.c_int32),
            ("scoring", ctypes.c_int32),
            ("weighting", ctypes.c_int32),
            ("n_nodes", ctypes.c_int64),
        ]

    lib.voc_scan.restype = ctypes.c_int
    lib.voc_scan.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(VocHeader)]
    lib.voc_parse.restype = ctypes.c_int
    lib.voc_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_double),
    ]
    lib._VocHeader = VocHeader
    return lib
