"""ctypes bindings for the native annotation parser (mmtraj/native).

`read_annotation_file_native(path)` is a drop-in for
mmtraj.data.parser.read_annotation_file; the public loader front door
(`read_annotation_file_fast`) prefers native and falls back to NumPy if the
toolchain is unavailable.  Correctness is pinned by tests/test_native.py
(byte-identical output on the same files).
"""

from __future__ import annotations

import ctypes
import sys
from typing import Optional

import numpy as np

_lib: Optional[ctypes.CDLL] = None
_load_error: Optional[str] = None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        from mmtraj.native.build import build

        path = build()
        lib = ctypes.CDLL(path)
        lib.mmtraj_count_rows.argtypes = [ctypes.c_char_p]
        lib.mmtraj_count_rows.restype = ctypes.c_long
        lib.mmtraj_parse.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_long,
            ctypes.c_int,
        ]
        lib.mmtraj_parse.restype = ctypes.c_long
        _lib = lib
    except Exception as e:  # no compiler / load failure -> numpy fallback
        _load_error = str(e)
        print(f"mmtraj: native parser unavailable ({e}); using NumPy fallback",
              file=sys.stderr)
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def read_annotation_file_native(path: str) -> np.ndarray:
    """Native parse -> (R, 4) float64 [frame, ped, x, y]."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError(f"native parser unavailable: {_load_error}")
    encoded = path.encode("utf-8")
    cap = lib.mmtraj_count_rows(encoded)
    if cap < 0:
        raise FileNotFoundError(f"cannot read {path!r}")
    out = np.zeros((max(cap, 1), 4), dtype=np.float64)
    rows = lib.mmtraj_parse(
        encoded, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), cap, 4
    )
    if rows == -1:
        raise FileNotFoundError(f"cannot read {path!r}")
    if rows < 0:  # -(line_no + 1): the offset keeps line 1 distinct from -1
        raise ValueError(
            f"{path}: malformed line {-rows - 1} (expected >=4 numeric columns)"
        )
    return out[:rows]


def read_annotation_file_fast(path: str) -> np.ndarray:
    """Native when available, NumPy otherwise — identical output either way:
    the NumPy path's tolerant scanner (parser._read_tolerant) mirrors the
    native parser's messy-file semantics exactly ('#'/'%' comments, commas,
    trailing junk, per-line >=4-numbers check), pinned by
    tests/test_native.py::test_numpy_fallback_matches_native_on_messy."""
    if native_available():
        return read_annotation_file_native(path)
    from mmtraj.data.parser import read_annotation_file

    return read_annotation_file(path)
