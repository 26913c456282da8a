"""Build the native data-path library (g++ -O3 -shared).

Idempotent: rebuilds only when the source is newer than the cached .so.
Import-time auto-build is done by mmtraj/data/native.py; failures fall back to
the pure-NumPy parser with a one-line notice (never an import error).
"""

from __future__ import annotations

import os
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_HERE, "fastparse.cpp")
LIB = os.path.join(_HERE, "_libmmtraj_native.so")


def build(force: bool = False) -> str:
    """Compile if needed; returns the .so path.  Raises on compiler failure."""
    if (
        not force
        and os.path.exists(LIB)
        and os.path.getmtime(LIB) >= os.path.getmtime(SRC)
    ):
        return LIB
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", LIB, SRC]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return LIB


if __name__ == "__main__":
    print(build(force=True))
