"""Native host-side modules, compiled on demand via g++ and bound with ctypes."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(__file__)
_LOCK = threading.Lock()
_LIBS = {}


def load(name: str):
    """Compile (if needed) and load lib<name>.so from this directory.
    Returns the ctypes CDLL, or None if no toolchain is available."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        src = os.path.join(_DIR, name + ".cpp")
        so = os.path.join(_DIR, "lib" + name + ".so")
        if not os.path.exists(so) or (
                os.path.exists(src)
                and os.path.getmtime(src) > os.path.getmtime(so)):
            try:
                # NOTE: float semantics are load-bearing (bit-exact parity
                # with the reference build): keep IEEE ordering — no
                # -ffast-math, explicit -ffp-contract=off (no FMA fusing).
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-ffp-contract=off",
                     "-shared", "-fPIC", "-std=c++17", src, "-o", so],
                    check=True, capture_output=True)
            except Exception:
                _LIBS[name] = None
                return None
        try:
            _LIBS[name] = ctypes.CDLL(so)
        except OSError:
            _LIBS[name] = None
        return _LIBS[name]
