"""OrderedStrMap: a str-keyed map whose iteration order matches libstdc++
std::unordered_map<std::string, T> given the same operation sequence.

The reference picks its reroot BFS start leaf from unordered_map iteration
order (tree.cpp:601-605); byte-identical default-mode output requires
reproducing that order. We do it with a real std::unordered_map behind
ctypes (twilight_tpu/native/stdorder.cpp), compiled on first use. If no C++
toolchain is available we fall back to insertion order (correct alignments,
possibly different reroot choice).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, List, Optional

_LIB = None
_LIB_LOCK = threading.Lock()
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")


def _load_lib():
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        so_path = os.path.join(_NATIVE_DIR, "libstdorder.so")
        src_path = os.path.join(_NATIVE_DIR, "stdorder.cpp")
        if not os.path.exists(so_path) or (
                os.path.exists(src_path)
                and os.path.getmtime(src_path) > os.path.getmtime(so_path)):
            try:
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                     src_path, "-o", so_path],
                    check=True, capture_output=True)
            except Exception:
                _LIB = False
                return _LIB
        try:
            lib = ctypes.CDLL(so_path)
            lib.om_create.restype = ctypes.c_void_p
            lib.om_destroy.argtypes = [ctypes.c_void_p]
            lib.om_set.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64]
            lib.om_erase.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.om_size.argtypes = [ctypes.c_void_p]
            lib.om_size.restype = ctypes.c_int64
            lib.om_iter_ids.argtypes = [ctypes.c_void_p,
                                        ctypes.POINTER(ctypes.c_int64),
                                        ctypes.c_int64]
            lib.om_iter_ids.restype = ctypes.c_int64
            _LIB = lib
        except OSError:
            _LIB = False
        return _LIB


class OrderedStrMap:
    """dict-like map; iteration follows libstdc++ unordered_map order."""

    def __init__(self):
        self._data = {}
        self._id_to_key: List[str] = []
        lib = _load_lib()
        self._lib = lib if lib else None
        self._handle = lib.om_create() if lib else None

    def __del__(self):
        if getattr(self, "_handle", None) is not None and self._lib is not None:
            self._lib.om_destroy(self._handle)
            self._handle = None

    # --- dict protocol -----------------------------------------------------
    def __setitem__(self, key: str, value) -> None:
        self._data[key] = value
        if self._handle is not None:
            idx = len(self._id_to_key)
            self._id_to_key.append(key)
            self._lib.om_set(self._handle, key.encode(), idx)

    def __getitem__(self, key: str):
        return self._data[key]

    def get(self, key: str, default=None):
        return self._data.get(key, default)

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def __len__(self) -> int:
        return len(self._data)

    def erase(self, key: str) -> None:
        if key in self._data:
            del self._data[key]
            if self._handle is not None:
                self._lib.om_erase(self._handle, key.encode())

    # --- ordered iteration ---------------------------------------------------
    def _ordered_keys(self) -> List[str]:
        if self._handle is None:
            return list(self._data.keys())
        n = self._lib.om_size(self._handle)
        buf = (ctypes.c_int64 * max(n, 1))()
        got = self._lib.om_iter_ids(self._handle, buf, n)
        return [self._id_to_key[buf[i]] for i in range(got)]

    def __iter__(self) -> Iterator[str]:
        return iter(self._ordered_keys())

    def keys(self) -> Iterator[str]:
        return iter(self._ordered_keys())

    def values(self):
        return [self._data[k] for k in self._ordered_keys()]

    def items(self):
        return [(k, self._data[k]) for k in self._ordered_keys()]


class OrderedStrSet:
    """unordered_set<std::string> iteration-order stand-in."""

    def __init__(self, items=()):
        self._map = OrderedStrMap()
        for it in items:
            self.add(it)

    def add(self, item: str) -> None:
        if item not in self._map:
            self._map[item] = True

    def __contains__(self, item: str) -> bool:
        return item in self._map

    def __len__(self) -> int:
        return len(self._map)

    def __iter__(self):
        return iter(self._map)
