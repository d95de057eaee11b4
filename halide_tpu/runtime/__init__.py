"""Native host runtime bindings (ctypes over runtime/native/ht_runtime.cpp).

Builds the shared library on first use (g++ only; no pybind11); falls back
to a pure-Python implementation when no toolchain is available. This is the
host-side remainder of the reference's runtime (SURVEY.md §2.3): trace
streams + memoization cache. XLA/PJRT owns device memory and execution.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "ht_runtime.cpp")
_SO = os.path.join(_HERE, "native", "ht_runtime.so")

_lib = None
_lib_lock = threading.Lock()

EVENT_LOAD = 0
EVENT_STORE = 1
EVENT_BEGIN_REALIZATION = 2
EVENT_END_REALIZATION = 3
EVENT_PRODUCE = 4
EVENT_CONSUME = 5
EVENT_PRINT = 6


def _build() -> Optional[str]:
    try:
        if (os.path.exists(_SO)
                and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
            return _SO
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _SO],
            check=True, capture_output=True)
        return _SO
    except Exception:
        return None


def get_lib():
    """The loaded native library, or None (callers fall back to Python)."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib if _lib is not False else None
        so = _build()
        if so is None:
            _lib = False
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            _lib = False
            return None
        lib.ht_trace_open.argtypes = [ctypes.c_char_p]
        lib.ht_trace_open.restype = ctypes.c_int
        lib.ht_trace_emit.argtypes = [
            ctypes.c_uint32, ctypes.c_char_p, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_char_p, ctypes.c_uint32]
        lib.ht_trace_emit.restype = ctypes.c_int
        lib.ht_trace_packet_count.restype = ctypes.c_uint64
        lib.ht_trace_byte_count.restype = ctypes.c_uint64
        lib.ht_trace_close.restype = ctypes.c_int
        lib.ht_cache_set_size.argtypes = [ctypes.c_uint64]
        lib.ht_cache_store.argtypes = [
            ctypes.c_char_p, ctypes.c_uint32, ctypes.c_char_p,
            ctypes.c_uint64]
        lib.ht_cache_store.restype = ctypes.c_int
        lib.ht_cache_lookup.argtypes = [
            ctypes.c_char_p, ctypes.c_uint32, ctypes.c_char_p,
            ctypes.c_uint64]
        lib.ht_cache_lookup.restype = ctypes.c_int64
        lib.ht_cache_stats.argtypes = [
            ctypes.POINTER(ctypes.c_uint64)] * 5
        _lib = lib
        return lib


class MemoCache:
    """LRU result cache (native when available). Keys/values are bytes."""

    def __init__(self, max_bytes: int = 1 << 30):
        self._lib = get_lib()
        if self._lib is not None:
            self._lib.ht_cache_set_size(max_bytes)
        else:
            self._store = {}
            self._order = []
            self._max = max_bytes
            self._bytes = 0
            self.hits = 0
            self.misses = 0

    def store(self, key: bytes, value: bytes) -> None:
        if self._lib is not None:
            self._lib.ht_cache_store(key, len(key), value, len(value))
            return
        if key in self._store:
            self._bytes -= len(self._store[key])
            self._order.remove(key)
        self._store[key] = value
        self._order.insert(0, key)
        self._bytes += len(value)
        while self._bytes > self._max and self._order:
            k = self._order.pop()
            self._bytes -= len(self._store.pop(k))

    def lookup(self, key: bytes) -> Optional[bytes]:
        if self._lib is not None:
            n = self._lib.ht_cache_lookup(key, len(key), None, 0)
            if n < 0:
                return None
            buf = ctypes.create_string_buffer(max(n, 1))
            # the entry can be evicted between the size probe and the fill;
            # a negative or changed size on the second call is a miss
            n2 = self._lib.ht_cache_lookup(key, len(key), buf, n)
            if n2 < 0 or n2 != n:
                return None
            return buf.raw[:n]
        v = self._store.get(key)
        if v is None:
            self.misses += 1
            return None
        self.hits += 1
        self._order.remove(key)
        self._order.insert(0, key)
        return v

    def stats(self):
        if self._lib is not None:
            vals = [ctypes.c_uint64() for _ in range(5)]
            self._lib.ht_cache_stats(*[ctypes.byref(v) for v in vals])
            return {"hits": vals[0].value, "misses": vals[1].value,
                    "evictions": vals[2].value, "bytes": vals[3].value,
                    "entries": vals[4].value}
        return {"hits": self.hits, "misses": self.misses,
                "evictions": 0, "bytes": self._bytes,
                "entries": len(self._store)}

    def clear(self):
        if self._lib is not None:
            self._lib.ht_cache_clear()
        else:
            self._store.clear()
            self._order.clear()
            self._bytes = 0


class TraceWriter:
    """Binary trace packet stream (native ring writer when available)."""

    def __init__(self, path: Optional[str] = None):
        self._lib = get_lib()
        self._py_file = None
        self.packets = 0
        if self._lib is not None:
            if path:
                self._lib.ht_trace_open(path.encode())
        elif path:
            self._py_file = open(path, "wb")

    def emit(self, event_code: int, name: str, dtype_code: int,
             coords, payload: bytes = b"") -> None:
        self.packets += 1
        coords = list(coords)[:8]
        if self._lib is not None:
            arr = (ctypes.c_int32 * max(1, len(coords)))(*coords)
            self._lib.ht_trace_emit(event_code, name.encode(), dtype_code,
                                    len(coords), arr, payload, len(payload))
            return
        if self._py_file is not None:
            import struct
            h = struct.pack("<6I8i", 0x48545243, event_code,
                            len(name.encode()), len(payload), dtype_code,
                            len(coords), *(coords + [0] * (8 - len(coords))))
            self._py_file.write(h + name.encode() + payload)

    def close(self):
        if self._lib is not None:
            self._lib.ht_trace_close()
        if self._py_file is not None:
            self._py_file.close()
            self._py_file = None


_global_memo_cache: Optional[MemoCache] = None


def memo_cache() -> MemoCache:
    global _global_memo_cache
    if _global_memo_cache is None:
        _global_memo_cache = MemoCache()
    return _global_memo_cache
