"""Memory-mapped binary dataset cache (native mmap plane, ROADMAP 11).

After the first parse+split, the assembled split arrays are written once to
an aligned binary file by the C++ plane (runtime_native/iinsvae_io.cc
``iins_cache_*``); subsequent runs mmap it — zero parse, pages fault in on
first touch. The cache key embeds the source file's (size, mtime) and the
split parameters, so a changed dataset or config transparently misses.

Pure-python fallback (np.save/np.load with mmap_mode) keeps the framework
working without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
from typing import Dict, Optional

import numpy as np

from iinsvae_tpu.runtime import native as _native

_DTYPES = {0: np.float32, 1: np.float64, 2: np.int64}
_DTYPE_CODES = {np.dtype(np.float32): 0, np.dtype(np.float64): 1, np.dtype(np.int64): 2}

_i64 = ctypes.c_int64
_p_i64 = ctypes.POINTER(ctypes.c_int64)


def _lib():
    lib = _native._load()
    if lib is None:
        return None
    if not hasattr(lib, "_cache_bound"):
        lib.iins_cache_write.restype = _i64
        lib.iins_cache_write.argtypes = [
            ctypes.c_char_p, _i64, ctypes.POINTER(ctypes.c_char_p),
            _p_i64, _p_i64, _p_i64, ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.iins_cache_open.restype = ctypes.c_void_p
        lib.iins_cache_open.argtypes = [ctypes.c_char_p]
        lib.iins_cache_count.restype = _i64
        lib.iins_cache_count.argtypes = [ctypes.c_void_p]
        lib.iins_cache_array.restype = ctypes.c_void_p
        lib.iins_cache_array.argtypes = [
            ctypes.c_void_p, _i64, ctypes.c_char_p, _p_i64, _p_i64, _p_i64,
        ]
        lib.iins_cache_close.argtypes = [ctypes.c_void_p]
        lib._cache_bound = True
    return lib


def cache_key(source_path: str, **params) -> str:
    """Content-addressed cache filename: source (size, mtime) + params."""
    try:
        st = os.stat(source_path)
        ident = f"{source_path}:{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        ident = source_path
    blob = ident + "|" + "|".join(f"{k}={params[k]}" for k in sorted(params))
    return hashlib.sha256(blob.encode()).hexdigest()[:24]


def write_cache(path: str, arrays: Dict[str, np.ndarray]) -> bool:
    """Write arrays to ``path`` atomically. Returns False when unavailable."""
    lib = _lib()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    norm = {}
    for k, v in arrays.items():
        a = np.ascontiguousarray(v)
        if a.dtype not in _DTYPE_CODES:
            a = a.astype(np.float64)
        assert 1 <= a.ndim <= 4 and len(k.encode()) <= 15, (k, a.shape)
        norm[k] = a
    if lib is None:  # fallback: one .npz-like dir of .npy files
        tmp = path + ".tmpdir"
        os.makedirs(tmp, exist_ok=True)
        for k, a in norm.items():
            np.save(os.path.join(tmp, k + ".npy"), a)
        os.replace(tmp, path)
        return True
    n = len(norm)
    names = (ctypes.c_char_p * n)(*[k.encode() for k in norm])
    dtypes = (np.array([_DTYPE_CODES[a.dtype] for a in norm.values()], np.int64))
    ndims = np.array([a.ndim for a in norm.values()], np.int64)
    dims = np.ones((n, 4), np.int64)
    for i, a in enumerate(norm.values()):
        dims[i, : a.ndim] = a.shape
    datas = (ctypes.c_void_p * n)(*[a.ctypes.data_as(ctypes.c_void_p).value
                                    for a in norm.values()])
    rc = lib.iins_cache_write(
        path.encode(), n, names,
        dtypes.ctypes.data_as(_p_i64), ndims.ctypes.data_as(_p_i64),
        dims.ctypes.data_as(_p_i64), datas,
    )
    return rc == 0


class _MappedCache:
    """Keeps the mmap handle alive as long as any returned array is."""

    def __init__(self, lib, handle):
        self._lib = lib
        self._handle = handle

    def __del__(self):
        if self._handle:
            self._lib.iins_cache_close(self._handle)
            self._handle = None


def read_cache(path: str) -> Optional[Dict[str, np.ndarray]]:
    """mmap ``path`` -> {name: array} (zero-copy views), or None on miss."""
    if not os.path.exists(path):
        return None
    lib = _lib()
    if lib is None or os.path.isdir(path):  # fallback layout
        if not os.path.isdir(path):
            return None
        out = {}
        for f in os.listdir(path):
            if f.endswith(".npy"):
                out[f[:-4]] = np.load(os.path.join(path, f), mmap_mode="r")
        return out or None
    handle = lib.iins_cache_open(path.encode())
    if not handle:
        return None
    owner = _MappedCache(lib, handle)
    out = {}
    # any surprise in a record (the C plane validates bounds/dtypes at open;
    # this guards e.g. non-UTF8 name bytes in a corrupt-but-in-bounds file)
    # is a cache MISS — the caller transparently rebuilds
    try:
        for i in range(lib.iins_cache_count(handle)):
            name = ctypes.create_string_buffer(16)
            dtype = _i64()
            ndim = _i64()
            dims = (ctypes.c_int64 * 4)()
            ptr = lib.iins_cache_array(handle, i, name, ctypes.byref(dtype),
                                       ctypes.byref(ndim), dims)
            if not ptr:
                return None
            np_dtype = np.dtype(_DTYPES[dtype.value])
            shape = tuple(dims[d] for d in range(ndim.value))
            nbytes = int(np.prod(shape)) * np_dtype.itemsize
            buf = (ctypes.c_char * max(nbytes, 1)).from_address(ptr)
            # pin the mapping's lifetime to the buffer the array will .base on
            buf._iins_cache_owner = owner
            arr = np.frombuffer(buf, dtype=np_dtype, count=int(np.prod(shape)))
            arr = arr.reshape(shape)
            arr.flags.writeable = False
            out[name.value.decode()] = arr
    except Exception:
        return None
    return out
