"""ctypes binding for the native host-IO runtime (ft2io.cpp).

Builds the shared library on first use (g++ -O3, zlib, pthreads) into this
package directory and caches it; every entry point degrades gracefully to
``None``/False when no compiler or zlib is available, so pure-Python
fallbacks in core.nifti / utils.dicom keep working anywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ft2io.cpp")
_SO = os.path.join(_DIR, "libft2io.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
           "-o", _SO, _SRC, "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("FT2_DISABLE_NATIVE"):
            return None
        have_src = os.path.exists(_SRC)
        src_newer = (have_src and os.path.exists(_SO)
                     and os.path.getmtime(_SRC) > os.path.getmtime(_SO))
        if not os.path.exists(_SO) or src_newer:
            if not have_src or not _build():
                return None  # prebuilt-.so-only deployments still load below
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.ft2_read_file.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_uint64)]
        lib.ft2_read_file.restype = ctypes.c_int
        lib.ft2_read_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32]
        lib.ft2_read_batch.restype = ctypes.c_int
        lib.ft2_write_file.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_uint64, ctypes.c_int32]
        lib.ft2_write_file.restype = ctypes.c_int
        lib.ft2_dicom_probe_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.ft2_dicom_probe_batch.restype = ctypes.c_int
        lib.ft2_jpegll_info.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.ft2_jpegll_info.restype = ctypes.c_int
        lib.ft2_jpegll_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_uint64]
        lib.ft2_jpegll_decode.restype = ctypes.c_int
        lib.ft2_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        lib.ft2_free.restype = None
        lib.ft2_version.restype = ctypes.c_char_p
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def version() -> Optional[str]:
    lib = _load()
    return lib.ft2_version().decode() if lib else None


def read_file(path: str) -> Optional[bytes]:
    """gz-transparent read; None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_uint8)()
    ln = ctypes.c_uint64()
    rc = lib.ft2_read_file(os.fsencode(path), ctypes.byref(out), ctypes.byref(ln))
    if rc != 0:
        raise OSError(f"ft2_read_file({path!r}) failed with code {rc}")
    try:
        return ctypes.string_at(out, ln.value)
    finally:
        lib.ft2_free(out)


def read_batch(paths: Sequence[str], n_threads: int = 8) -> Optional[List[bytes]]:
    """Parallel gz-transparent reads; None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    if n == 0:
        return []
    c_paths = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    outs = (ctypes.POINTER(ctypes.c_uint8) * n)()
    lens = (ctypes.c_uint64 * n)()
    errs = (ctypes.c_int32 * n)()
    lib.ft2_read_batch(c_paths, n, outs, lens, errs, n_threads)
    result: List[bytes] = []
    err_path = None
    for i in range(n):
        if errs[i] != 0:
            err_path = err_path or (paths[i], errs[i])
            result.append(b"")
            continue
        result.append(ctypes.string_at(outs[i], lens[i]))
        lib.ft2_free(outs[i])
    if err_path:
        raise OSError(f"ft2_read_batch: {err_path[0]!r} failed with code {err_path[1]}")
    return result


def write_file(path: str, data: bytes, *, gzip_level: Optional[int] = None) -> bool:
    """Write (optionally gzip-compressed); False if native unavailable."""
    lib = _load()
    if lib is None:
        return False
    level = -1 if gzip_level is None else int(gzip_level)
    # no copy: bytes are immutable and pinned for the duration of the call
    buf = ctypes.cast(ctypes.c_char_p(data), ctypes.POINTER(ctypes.c_uint8))
    rc = lib.ft2_write_file(os.fsencode(path), buf, len(data), level)
    if rc != 0:
        raise OSError(f"ft2_write_file({path!r}) failed with code {rc}")
    return True


def jpegll_decode(data: bytes):
    """Decode a T.81 lossless JPEG stream -> uint16/uint8 ndarray.

    Returns None if the native library is unavailable (caller falls back to
    utils.jpegll). Raises ValueError on malformed/unsupported streams so the
    caller can surface one uniform error path.
    """
    lib = _load()
    if lib is None:
        return None
    import numpy as np

    buf = ctypes.cast(ctypes.c_char_p(data), ctypes.POINTER(ctypes.c_uint8))
    rows = ctypes.c_int32()
    cols = ctypes.c_int32()
    comps = ctypes.c_int32()
    prec = ctypes.c_int32()
    rc = lib.ft2_jpegll_info(buf, len(data), ctypes.byref(rows),
                             ctypes.byref(cols), ctypes.byref(comps),
                             ctypes.byref(prec))
    if rc == -11:   # parseable but outside our lossless scope: let the
        return None  # Python fallback produce its specific JpegError
    if rc != 0:
        raise ValueError(f"jpegll: malformed stream (native code {rc})")
    n = rows.value * cols.value * comps.value
    # header dims come from an UNTRUSTED stream: cap the allocation (a
    # crafted 65535x65535x4 header would otherwise np.empty ~34 GB before
    # any pixel is decoded). 2^26 pixels (128 MB) dwarfs any legitimate
    # single DICOM frame.
    if n <= 0 or n > (1 << 26):
        raise ValueError(
            f"jpegll: implausible frame header "
            f"{rows.value}x{cols.value}x{comps.value}")
    out = np.empty(n, np.uint16)
    rc = lib.ft2_jpegll_decode(
        buf, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        n)
    if rc != 0:
        raise ValueError(f"jpegll: decode failed (native code {rc})")
    arr = out.reshape(rows.value, cols.value, comps.value)
    arr = arr[:, :, 0] if comps.value == 1 else arr
    if prec.value <= 8:
        arr = arr.astype(np.uint8)
    return np.ascontiguousarray(arr)


def dicom_probe(paths: Sequence[str], n_threads: int = 8) -> Optional[List[int]]:
    """Part-10 magic probe per path (1 yes / 0 no / -1 unreadable);
    None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    if n == 0:
        return []
    c_paths = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    flags = (ctypes.c_int32 * n)()
    lib.ft2_dicom_probe_batch(c_paths, n, flags, n_threads)
    return list(flags)
