"""Native host-side components (C, ctypes-loaded, built on demand).

The TPU compute path is JAX/Pallas; the host runtime around it (byte-stream
codes, container tooling) has native implementations here, mirroring the
reference's split between C++ kernels and Python glue.  Builds with the
system C compiler on first use and caches the shared object next to the
source; every entry point has a pure-Python fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_and_load():
    src = os.path.join(os.path.dirname(__file__), "host_codecs.c")
    out = os.path.join(os.path.dirname(__file__), "_host_codecs.so")
    if not os.path.exists(out) or (
            os.path.getmtime(out) < os.path.getmtime(src)):
        for cc in ("cc", "gcc", "clang"):
            try:
                subprocess.run(
                    [cc, "-O2", "-shared", "-fPIC", src, "-o", out],
                    check=True, capture_output=True, timeout=120)
                break
            except (OSError, subprocess.SubprocessError):
                continue
        else:
            return None
    lib = ctypes.CDLL(out)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.rlg_encode.restype = ctypes.c_long
    lib.rlg_encode.argtypes = [c_i32p, ctypes.c_long, c_u8p, ctypes.c_long]
    lib.rlg_decode.restype = ctypes.c_long
    lib.rlg_decode.argtypes = [c_u8p, ctypes.c_long, c_i32p, ctypes.c_long]
    lib.rl_encode.restype = ctypes.c_long
    lib.rl_encode.argtypes = [
        c_i32p, ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        c_u8p, ctypes.c_long]
    lib.rl_decode.restype = ctypes.c_long
    lib.rl_decode.argtypes = [
        c_u8p, ctypes.c_long, c_i32p, ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_int]
    return lib


def get_lib():
    """Returns the loaded native library, or None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _TRIED = True
            try:
                _LIB = _build_and_load()
            except Exception:
                _LIB = None
    return _LIB


_PMF_LIB = None
_PMF_TRIED = False


def _build_and_load_pmf():
    src = os.path.join(os.path.dirname(__file__), "pmf_quantizer.cc")
    out = os.path.join(os.path.dirname(__file__), "_pmf_quantizer.so")
    if not os.path.exists(out) or (
            os.path.getmtime(out) < os.path.getmtime(src)):
        # Must be libstdc++'s std::sort: equal-key order is the contract.
        for cc in ("g++", "c++"):
            try:
                subprocess.run(
                    [cc, "-O2", "-std=c++17", "-shared", "-fPIC", src,
                     "-o", out],
                    check=True, capture_output=True, timeout=120)
                break
            except (OSError, subprocess.SubprocessError):
                continue
        else:
            return None
    lib = ctypes.CDLL(out)
    lib.pmf_to_quantized_cdf.restype = ctypes.c_int
    lib.pmf_to_quantized_cdf.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32)]
    return lib


def get_pmf_lib():
    """Returns the native PMF quantizer library, or None if unavailable."""
    global _PMF_LIB, _PMF_TRIED
    with _LOCK:
        if not _PMF_TRIED:
            _PMF_TRIED = True
            try:
                _PMF_LIB = _build_and_load_pmf()
            except Exception:
                _PMF_LIB = None
    return _PMF_LIB

_RC_LIB = None
_RC_TRIED = False


def _build_and_load_rc():
    src = os.path.join(os.path.dirname(__file__), "range_coder.cc")
    out = os.path.join(os.path.dirname(__file__), "_range_coder.so")
    if not os.path.exists(out) or (
            os.path.getmtime(out) < os.path.getmtime(src)):
        for cc in ("g++", "c++"):
            try:
                subprocess.run(
                    [cc, "-O2", "-std=c++17", "-shared", "-fPIC",
                     "-pthread", src, "-o", out],
                    check=True, capture_output=True, timeout=120)
                break
            except (OSError, subprocess.SubprocessError):
                continue
        else:
            return None
    lib = ctypes.CDLL(out)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.ctpu_encode_streams.restype = ctypes.c_int
    lib.ctpu_encode_streams.argtypes = [
        c_i32p, c_i32p, ctypes.c_int64, ctypes.c_int64,
        c_i32p, c_i32p, c_i32p, c_u8p, ctypes.c_int64, ctypes.c_int64,
        c_u8p, ctypes.c_int64, c_i32p, ctypes.c_int]
    lib.ctpu_decode_streams.restype = ctypes.c_int
    lib.ctpu_decode_streams.argtypes = [
        c_u8p, c_i32p, ctypes.c_int64, c_i32p,
        ctypes.c_int64, ctypes.c_int64,
        c_i32p, c_i32p, c_i32p, c_u8p, ctypes.c_int64, ctypes.c_int64,
        c_i32p, c_u8p, ctypes.c_int]
    return lib


def get_range_coder_lib():
    """Returns the native host range-coder library, or None."""
    global _RC_LIB, _RC_TRIED
    with _LOCK:
        if not _RC_TRIED:
            _RC_TRIED = True
            try:
                _RC_LIB = _build_and_load_rc()
            except Exception:
                _RC_LIB = None
    return _RC_LIB
