"""Native host-kernel loader (ctypes).

Compiles famsa_native.cpp on first use (g++ -O3); falls back silently to
the NumPy reference implementations when unavailable or when
FAMSA_TPU_NATIVE=0."""

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_SO = _DIR / "libfamsa_native.so"
_SRC = _DIR / "famsa_native.cpp"

_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
           "-o", str(_SO), str(_SRC)]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("FAMSA_TPU_NATIVE", "1") == "0":
        return None
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_SO))
        _configure(lib)
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _configure(lib):
    i64 = ctypes.c_int64
    p_i8 = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p_u64 = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")

    lib.dp_seq_seq.argtypes = [p_i8, p_i8, i64, i64, p_i64,
                               i64, i64, i64, i64, p_u8, p_i64]
    lib.dp_prof_prof.argtypes = [p_i64, p_i64, i64, i64,
                                 p_i64, p_i64, i64, i64,
                                 i64, i64, i64, i64,
                                 ctypes.c_void_p, p_u8, p_i64]
    lib.slink_update_row.argtypes = [i64, p_f64, p_u64, p_i64, p_f64, p_u64]
    lib.clarans_deltas.argtypes = [p_f32, i64, i64, i64, p_i64,
                                   p_f32, p_f32, p_i64, p_f32]
    lib.clarans_apply_swap.argtypes = [p_f32, i64, i64, i64, i64, p_i64,
                                       p_f32, p_f32, p_i64, p_i64,
                                       ctypes.c_float]
    lib.clarans_apply_swap.restype = ctypes.c_float
    lib.clarans_init.argtypes = [p_f32, i64, i64, p_i64, p_f32, p_f32,
                                 p_i64, p_i64]
    lib.clarans_init.restype = ctypes.c_float
    lib.lcs_batch.argtypes = [p_u64, i64, p_i8, i64, i64, p_i64]
    lib.apply_column_inserts_batch.argtypes = [p_u64, p_i64, i64,
                                               p_i64, p_i64, i64, i64]
    lib.trace_path.argtypes = [p_u8, i64, i64, i64, i64, i64, p_i64, p_i64]
    lib.trace_path.restype = i64


def unpack_dirs(packed):
    """Split the packed 2-bit x3 direction bytes into D/H/V matrices."""
    return ((packed & 3).astype(np.uint8),
            ((packed >> 2) & 3).astype(np.uint8),
            ((packed >> 4) & 3).astype(np.uint8))
