"""ctypes bindings to the native I/O runtime (native/animio.cpp).

The shared library is built on demand with the repo Makefile (g++ is part of
the target image); every entry point has a pure-Python fallback, so the
package works without a toolchain.  Use :func:`available` to check.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libanimio.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.anim_off_counts.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        lib.anim_load_off.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32)]
        lib.anim_load_off_sequence.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int]
        lib.anim_write_components_bin.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        lib.anim_read_components_bin.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        lib.anim_write_vector_bin.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int32]
        lib.anim_read_vector_bin.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int32]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def off_counts(path: str):
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.anim_off_counts(path.encode(), ctypes.byref(nv),
                             ctypes.byref(nf))
    if rc != 0:
        raise IOError(f"anim_off_counts({path}) failed rc={rc}")
    return int(nv.value), int(nf.value)


def load_off(path: str):
    """Native OFF reader: returns (verts (n,3) f64, faces (m,3) i64)."""
    lib = _load()
    if lib is None:
        from animsnapbases_tpu.io.meshes import load_off as py_load
        return py_load(path)
    nv, nf = off_counts(path)
    verts = np.empty((nv, 3), dtype=np.float64)
    faces = np.empty((nf, 3), dtype=np.int32)
    rc = lib.anim_load_off(path.encode(), nv, nf, _dptr(verts), _iptr(faces))
    if rc != 0:
        raise IOError(f"anim_load_off({path}) failed rc={rc}")
    return verts, faces.astype(np.int64)


def load_off_sequence(paths: list[str], n_threads: int = 0):
    """Thread-pooled batch OFF loader: all frames must share topology.
    Returns (verts (F, n, 3) f64, faces (m, 3) i64).  Falls back to a
    sequential Python loop without the native lib."""
    lib = _load()
    if lib is None:
        from animsnapbases_tpu.io.meshes import load_off as py_load
        frames = [py_load(p) for p in paths]
        return (np.stack([v for v, _ in frames]),
                np.asarray(frames[0][1], dtype=np.int64))
    nv, nf = off_counts(paths[0])
    F = len(paths)
    verts = np.empty((F, nv, 3), dtype=np.float64)
    faces = np.empty((nf, 3), dtype=np.int32)
    joined = "\n".join(paths).encode()
    rc = lib.anim_load_off_sequence(joined, F, nv, nf, _dptr(verts),
                                    _iptr(faces), n_threads)
    if rc != 0:
        raise IOError(f"anim_load_off_sequence failed rc={rc}")
    return verts, faces.astype(np.int64)


def write_components_bin(path: str, bases: np.ndarray):
    lib = _load()
    if lib is None:
        from animsnapbases_tpu.io.binfmt import write_components_bin as py
        return py(path, bases)
    bases = np.ascontiguousarray(bases, dtype=np.float64)
    K, N, dim = bases.shape
    rc = lib.anim_write_components_bin(path.encode(), _dptr(bases), K, N, dim)
    if rc != 0:
        raise IOError(f"anim_write_components_bin({path}) rc={rc}")


def read_components_bin(path: str, K: int, N: int, dim: int = 3):
    lib = _load()
    if lib is None:
        from animsnapbases_tpu.io.binfmt import read_components_bin as py
        return py(path, K=K, dim=dim)
    out = np.empty((K, N, dim), dtype=np.float64)
    rc = lib.anim_read_components_bin(path.encode(), _dptr(out), K, N, dim)
    if rc != 0:
        raise IOError(f"anim_read_components_bin({path}) rc={rc}")
    return out


def write_vector_bin(path: str, v: np.ndarray):
    lib = _load()
    if lib is None:
        from animsnapbases_tpu.io.binfmt import write_masses_bin as py
        return py(path, v)
    v = np.ascontiguousarray(v, dtype=np.float64)
    rc = lib.anim_write_vector_bin(path.encode(), _dptr(v), len(v))
    if rc != 0:
        raise IOError(f"anim_write_vector_bin({path}) rc={rc}")


def read_vector_bin(path: str, n: int):
    lib = _load()
    if lib is None:
        from animsnapbases_tpu.io.binfmt import read_masses_bin as py
        return py(path)
    out = np.empty(n, dtype=np.float64)
    rc = lib.anim_read_vector_bin(path.encode(), _dptr(out), n)
    if rc != 0:
        raise IOError(f"anim_read_vector_bin({path}) rc={rc}")
    return out
