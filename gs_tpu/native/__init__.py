"""Native (C++) runtime components, loaded via ctypes.

The reference keeps its hot loaders in C++/CUDA; here the TPU compute path is
Pallas/XLA, and the host-side loader hot path (COLMAP binary parsing, a
per-record Python struct loop in the reference, scene/colmap_loader.py:125-242)
is C++ compiled on first use. Every native entry point has a pure-Python
fallback, so the framework works without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "_build")
_SOURCES = ["colmap_io.cpp"]
_SONAME = "libgs_native.so"


def build(verbose: bool = False) -> str:
    """Compile the native library (g++ -O2 -shared -fPIC). Returns .so path."""
    os.makedirs(_BUILD_DIR, exist_ok=True)
    so_path = os.path.join(_BUILD_DIR, _SONAME)
    srcs = [os.path.abspath(os.path.join(_SRC_DIR, s)) for s in _SOURCES]
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= newest_src:
        return so_path
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           "-o", so_path] + srcs
    if verbose:
        print("[gs_tpu.native]", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=not verbose)
    return so_path


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            lib = ctypes.CDLL(build())
        except Exception as e:  # no compiler / build failure -> fallback
            print(f"[gs_tpu.native] native build unavailable ({e}); "
                  "using pure-Python loaders", file=sys.stderr)
            return None
        lib.gs_free.argtypes = [ctypes.c_void_p]
        lib.gs_read_points3d_bin.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double))]
        lib.gs_read_images_bin.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.c_int64)]
        lib.gs_read_cameras_bin.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32))]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def _copy_free(lib, ptr, shape, nptype):
    arr = np.ctypeslib.as_array(ptr, shape=shape).copy()
    lib.gs_free(ptr)
    return arr.astype(nptype, copy=False)


def read_points3d_bin(path: str):
    """(xyz [N,3] f64, rgb [N,3] u8, err [N,1] f64) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    n = ctypes.c_int64()
    xyz = ctypes.POINTER(ctypes.c_double)()
    rgb = ctypes.POINTER(ctypes.c_uint8)()
    err = ctypes.POINTER(ctypes.c_double)()
    rc = lib.gs_read_points3d_bin(path.encode(), ctypes.byref(n),
                                  ctypes.byref(xyz), ctypes.byref(rgb),
                                  ctypes.byref(err))
    if rc != 0:
        raise IOError(f"gs_read_points3d_bin({path}) failed with code {rc}")
    count = n.value
    return (_copy_free(lib, xyz, (count, 3), np.float64),
            _copy_free(lib, rgb, (count, 3), np.uint8),
            _copy_free(lib, err, (count, 1), np.float64))


def read_images_bin(path: str):
    """list of dicts {id, qvec, tvec, camera_id, name} or None."""
    lib = _load()
    if lib is None:
        return None
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    n = ctypes.c_int64()
    ids = ctypes.POINTER(ctypes.c_int32)()
    qvecs = ctypes.POINTER(ctypes.c_double)()
    tvecs = ctypes.POINTER(ctypes.c_double)()
    cam_ids = ctypes.POINTER(ctypes.c_int32)()
    names = ctypes.c_char_p()
    name_off = ctypes.POINTER(ctypes.c_int64)()
    names_len = ctypes.c_int64()
    rc = lib.gs_read_images_bin(path.encode(), ctypes.byref(n),
                                ctypes.byref(ids), ctypes.byref(qvecs),
                                ctypes.byref(tvecs), ctypes.byref(cam_ids),
                                ctypes.byref(names), ctypes.byref(name_off),
                                ctypes.byref(names_len))
    if rc != 0:
        raise IOError(f"gs_read_images_bin({path}) failed with code {rc}")
    count = n.value
    ids_a = _copy_free(lib, ids, (count,), np.int32)
    q_a = _copy_free(lib, qvecs, (count, 4), np.float64)
    t_a = _copy_free(lib, tvecs, (count, 3), np.float64)
    c_a = _copy_free(lib, cam_ids, (count,), np.int32)
    off_a = np.ctypeslib.as_array(name_off, shape=(count + 1,)).copy()
    blob = ctypes.string_at(names, names_len.value)
    lib.gs_free(name_off)
    lib.gs_free(ctypes.cast(names, ctypes.c_void_p))
    out = []
    for i in range(count):
        out.append(dict(
            id=int(ids_a[i]), qvec=q_a[i], tvec=t_a[i],
            camera_id=int(c_a[i]),
            name=blob[off_a[i]:off_a[i + 1]].decode("utf-8")))
    return out


def read_cameras_bin(path: str):
    """list of dicts {id, model_id, width, height, params} or None."""
    lib = _load()
    if lib is None:
        return None
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    n = ctypes.c_int64()
    ids = ctypes.POINTER(ctypes.c_int32)()
    models = ctypes.POINTER(ctypes.c_int32)()
    wh = ctypes.POINTER(ctypes.c_int64)()
    params = ctypes.POINTER(ctypes.c_double)()
    pcounts = ctypes.POINTER(ctypes.c_int32)()
    rc = lib.gs_read_cameras_bin(path.encode(), ctypes.byref(n),
                                 ctypes.byref(ids), ctypes.byref(models),
                                 ctypes.byref(wh), ctypes.byref(params),
                                 ctypes.byref(pcounts))
    if rc != 0:
        raise IOError(f"gs_read_cameras_bin({path}) failed with code {rc}")
    count = n.value
    ids_a = _copy_free(lib, ids, (count,), np.int32)
    m_a = _copy_free(lib, models, (count,), np.int32)
    wh_a = _copy_free(lib, wh, (count, 2), np.int64)
    pc_a = _copy_free(lib, pcounts, (count,), np.int32)
    total = int(pc_a.sum())
    p_a = _copy_free(lib, params, (total,), np.float64)
    out = []
    off = 0
    for i in range(count):
        k = int(pc_a[i])
        out.append(dict(id=int(ids_a[i]), model_id=int(m_a[i]),
                        width=int(wh_a[i, 0]), height=int(wh_a[i, 1]),
                        params=p_a[off:off + k]))
        off += k
    return out
