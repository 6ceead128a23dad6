"""ctypes bindings for the native C++ batch submap loader (native/loader.cpp).

Falls back transparently to the numpy path (pointclouds.load_pc_files) when
the shared library is absent; ``ensure_built()`` compiles it on demand with
the in-image g++ toolchain. See native/loader.cpp for why this exists
(GIL-free parallel float64->float32 batch loads for the mining sweep).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libepcnet_loader.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def ensure_built(quiet: bool = True) -> bool:
    """Build the shared library if missing. Returns True if available."""
    global _build_failed
    if os.path.isfile(_LIB_PATH):
        return True
    if _build_failed or not os.path.isfile(os.path.join(_NATIVE_DIR, "loader.cpp")):
        return False
    with _lock:
        if os.path.isfile(_LIB_PATH):
            return True
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=quiet,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            _build_failed = True
            return False
    return os.path.isfile(_LIB_PATH)


def _get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not ensure_built():
        return None
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.epcnet_load_batch.restype = ctypes.c_int64
            lib.epcnet_load_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
            ]
            _lib = lib
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def load_pc_files_native(
    filenames,
    dataset_root: str = "",
    num_points: int = 4096,
    n_threads: int = 8,
    out: np.ndarray | None = None,
) -> np.ndarray:
    """Parallel batch load -> [len(filenames), num_points, 3] float32.

    Falls back to the numpy loader when the native library is unavailable.
    ``out`` may be a preallocated destination (avoids realloc in hot sweeps).
    """
    lib = _get_lib()
    paths = [
        os.path.join(dataset_root, f) if dataset_root else f for f in filenames
    ]
    n = len(paths)
    if out is None:
        out = np.empty((n, num_points, 3), np.float32)
    else:
        assert out.shape == (n, num_points, 3) and out.dtype == np.float32

    if lib is None:
        from epcnet_tpu.data.pointclouds import load_pc_file

        for i, p in enumerate(paths):
            out[i] = load_pc_file(p, num_points=num_points)
        return out

    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.epcnet_load_batch(
        arr,
        n,
        num_points,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    if rc != 0:
        raise IOError(f"native loader failed on {paths[rc - 1]!r}")
    return out
