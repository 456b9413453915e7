"""ctypes binding to the native C++ scanner (``native/libsqscan.so``).

The reference's bulk data generation forked one C++ process per image
(150k ``./scanner`` invocations, ``gen_rand_rot.py:14-33``). The native
library renders batches in-process with OpenMP across cores; this is the
host-side (CPU) data path — the primary path renders on TPU
(:mod:`sqtpu.data.synthetic`).

Build with ``make -C native`` (g++; no external deps). Python<->C++ is
ctypes per the environment constraints (no pybind11).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libsqscan.so"))
_lib = None


def ensure_built(rebuild: bool = False) -> str:
    """Build libsqscan.so if missing; returns its path."""
    if rebuild or not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True)
    return _LIB_PATH


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(ensure_built())
        lib.sq_render_depth.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.sq_render_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.sq_write_bmp.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int]
        lib.sq_write_bmp.restype = ctypes.c_int
        _lib = lib
    return _lib


def _to_world(params12: np.ndarray) -> np.ndarray:
    """Normalized 12-vector [a,e,t,q] -> world-unit 17-vector
    [a*255, e, t*255, R.ravel()]."""
    from sqtpu.ops import quaternion as quat
    import jax.numpy as jnp

    p = np.asarray(params12, dtype=np.float64)
    q = p[..., 8:12]
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    R = np.asarray(quat.to_matrix(jnp.asarray(q)))
    flat_r = R.reshape(p.shape[:-1] + (9,))
    return np.concatenate(
        [p[..., 0:3] * 255.0, p[..., 3:5], p[..., 5:8] * 255.0, flat_r],
        axis=-1)


def render_depth_native(params12: np.ndarray, size: int = 256,
                        n_sweep: int | None = None,
                        n_bisect: int = 30) -> np.ndarray:
    """Render one (size, size) uint8 depth map from a normalized 12-vector."""
    lib = _load()
    world = np.ascontiguousarray(_to_world(params12), dtype=np.float64)
    out = np.empty((size, size), dtype=np.uint8)
    lib.sq_render_depth(
        world.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        size, n_sweep or size, n_bisect)
    return out


def render_batch_native(params12: np.ndarray, size: int = 256,
                        n_sweep: int = 64, n_bisect: int = 20) -> np.ndarray:
    """Render (N, size, size) uint8 depth maps, OpenMP-parallel."""
    lib = _load()
    world = np.ascontiguousarray(_to_world(params12), dtype=np.float64)
    n = world.shape[0]
    out = np.empty((n, size, size), dtype=np.uint8)
    lib.sq_render_batch(
        world.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, size, n_sweep, n_bisect)
    return out


def write_bmp_native(path: str, img: np.ndarray) -> None:
    lib = _load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    rc = lib.sq_write_bmp(
        path.encode(), img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w, h)
    if rc != 0:
        raise OSError(f"sq_write_bmp failed for {path}")
