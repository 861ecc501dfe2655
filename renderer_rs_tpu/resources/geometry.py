"""Host-side geometry conditioning: tangents, normals, welding.

Thin ctypes facade over native/libgeometry.so (C++; see native/geometry.cpp)
with numpy fallbacks, so the loader works everywhere and goes fast where the
native library is built. The library auto-builds on first use if a compiler
is available (`make -C native`).

Used by the loader when a glTF primitive lacks TANGENT/NORMAL accessors —
upgrading the reference's constant defaults (model.rs:163-197) to real
generated tangent frames (required for correct normal mapping).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger("renderer_rs_tpu.resources.geometry")

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libgeometry.so"))
_lib = None
_lib_tried = False


def _load_library():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except (OSError, subprocess.SubprocessError) as e:
            log.info("native geometry library unavailable (%s); numpy fallback", e)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        log.info("failed to load %s (%s); numpy fallback", _LIB_PATH, e)
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.compute_tangents.argtypes = [
        f32p, f32p, f32p, u32p, ctypes.c_int64, ctypes.c_int64, f32p
    ]
    lib.compute_tangents.restype = None
    lib.compute_normals.argtypes = [f32p, u32p, ctypes.c_int64, ctypes.c_int64, f32p]
    lib.compute_normals.restype = None
    lib.weld_vertices.argtypes = [f32p, ctypes.c_int64, ctypes.c_float, u32p]
    lib.weld_vertices.restype = ctypes.c_int64
    _lib = lib
    log.debug("native geometry library loaded: %s", _LIB_PATH)
    return _lib


def _f32(a):
    return np.ascontiguousarray(a, np.float32)


def _u32(a):
    return np.ascontiguousarray(a, np.uint32)


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def compute_tangents(positions, normals, uvs, indices) -> np.ndarray:
    """Per-vertex tangents [N,4] (xyz + handedness w) via Lengyel's method."""
    positions = _f32(positions)
    normals = _f32(normals)
    uvs = _f32(uvs)
    indices = _u32(indices)
    n = positions.shape[0]
    lib = _load_library()
    if lib is not None:
        out = np.empty((n, 4), np.float32)
        lib.compute_tangents(
            _ptr(positions, ctypes.c_float),
            _ptr(normals, ctypes.c_float),
            _ptr(uvs, ctypes.c_float),
            _ptr(indices, ctypes.c_uint32),
            n,
            indices.size,
            _ptr(out, ctypes.c_float),
        )
        return out
    return _compute_tangents_np(positions, normals, uvs, indices)


def compute_normals(positions, indices) -> np.ndarray:
    """Area-weighted vertex normals [N,3]."""
    positions = _f32(positions)
    indices = _u32(indices)
    n = positions.shape[0]
    lib = _load_library()
    if lib is not None:
        out = np.empty((n, 3), np.float32)
        lib.compute_normals(
            _ptr(positions, ctypes.c_float),
            _ptr(indices, ctypes.c_uint32),
            n,
            indices.size,
            _ptr(out, ctypes.c_float),
        )
        return out
    return _compute_normals_np(positions, indices)


def weld_vertices(positions, eps: float = 1e-6) -> tuple[np.ndarray, int]:
    """Quantized position welding: returns (remap [N] uint32, unique_count)."""
    positions = _f32(positions)
    n = positions.shape[0]
    lib = _load_library()
    if lib is not None:
        remap = np.empty(n, np.uint32)
        unique = lib.weld_vertices(
            _ptr(positions, ctypes.c_float), n, ctypes.c_float(eps),
            _ptr(remap, ctypes.c_uint32),
        )
        return remap, int(unique)
    return _weld_vertices_np(positions, eps)


# --- numpy fallbacks (reference semantics for tests) ---------------------------

def _compute_tangents_np(positions, normals, uvs, indices) -> np.ndarray:
    n = positions.shape[0]
    tri = indices.reshape(-1, 3)
    p0, p1, p2 = positions[tri[:, 0]], positions[tri[:, 1]], positions[tri[:, 2]]
    w0, w1, w2 = uvs[tri[:, 0]], uvs[tri[:, 1]], uvs[tri[:, 2]]
    e1, e2 = p1 - p0, p2 - p0
    du1, dv1 = w1[:, 0] - w0[:, 0], w1[:, 1] - w0[:, 1]
    du2, dv2 = w2[:, 0] - w0[:, 0], w2[:, 1] - w0[:, 1]
    det = du1 * dv2 - du2 * dv1
    ok = np.abs(det) >= 1e-12
    r = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)[:, None]
    T = (dv2[:, None] * e1 - dv1[:, None] * e2) * r
    B = (du1[:, None] * e2 - du2[:, None] * e1) * r
    tan = np.zeros((n, 3), np.float32)
    bit = np.zeros((n, 3), np.float32)
    for k in range(3):
        np.add.at(tan, tri[:, k], T)
        np.add.at(bit, tri[:, k], B)
    ndott = np.sum(normals * tan, axis=-1, keepdims=True)
    t = tan - normals * ndott
    ln = np.linalg.norm(t, axis=-1, keepdims=True)
    degenerate = ln[:, 0] < 1e-12
    t = np.where(degenerate[:, None], np.array([1.0, 0.0, 0.0], np.float32), t / np.maximum(ln, 1e-12))
    hand = np.where(
        np.sum(np.cross(normals, t) * bit, axis=-1) < 0.0, -1.0, 1.0
    ).astype(np.float32)
    hand = np.where(degenerate, 1.0, hand)
    return np.concatenate([t, hand[:, None]], axis=-1).astype(np.float32)


def _compute_normals_np(positions, indices) -> np.ndarray:
    n = positions.shape[0]
    tri = indices.reshape(-1, 3)
    p0, p1, p2 = positions[tri[:, 0]], positions[tri[:, 1]], positions[tri[:, 2]]
    c = np.cross(p1 - p0, p2 - p0)
    out = np.zeros((n, 3), np.float32)
    for k in range(3):
        np.add.at(out, tri[:, k], c)
    ln = np.linalg.norm(out, axis=-1, keepdims=True)
    return np.where(
        ln < 1e-12, np.array([0.0, 1.0, 0.0], np.float32), out / np.maximum(ln, 1e-12)
    ).astype(np.float32)


def _weld_vertices_np(positions, eps) -> tuple[np.ndarray, int]:
    if eps <= 0.0:
        return np.arange(positions.shape[0], dtype=np.uint32), positions.shape[0]
    q = np.round(positions / eps).astype(np.int64)
    _, first_idx, inverse = np.unique(
        q, axis=0, return_index=True, return_inverse=True
    )
    # renumber unique cells by first appearance to match the native library
    order = np.argsort(first_idx, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(order.size)
    remap = rank[inverse].astype(np.uint32)
    return remap, int(order.size)
