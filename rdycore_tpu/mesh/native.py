"""ctypes bindings for the native mesh builder (csrc/mesh_builder.cpp).

Auto-builds librdymesh.so on first use if a compiler is available; all entry
points have vectorized NumPy fallbacks, so the native library is an
accelerator, not a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "librdymesh.so")
_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
    "mesh_builder.cpp",
)

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(_SRC):
        try:
            subprocess.run(
                [
                    os.environ.get("CXX", "g++"),
                    "-O3", "-march=native", "-fPIC", "-std=c++17", "-shared",
                    "-o", _LIB_PATH, _SRC,
                ],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.rdy_extract_edges.restype = ctypes.c_int64
    lib.rdy_extract_edges.argtypes = [
        ctypes.c_int64, ctypes.c_int64, i32p, i32p, i32p, i32p, i32p, i32p,
    ]
    lib.rdy_rcm_order.restype = None
    lib.rdy_rcm_order.argtypes = [ctypes.c_int64, ctypes.c_int64, i32p, i32p, i32p]
    lib.rdy_block_halos.restype = None
    lib.rdy_block_halos.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        i32p, i32p, i32p, i64p,
    ]
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    if hasattr(lib, "rdy_cell_geometry"):
        lib.rdy_cell_geometry.restype = None
        lib.rdy_cell_geometry.argtypes = [
            ctypes.c_int64, f64p, i32p, i32p,
            f64p, f64p, f64p, f64p, f64p, f64p, f64p,
        ]
    if hasattr(lib, "rdy_slot_pack"):
        lib.rdy_slot_pack.restype = ctypes.c_int64
        lib.rdy_slot_pack.argtypes = [
            ctypes.c_int64, i64p, i64p, ctypes.c_int64,
            i64p, i64p, i64p, i64p, i64p,
        ]
    if hasattr(lib, "rdy_slot_pack_rc"):
        lib.rdy_slot_pack_rc.restype = ctypes.c_int64
        lib.rdy_slot_pack_rc.argtypes = [
            ctypes.c_int64, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
            i64p, i64p, i64p, i64p, i64p,
        ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def cell_geometry(points, cell_vertices, cell_num_vertices):
    """Native cell areas/centroids/slopes/vertex-avg elevation; bitwise
    twin of the NumPy geometry passes in mesh/core.py (same per-cell
    accumulation order, -ffp-contract=off). Returns (area, centroids[C,3],
    dz_dx, dz_dy, cell_z) or None when the library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "rdy_cell_geometry"):
        return None
    C = cell_vertices.shape[0]
    pts = np.ascontiguousarray(points, dtype=np.float64)
    cv = np.ascontiguousarray(cell_vertices, dtype=np.int32)
    nv = np.ascontiguousarray(cell_num_vertices, dtype=np.int32)
    area = np.empty(C, np.float64)
    cx = np.empty(C, np.float64)
    cy = np.empty(C, np.float64)
    cz = np.empty(C, np.float64)
    dzdx = np.empty(C, np.float64)
    dzdy = np.empty(C, np.float64)
    cellz = np.empty(C, np.float64)
    lib.rdy_cell_geometry(C, pts, cv, nv, area, cx, cy, cz, dzdx, dzdy,
                          cellz)
    return area, np.stack([cx, cy, cz], axis=1), dzdx, dzdy, cellz


def extract_edges(
    num_points: int, cell_vertices: np.ndarray, cell_num_vertices: np.ndarray
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Native edge extraction; returns (left, right, lslot, rslot) or None."""
    lib = _load()
    if lib is None:
        return None
    C = cell_vertices.shape[0]
    cv = np.ascontiguousarray(cell_vertices, dtype=np.int32)
    nv = np.ascontiguousarray(cell_num_vertices, dtype=np.int32)
    cap = 4 * C
    left = np.empty(cap, np.int32)
    right = np.empty(cap, np.int32)
    lslot = np.empty(cap, np.int32)
    rslot = np.empty(cap, np.int32)
    n = lib.rdy_extract_edges(C, num_points, cv, nv, left, right, lslot, rslot)
    if n < 0:
        raise ValueError("non-manifold mesh: an edge is shared by >2 cells")
    return left[:n], right[:n], lslot[:n], rslot[:n]


def slot_pack(
    il: np.ndarray, ir: np.ndarray, max_sup: int, rcap: int = 16
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]]:
    """Native one-pass slot packing/coloring for the slotted Pallas plan.

    rcap caps the per-tile color count (the R-layout row height).
    Returns (slot_row, color, tile_of, ws_rows[ntiles], need_sup), raises
    ValueError when the mesh bandwidth exceeds the window budget, or
    returns None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    has_rc = hasattr(lib, "rdy_slot_pack_rc")
    if not has_rc and (rcap != 16 or not hasattr(lib, "rdy_slot_pack")):
        return None  # older .so: only the 16-color entry point
    E = len(il)
    il = np.ascontiguousarray(il, dtype=np.int64)
    ir = np.ascontiguousarray(ir, dtype=np.int64)
    slot_row = np.empty(E, np.int64)
    color = np.empty(E, np.int64)
    tile_of = np.empty(E, np.int64)
    ws_rows = np.empty(E, np.int64)
    need_sup = np.empty(1, np.int64)
    if has_rc:
        ntiles = lib.rdy_slot_pack_rc(
            E, il, ir, max_sup, rcap, slot_row, color, tile_of, ws_rows,
            need_sup,
        )
    else:
        ntiles = lib.rdy_slot_pack(
            E, il, ir, max_sup, slot_row, color, tile_of, ws_rows, need_sup
        )
    if ntiles < 0:
        raise ValueError("bandwidth exceeds window budget")
    return slot_row, color, tile_of, ws_rows[:ntiles], int(need_sup[0])


def rcm_order(
    num_cells: int, edge_left: np.ndarray, edge_right: np.ndarray
) -> Optional[np.ndarray]:
    """Native RCM ordering; returns perm (new order: old cell ids) or None."""
    lib = _load()
    if lib is None:
        return None
    el = np.ascontiguousarray(edge_left, dtype=np.int32)
    er = np.ascontiguousarray(edge_right, dtype=np.int32)
    perm = np.empty(num_cells, np.int32)
    lib.rdy_rcm_order(num_cells, len(el), el, er, perm)
    return perm
