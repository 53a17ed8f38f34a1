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
                    "-O3", "-march=native", "-ffp-contract=off", "-fopenmp",
                    "-fPIC", "-std=c++17", "-shared",
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
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    if hasattr(lib, "rdy_sort_fold"):
        lib.rdy_sort_fold.restype = None
        lib.rdy_sort_fold.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i64p, i64p, i64p,
            i64p, i64p, i64p,
        ]
    if hasattr(lib, "rdy_fill_slot_planes"):
        lib.rdy_fill_slot_planes.restype = None
        lib.rdy_fill_slot_planes.argtypes = (
            [ctypes.c_int64] * 4
            + [i64p, i64p, i64p, f64p, f64p, f64p, f64p, f64p, f64p,
               i64p, i64p, i64p, i64p, i64p]
            + [i8p] * 6
            + [f32p] * 3
            + [i32p, i64p, i64p, i32p]
        )
    if hasattr(lib, "rdy_cell_side_filter"):
        lib.rdy_cell_side_filter.restype = ctypes.c_int64
        lib.rdy_cell_side_filter.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i64p, i64p, f64p, i64p,
            i64p, i64p, f64p,
        ]
    if hasattr(lib, "rdy_coef_extract"):
        lib.rdy_coef_extract.restype = None
        lib.rdy_coef_extract.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i64p, f64p, i64p, i64p, f64p, f64p,
        ]
    if hasattr(lib, "rdy_remap_ce"):
        lib.rdy_remap_ce.restype = None
        lib.rdy_remap_ce.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i64p, ctypes.c_int64, i64p,
            i64p,
        ]
    if hasattr(lib, "rdy_cell_side_stats"):
        lib.rdy_cell_side_stats.restype = ctypes.c_int64
        lib.rdy_cell_side_stats.argtypes = [
            ctypes.c_int64, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
            i64p, i64p, i64p,
        ]
    if hasattr(lib, "rdy_cell_side_fill"):
        lib.rdy_cell_side_fill.restype = None
        lib.rdy_cell_side_fill.argtypes = [
            ctypes.c_int64, i64p, i64p, i64p, f64p, i64p, i64p,
            ctypes.c_int64, ctypes.c_int64, i8p, f32p, i8p, i32p, i64p,
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


def sort_fold(il_i, ir_i, bl):
    """Native stable argsort of the interior + boundary-pseudo edge set by
    min(il, ir) (the slotted plan's canonical edge order), emitting the
    sorted il/ir alongside the permutation. bl: boundary left cells (il ==
    ir == bl pseudo-edges) or None. Returns (order, il_sorted, ir_sorted)
    or None. Cell ids must fit uint32 (the reference's largest mesh,
    184.5M cells, does)."""
    lib = _load()
    if lib is None or not hasattr(lib, "rdy_sort_fold"):
        return None
    c64 = lambda a: np.ascontiguousarray(a, dtype=np.int64)
    il_i, ir_i = c64(il_i), c64(ir_i)
    blc = c64(bl) if bl is not None else np.zeros(1, np.int64)
    Eb = len(bl) if bl is not None else 0
    E = len(il_i) + Eb
    order = np.empty(E, np.int64)
    il_s = np.empty(E, np.int64)
    ir_s = np.empty(E, np.int64)
    lib.rdy_sort_fold(len(il_i), Eb, il_i, ir_i, blc, order, il_s, ir_s)
    return order, il_s, ir_s


def fill_slot_planes(Ei, rrows, order, il_s, ir_s, cn_i, sn_i, cc_i,
                     bnd_attrs, slot_row, color, tile_of, ws_tile,
                     supL, supR, m_al, g_al, gi, mi, cn_s, sn_s, cc_s,
                     slot_edge, eposL, eposR):
    """Native one-pass fill of the slot-routed edge-plan planes; bitwise
    twin of the numpy scatters in slotted.build_slotted_plan. il_s/ir_s:
    sorted cells (from sort_fold); per-edge attributes stay split as
    interior [Ei] arrays + bnd_attrs = (cn_b, sn_b, cc_b, btype) or None.
    Output planes must be pre-zeroed. Returns bnd_pos (unified mode) /
    None, or False if the native library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "rdy_fill_slot_planes"):
        return False
    E = len(order)
    c64 = lambda a: np.ascontiguousarray(a, dtype=np.int64)
    cf64 = lambda a: np.ascontiguousarray(a, dtype=np.float64)
    has_bnd = bnd_attrs is not None
    nb = E - Ei if has_bnd else 0
    if has_bnd:
        cn_b, sn_b, cc_b, bt = bnd_attrs
        cn_b, sn_b, cc_b = cf64(cn_b), cf64(sn_b), cf64(cc_b)
        bt = c64(bt)
    else:
        cn_b = sn_b = cc_b = np.zeros(1, np.float64)
        bt = np.zeros(1, np.int64)
    bnd_pos = np.empty(max(nb, 1), np.int32)
    lib.rdy_fill_slot_planes(
        E, Ei, int(has_bnd), rrows,
        c64(order), c64(il_s), c64(ir_s),
        cf64(cn_i), cf64(sn_i), cf64(cc_i), cn_b, sn_b, cc_b, bt,
        c64(slot_row), c64(color), c64(tile_of), c64(ws_tile),
        supL, supR, m_al, g_al, gi, mi, cn_s, sn_s, cc_s,
        slot_edge.reshape(-1), eposL, eposR, bnd_pos,
    )
    return bnd_pos[:nb] if has_bnd else None


def cell_side_filter(cells_sorted, epos, coef, btype_sorted):
    """Native unified-mode side filter: keep edges with btype == 0 or an
    armed coefficient; emits (cells, rows = epos // 128, coef) views.
    btype_sorted None keeps everything (still computes rows natively).
    Returns (cells, rows, coef) or None."""
    lib = _load()
    if lib is None or not hasattr(lib, "rdy_cell_side_filter"):
        return None
    c64 = lambda a: np.ascontiguousarray(a, dtype=np.int64)
    E = len(cells_sorted)
    out_c = np.empty(E, np.int64)
    out_r = np.empty(E, np.int64)
    out_f = np.empty(E, np.float64)
    has_bt = btype_sorted is not None
    n = lib.rdy_cell_side_filter(
        E, int(has_bt), c64(cells_sorted), c64(epos),
        np.ascontiguousarray(coef, dtype=np.float64),
        c64(btype_sorted) if has_bt else np.zeros(1, np.int64),
        out_c, out_r, out_f,
    )
    return out_c[:n], out_r[:n], out_f[:n]


def coef_extract(ce, cec, il_i, bl, E_lim):
    """Native per-edge signed coefficient extraction from the [C, K]
    cell->edge gather maps. Returns (coefL, coefR) [E_lim] or None."""
    lib = _load()
    if lib is None or not hasattr(lib, "rdy_coef_extract"):
        return None
    C, K = ce.shape
    coefL = np.zeros(E_lim, np.float64)
    coefR = np.zeros(E_lim, np.float64)
    Ei = len(il_i)
    lib.rdy_coef_extract(
        C, K, E_lim, Ei,
        np.ascontiguousarray(ce.reshape(-1), dtype=np.int64),
        np.ascontiguousarray(cec.reshape(-1), dtype=np.float64),
        np.ascontiguousarray(il_i, dtype=np.int64),
        np.ascontiguousarray(bl, dtype=np.int64)
        if bl is not None else np.zeros(1, np.int64),
        coefL, coefR,
    )
    return coefL, coefR


def remap_ce(order, Ei, ce):
    """Native cell->edge map remap to the plan's sorted interior order.
    Returns ce_new [C, K] int64 or None."""
    lib = _load()
    if lib is None or not hasattr(lib, "rdy_remap_ce"):
        return None
    ce_flat = np.ascontiguousarray(ce.reshape(-1), dtype=np.int64)
    ce_new = np.empty(ce_flat.shape, np.int64)
    lib.rdy_remap_ce(
        len(order), Ei, np.ascontiguousarray(order, dtype=np.int64),
        len(ce_flat), ce_flat, ce_new,
    )
    return ce_new.reshape(ce.shape)


def cell_side_stats(cells, rows, num_cells, Ct):
    """Native rank-by-row + per-tile row extents for one cell-plan side;
    returns (K, k[n], tlo[Ct], thi[Ct]) or None."""
    lib = _load()
    if lib is None or not hasattr(lib, "rdy_cell_side_stats"):
        return None
    cells = np.ascontiguousarray(cells, dtype=np.int64)
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    n = len(cells)
    k = np.empty(n, np.int64)
    tlo = np.empty(Ct, np.int64)
    thi = np.empty(Ct, np.int64)
    K = lib.rdy_cell_side_stats(n, cells, rows, num_cells, Ct, k, tlo, thi)
    return int(K), k, tlo, thi


def cell_side_fill(cells, rows, k, coef, ws, base_sup, K, Ct,
                   sup_o, cf_o, supk_o):
    """Native per-(k, tile) windows + K-plane scatters for one cell-plan
    side. sup_o/cf_o/supk_o must be pre-zeroed [K, Ct*8, 128]. Returns
    (wk[(K+1)*Ct] int32, nsup_ks tuple) or None."""
    lib = _load()
    if lib is None or not hasattr(lib, "rdy_cell_side_fill"):
        return None
    c64 = lambda a: np.ascontiguousarray(a, dtype=np.int64)
    n = len(cells)
    wk = np.empty((K + 1) * Ct, np.int32)
    nsup_ks = np.empty(K, np.int64)
    lib.rdy_cell_side_fill(
        n, c64(cells), c64(rows), c64(k),
        np.ascontiguousarray(coef, dtype=np.float64), c64(ws),
        c64(base_sup), K, Ct,
        sup_o.reshape(-1), cf_o.reshape(-1), supk_o.reshape(-1),
        wk, nsup_ks,
    )
    return wk, tuple(int(x) for x in nsup_ks)


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
