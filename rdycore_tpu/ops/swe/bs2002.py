"""Bradford & Sanders (2002) well-balancing: vertex free-surface eta
pre-operator + edge flux correction.

Mirrors the reference:
- SWEEtaVertex Q-function (swe_well_balancing.h:30-85): per cell, a
  partial-wetting free-surface elevation eta_cell from the SORTED vertex
  elevations z1 <= z2 <= z3 (triangles) and the cell depth h; each vertex
  averages the eta of its adjacent cells (weight 1/num_cells,
  operator_fluxes_ceed.c:798-826)
- flux correction (swe_roe_flux_ceed.h:117-119): with
  dhv = max(eta_end - zv_end, 0) - max(eta_beg - zv_beg, 0)
  the momentum fluxes gain g * dhv^2 / 24 * (cn, sn)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ...constants import GRAVITY


class BS2002Arrays(NamedTuple):
    # per-cell sorted vertex elevations (z1 <= z2 <= z3; quads use first 3,
    # matching operator_fluxes_ceed.c:807-815 which reads 3 vertices)
    z1: jnp.ndarray  # [C]
    z2: jnp.ndarray
    z3: jnp.ndarray
    # vertex -> adjacent cells (padded with C -> dummy)
    vertex_cells: jnp.ndarray  # [NV, K] int32
    vertex_inv_count: jnp.ndarray  # [NV]
    # edge endpoint vertex ids + elevations, operator edge order
    int_vbeg: jnp.ndarray  # [Ei] int32
    int_vend: jnp.ndarray
    int_zvbeg: jnp.ndarray  # [Ei]
    int_zvend: jnp.ndarray
    bnd_vbeg: jnp.ndarray  # [Eb] int32
    bnd_vend: jnp.ndarray
    bnd_zvbeg: jnp.ndarray
    bnd_zvend: jnp.ndarray


def build_bs2002_arrays(mesh, edge_perm, Ei, dtype, return_host=False):
    C = mesh.num_cells
    NV = mesh.num_vertices
    pts_z = mesh.points[:, 2]

    # sorted first-3 vertex elevations per cell
    v3 = np.where(mesh.cell_vertices[:, :3] >= 0, mesh.cell_vertices[:, :3], 0)
    z3 = np.sort(pts_z[v3], axis=1)

    # vertex -> cells adjacency
    lists = [[] for _ in range(NV)]
    for c in range(C):
        nv = int(mesh.cell_num_vertices[c])
        for k in range(nv):
            lists[int(mesh.cell_vertices[c, k])].append(c)
    K = max((len(l) for l in lists), default=1)
    vc = np.full((NV, K), C, dtype=np.int64)
    cnt = np.zeros(NV)
    for v, l in enumerate(lists):
        vc[v, : len(l)] = l
        cnt[v] = max(len(l), 1)

    ev = mesh.edge_vertices[edge_perm]
    f = lambda x: jnp.asarray(x, dtype)
    i32 = lambda x: jnp.asarray(x, jnp.int32)
    if return_host:
        host = dict(
            bs_z1=z3[:, 0],
            bs_z2=z3[:, 1],
            bs_z3=z3[:, 2],
            bs_vertex_cells=vc,
            bs_vertex_count=cnt,
            bs_int_vbeg=np.asarray(ev[:Ei, 0]),
            bs_int_vend=np.asarray(ev[:Ei, 1]),
            bs_int_zvbeg=pts_z[ev[:Ei, 0]],
            bs_int_zvend=pts_z[ev[:Ei, 1]],
            bs_bnd_vbeg=np.asarray(ev[Ei:, 0]),
            bs_bnd_vend=np.asarray(ev[Ei:, 1]),
        )
        return _assemble_bs2002(
            z3, vc, cnt, ev, Ei, pts_z, f, i32
        ), host
    return _assemble_bs2002(z3, vc, cnt, ev, Ei, pts_z, f, i32)


def _assemble_bs2002(z3, vc, cnt, ev, Ei, pts_z, f, i32):
    return BS2002Arrays(
        z1=f(z3[:, 0]),
        z2=f(z3[:, 1]),
        z3=f(z3[:, 2]),
        vertex_cells=i32(vc),
        vertex_inv_count=f(1.0 / cnt),
        int_vbeg=i32(ev[:Ei, 0]),
        int_vend=i32(ev[:Ei, 1]),
        int_zvbeg=f(pts_z[ev[:Ei, 0]]),
        int_zvend=f(pts_z[ev[:Ei, 1]]),
        bnd_vbeg=i32(ev[Ei:, 0]),
        bnd_vend=i32(ev[Ei:, 1]),
        bnd_zvbeg=f(pts_z[ev[Ei:, 0]]),
        bnd_zvend=f(pts_z[ev[Ei:, 1]]),
    )


def eta_cells(z1, z2, z3, h, tiny_h):
    """Per-cell partial-wetting free-surface eta (the elementwise part of
    SWEEtaVertex, swe_well_balancing.h:30-85)."""
    dz31 = z3 - z1
    dz31_safe = jnp.where(dz31 != 0.0, dz31, 1.0)
    h3 = z3 - (z1 + z2 + z3) / 3.0
    h2 = jnp.where(z2 < z3, (z2 - z1) * (z2 - z1) / (3.0 * dz31_safe), h3)

    # wet-bed sub-cases
    all_sub = (z1 + z2 + z3) / 3.0 + h
    one_sub = z1 + jnp.cbrt(jnp.maximum(3.0 * h * (z2 - z1) * dz31, 0.0))
    b = z3 - 3.0 * z1
    c = z1 * z2 + z1 * z1 - z3 * z2 - 3.0 * h * dz31
    two_sub = 0.5 * (-b + jnp.sqrt(jnp.maximum(b * b - 4.0 * c, 0.0)))

    return jnp.where(
        h <= tiny_h,
        z1,
        jnp.where(
            h >= h3,
            all_sub,
            jnp.where((h > 0.0) & (h <= h2), one_sub, two_sub),
        ),
    )


def eta_vertices(bs: BS2002Arrays, h, tiny_h):
    """eta at mesh vertices from cell depths (SWEEtaVertex)."""
    eta_cell = eta_cells(bs.z1, bs.z2, bs.z3, h, tiny_h)
    eta_pad = jnp.concatenate([eta_cell, jnp.zeros((1,), eta_cell.dtype)])
    gathered = eta_pad[bs.vertex_cells]  # [NV, K]
    return gathered.sum(axis=1) * bs.vertex_inv_count


def dhv_correction(eta_v, vbeg, vend, zvbeg, zvend, cn, sn):
    """(df_hu, df_hv): momentum flux correction g*dhv^2/24*(cn, sn)."""
    hv_beg = jnp.maximum(eta_v[vbeg] - zvbeg, 0.0)
    hv_end = jnp.maximum(eta_v[vend] - zvend, 0.0)
    dhv = hv_end - hv_beg
    corr = GRAVITY * dhv * dhv / 24.0
    return corr * cn, corr * sn


# --------------------------------------------------------------------------
# Slot-routed Pallas backend (ops/pallas/slotted.py + routed.py)
#
# The eta-vertex pre-operator is a two-space indirection chain
#   cells --(vertex adjacency, averaged)--> vertices --(edge endpoints)-->
#   edge slots
# expressed as route+accumulate plans (ops/pallas/routed.py). Vertices are
# renumbered by their first adjacent cell so both accumulate windows stay
# tile-local under the mesh's (RCM) cell ordering.
# --------------------------------------------------------------------------


class BS2002PlanArrays(NamedTuple):
    """Device arrays for the slot-routed BS2002 pipeline (a JAX pytree)."""

    # per-cell sorted vertex z in row-major [Crows, 128] f32 planes
    z1r: jnp.ndarray
    z2r: jnp.ndarray
    z3r: jnp.ndarray
    # cell -> vertex route + averaged accumulate (eta_v, plan-vertex order)
    cv_ws: jnp.ndarray
    cv_sup: jnp.ndarray
    cv_gi: jnp.ndarray
    cv_mi: jnp.ndarray
    cv_validR: jnp.ndarray
    cv_a_ws: jnp.ndarray
    cv_a_sup: jnp.ndarray
    cv_a_coef: jnp.ndarray
    # vertex -> L-slot routes for the edge begin/end endpoints
    vb_ws: jnp.ndarray
    vb_sup: jnp.ndarray
    vb_gi: jnp.ndarray
    vb_mi: jnp.ndarray
    vb_validR: jnp.ndarray
    vb_a_ws: jnp.ndarray
    vb_a_sup: jnp.ndarray
    vb_a_coef: jnp.ndarray
    ve_ws: jnp.ndarray
    ve_sup: jnp.ndarray
    ve_gi: jnp.ndarray
    ve_mi: jnp.ndarray
    ve_validR: jnp.ndarray
    ve_a_ws: jnp.ndarray
    ve_a_sup: jnp.ndarray
    ve_a_coef: jnp.ndarray
    # slotted endpoint bed elevations in the L-layout [ntiles*8, 128] f32
    zvb: jnp.ndarray
    zve: jnp.ndarray


_BS_INT_FIELDS = frozenset({
    "cv_ws", "cv_sup", "cv_gi", "cv_mi", "cv_a_ws", "cv_a_sup",
    "vb_ws", "vb_sup", "vb_gi", "vb_mi", "vb_a_ws", "vb_a_sup",
    "ve_ws", "ve_sup", "ve_gi", "ve_mi", "ve_a_ws", "ve_a_sup",
})


def bs_plan_to_device(plan_np: dict) -> BS2002PlanArrays:
    """numpy plan dict -> device BS2002PlanArrays."""
    return BS2002PlanArrays(**{
        k: jnp.asarray(
            v, jnp.int32 if k in _BS_INT_FIELDS else jnp.float32
        )
        for k, v in plan_np.items()
    })


def build_bs2002_routed_plans(
    z1, z2, z3, vc, inv_w, vbeg_s, vend_s, zvb_s, zve_s, epos_s,
    ntiles: int, num_cells: int, bnd_vbeg, bnd_vend,
    max_sup: int = 4, max_sup_accum: int = 8,
):
    """Core host-side plan build over one (possibly per-shard local) index
    space. All inputs numpy:

    z1/z2/z3: [C] per-cell sorted vertex elevations; vc: [NV, K] vertex ->
    adjacent cell ids with any id outside [0, C) meaning padding; inv_w:
    [NV] averaging weights (1/count); vbeg_s/vend_s/zvb_s/zve_s: [Er]
    endpoint vertex ids + elevations for the REAL interior edges in the
    slotted plan's sorted order; epos_s: [Er] their L-layout flat slot
    positions; bnd_vbeg/bnd_vend: boundary endpoint vertex ids.

    Returns None on window-budget overflow, else (plan_np dict of numpy
    arrays, meta-nsup tuple, (bnd_vbeg_new, bnd_vend_new)) with the
    boundary endpoints remapped into the plan's vertex order.
    """
    from ..pallas.routed import build_accum_plan, build_route_plan

    vc = np.asarray(vc)
    NV = vc.shape[0]
    C = num_cells
    valid = (vc >= 0) & (vc < C)

    # vertex renumbering by first adjacent cell (tile locality)
    first_cell = np.where(valid, vc, np.iinfo(np.int64).max).min(axis=1)
    vord = np.argsort(first_cell, kind="stable")
    vnew = np.empty(NV, np.int64)
    vnew[vord] = np.arange(NV)

    # ---- cell -> vertex pairs (averaging weights) ------------------------
    vi, ki = np.nonzero(valid)
    pair_c = vc[vi, ki]
    pair_v = vnew[vi]
    pair_w = np.asarray(inv_w)[vi]
    rp_cv = build_route_plan(pair_c, pair_v, max_sup=max_sup)
    if rp_cv is None:
        return None
    # a 1024-vertex tile holds ~K*1024 pairs >= 8*K routed supers by volume
    # alone, so the averaging accumulate needs a budget that scales with K
    # (it is mesh-size independent: pairs per tile is bounded by K*1024)
    K_cv = int(np.bincount(pair_v, minlength=NV).max()) if len(pair_v) else 1
    ap_cv = build_accum_plan(
        pair_v[rp_cv.order], rp_cv.eposR, pair_w[rp_cv.order], NV,
        max_sup=max(max_sup_accum, 2 * 8 * K_cv),
    )
    if ap_cv is None:
        return None

    # ---- vertex -> L-slot (begin / end endpoints) -----------------------
    n_slots = ntiles * 1024
    epos_s = np.asarray(epos_s)
    ones = np.ones(len(epos_s))

    def vertex_to_slot(v_ids):
        rp = build_route_plan(v_ids, epos_s, max_sup=max_sup)
        if rp is None:
            return None
        ap = build_accum_plan(
            epos_s[rp.order], rp.eposR, ones, n_slots,
            max_sup=max_sup_accum,
        )
        if ap is None:
            return None
        return rp, ap

    res_b = vertex_to_slot(vnew[np.asarray(vbeg_s)])
    res_e = vertex_to_slot(vnew[np.asarray(vend_s)])
    if res_b is None or res_e is None:
        return None
    rp_b, ap_b = res_b
    rp_e, ap_e = res_e

    # ---- slotted static endpoint elevations ------------------------------
    R_l = ntiles * 8
    zvb = np.zeros((R_l, 128), np.float32)
    zve = np.zeros((R_l, 128), np.float32)
    zvb.reshape(-1)[epos_s] = np.asarray(zvb_s, np.float32)
    zve.reshape(-1)[epos_s] = np.asarray(zve_s, np.float32)

    # ---- z planes in row-major [Crows, 128] ------------------------------
    Crows = -(-C // 128)

    def rows(v):
        out = np.zeros(Crows * 128, np.float32)
        out[:C] = np.asarray(v, np.float32)
        return out.reshape(Crows, 128)

    def route_fields(rp):
        return dict(ws=rp.ws, sup=rp.sup, gi=rp.gi, mi=rp.mi,
                    validR=rp.validR)

    def accum_fields(ap):
        return dict(ws=ap.ws, sup=ap.sup, coef=ap.coef)

    def prefixed(prefix, d):
        return {prefix + k: v for k, v in d.items()}

    plan_np = dict(
        z1r=rows(z1),
        z2r=rows(z2),
        z3r=rows(z3),
        **prefixed("cv_", route_fields(rp_cv)),
        **prefixed("cv_a_", accum_fields(ap_cv)),
        **prefixed("vb_", route_fields(rp_b)),
        **prefixed("vb_a_", accum_fields(ap_b)),
        **prefixed("ve_", route_fields(rp_e)),
        **prefixed("ve_a_", accum_fields(ap_e)),
        zvb=zvb,
        zve=zve,
    )
    meta = (rp_cv.nsup, ap_cv.nsup, rp_b.nsup, ap_b.nsup, rp_e.nsup,
            ap_e.nsup)
    bnd_remap = (vnew[np.asarray(bnd_vbeg)], vnew[np.asarray(bnd_vend)])
    return plan_np, meta, bnd_remap


def build_bs2002_plan(
    bs_host: dict, order: np.ndarray, eposL: np.ndarray, ntiles: int,
    num_cells: int, max_sup: int = 4, max_sup_accum: int = 8,
):
    """Single-device plan build from build_operator's bs_* host arrays.

    order: the slotted plan's interior-edge sort permutation; eposL: [Ei]
    sorted edge -> L-layout flat slot position. Returns None on budget
    overflow, else (BS2002PlanArrays, meta-nsup tuple, (bnd_vbeg_new,
    bnd_vend_new)).
    """
    cnt = np.asarray(bs_host["bs_vertex_count"])
    res = build_bs2002_routed_plans(
        bs_host["bs_z1"], bs_host["bs_z2"], bs_host["bs_z3"],
        bs_host["bs_vertex_cells"], 1.0 / cnt,
        np.asarray(bs_host["bs_int_vbeg"])[order],
        np.asarray(bs_host["bs_int_vend"])[order],
        np.asarray(bs_host["bs_int_zvbeg"])[order],
        np.asarray(bs_host["bs_int_zvend"])[order],
        eposL, ntiles, num_cells,
        bs_host["bs_bnd_vbeg"], bs_host["bs_bnd_vend"],
        max_sup=max_sup, max_sup_accum=max_sup_accum,
    )
    if res is None:
        return None
    plan_np, meta, bnd_remap = res
    return bs_plan_to_device(plan_np), meta, bnd_remap


def eta_slotted(pl_bs: BS2002PlanArrays, meta, h_rows, tiny_h,
                interpret=False):
    """Device pipeline: per-cell eta (elementwise) -> vertex-averaged eta
    (route+accumulate) -> endpoint etas aligned to the edge L-slots.

    h_rows: [Crows, 128] f32 depths. Returns (eta_v_rows [NVt*8, 128] in
    the plan's vertex order, etab [ntiles*8, 128], etae [ntiles*8, 128]).
    """
    from ..pallas.routed import accumulate, route_gather

    cv_n, cva_n, vb_n, vba_n, ve_n, vea_n = meta
    eta_rows = eta_cells(pl_bs.z1r, pl_bs.z2r, pl_bs.z3r, h_rows,
                         jnp.float32(tiny_h))
    routed = route_gather(
        (pl_bs.cv_ws, pl_bs.cv_sup, pl_bs.cv_gi, pl_bs.cv_mi,
         pl_bs.cv_validR),
        eta_rows, cv_n, interpret=interpret,
    )
    eta_v = accumulate(
        (pl_bs.cv_a_ws, pl_bs.cv_a_sup, pl_bs.cv_a_coef), routed, cva_n,
        pl_bs.cv_a_sup.shape[0], interpret=interpret,
    )
    rb = route_gather(
        (pl_bs.vb_ws, pl_bs.vb_sup, pl_bs.vb_gi, pl_bs.vb_mi,
         pl_bs.vb_validR),
        eta_v, vb_n, interpret=interpret,
    )
    etab = accumulate(
        (pl_bs.vb_a_ws, pl_bs.vb_a_sup, pl_bs.vb_a_coef), rb, vba_n,
        pl_bs.vb_a_sup.shape[0], interpret=interpret,
    )
    re_ = route_gather(
        (pl_bs.ve_ws, pl_bs.ve_sup, pl_bs.ve_gi, pl_bs.ve_mi,
         pl_bs.ve_validR),
        eta_v, ve_n, interpret=interpret,
    )
    etae = accumulate(
        (pl_bs.ve_a_ws, pl_bs.ve_a_sup, pl_bs.ve_a_coef), re_, vea_n,
        pl_bs.ve_a_sup.shape[0], interpret=interpret,
    )
    return eta_v, etab, etae
