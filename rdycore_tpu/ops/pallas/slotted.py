"""Slot-routed Pallas TPU kernels for the unstructured SWE hot loop.

The hot loop (SURVEY §3.2: libCEED JIT kernel over all edges,
swe_fluxes_ceed.h SWEFlux_Roe + cell scatter) is per interior edge: gather
the two adjacent cell states, solve the Roe problem, scatter the flux into
both cells. TPU has no hardware gather to HBM, and a full 128-lane dynamic
shuffle costs ~77 cycles/vreg — but an 8-deep *sublane* gather
(`take_along_axis(axis=0)` on an [8, 128] vreg) costs ~12, the same as an
add. These kernels arrange all mesh-indirection so that every hot gather is
a sublane gather:

- **L-layout**: interior edges (sorted by min cell id) are packed into
  tiles of 1024 slots = 8 rows x 128 lanes, where an edge's lane ==
  `left_cell % 128`. The left-state gather then only has to pick a *row*
  per lane (the cell's row within the tile's q window) — pure sublane
  gathers over the window supers.
- **R-layout**: a parallel 16 x 128 per-tile layout with lane ==
  `right_cell % 128` (right-state gather is sublane-only there), plus a
  static routing (one 128-lane shuffle + sublane gathers per component)
  that aligns the gathered right states to the L slots: a slot color
  k < 16 with (k, laneR) and (k, laneL) both unused, assigned greedily;
  when no color is free the tile simply closes early (padding).
- The kernel computes Roe fluxes on [8, 128] vregs in the L-layout, and
  *also* emits the fluxes routed to the R-layout (one inverse shuffle).
- **Cell divergence**: a cell at natural position c sits at lane c % 128 —
  which is exactly the slot lane of both its left-edges (in the L-layout
  flux) and its right-edges (in the R-layout flux). The divergence kernel
  is therefore sublane-gathers only: per incident-edge slot, pick the flux
  row and multiply by the signed len/area coefficient.

RCM cell ordering (numerics.cell_ordering: rcm) keeps the q/flux row
windows small; meshes whose windows exceed the static budget fall back to
the XLA gather twin.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..swe.riemann import regularized_velocity, roe_flux

TE = 1024  # L-slots (edges) per tile: 8 rows x 128 lanes
RROWS = 16  # R-layout rows per tile
# tiles per pallas grid step: amortizes per-step sequencing + per-stream
# DMA issue overhead (measured ~3.6 us/grid-step at GT=8 against ~1 us of
# compute — the kernels are overhead-bound, not HBM-bound); tile counts
# are padded to a GT multiple with inert tiles (valid=0 zeroes their
# fluxes, coef=0 their divergence). Env-tunable for benchmarking.
import os as _os

GT = int(_os.environ.get("RDYTPU_GT", 8))

# Perf-attribution knob for the fused kernel (bench only -- results are
# WRONG when set). Comma-set of: "roe" (trivial average flux), "shuffle"
# (skip the R-align / R-route lane shuffles), "gather" (window gathers
# read super 0 directly), "cell" (skip the divergence phase). Used to
# measure where the per-tile time goes; see BASELINE.md ablations.
_ABLATE = frozenset(
    s for s in _os.environ.get("RDYTPU_FUSED_ABLATE", "").split(",") if s
)
# runtime gating of the divergence gather chains on per-(k, tile) actual
# span counts: "cond" wraps tail iterations in scf branches, "fori" runs
# the chain as a dynamic-trip-count loop, "0" disables (static unrolled
# chains). A/B on the TPU (BASELINE.md round-4): static 2.09e9 > cond
# 2.00e9 > fori 1.50e9 — Mosaic predicates/serializes both dynamic
# forms, so the dead-tail work is cheaper than the control flow. Static
# unrolled is the default; the span counts stay in the plan for future
# layout work.
_CNT_GATE = _os.environ.get("RDYTPU_CNT_GATE", "0")


class SlottedPlan(NamedTuple):
    """Host-built tiling/routing plan (all arrays numpy).

    When boundary edges are folded into the plan (unified mode, used by the
    streaming fused kernel so the divergence it emits is COMPLETE — the
    reference's per-boundary CeedOperators, src/operator_fluxes_ceed.c:289+,
    become in-kernel ghost-state selects), `order`/`eposL`/`eposR` index the
    unified edge list [interior | boundary] and supL carries the per-slot BC
    type in bits 5-6 (0 = interior, 1 = Dirichlet, 2 = reflecting,
    3 = critical outflow; window rows then fit 5 bits since nsup <= 4)."""

    order: np.ndarray  # [E] original -> sorted edge permutation
    ntiles: int
    rrows: int  # R-layout rows per tile (8 when <= 8 colors suffice)
    nsup: int  # per-tile q window size in 8-row supers
    wq: int  # per-GROUP q window size in supers (shared DMA window)
    ws: np.ndarray  # [ntiles] i32 q-window start (units of 8 rows)
    gws: np.ndarray  # [ntiles // GT] i32 group window starts (supers)
    supL: np.ndarray  # [ntiles*8, 128] i8 window row of left cell
    supR: np.ndarray  # [ntiles*16, 128] i8 window row of right cell
    m: np.ndarray  # [ntiles*16, 128] i8 align R->L lane shuffle
    g: np.ndarray  # [ntiles*8, 128] i8 align R->L row pick
    gi: np.ndarray  # [ntiles*16, 128] i8 route L->R row pick
    mi: np.ndarray  # [ntiles*16, 128] i8 route L->R lane shuffle
    cn: np.ndarray  # [ntiles*8, 128] f32 slotted edge normals
    sn: np.ndarray
    courant_coef: np.ndarray  # [ntiles*8, 128] f32 slotted len/min(area)
    slot_edge: np.ndarray  # [ntiles*8*128] i32 slot -> operator edge (-1 pad)
    eposL: np.ndarray  # [E] edge -> L-layout flat position
    eposR: np.ndarray  # [E] edge -> R-layout flat position
    bnd_pos: Optional[np.ndarray] = None  # [Eb] boundary edge -> L position
    il_s: Optional[np.ndarray] = None  # [E] sorted left cells
    ir_s: Optional[np.ndarray] = None  # [E] sorted right cells


class CellPlan(NamedTuple):
    ntiles: int  # cell tiles (1024 cells each)
    nsupL: int  # per-tile fluxL window supers
    nsupR: int
    wl: int  # per-GROUP fluxL window supers (shared DMA window)
    wr: int
    wsL: np.ndarray  # [ntiles] i32 fluxL row-window starts (8-row units)
    wsR: np.ndarray
    gwsL: np.ndarray  # [ntiles // GT] i32 group window starts (supers)
    gwsR: np.ndarray
    supL: np.ndarray  # [KL, ntiles*8, 128] i32
    cfL: np.ndarray  # [KL, ntiles*8, 128] f32 signed len/area (0 = none)
    supR: np.ndarray  # [KR, ntiles*8, 128] i32
    cfR: np.ndarray
    # per-k sub-windows for the fused kernels: contributions are ranked by
    # row within each cell, so plane k's rows cluster (e.g. on a quad the
    # far south edges and the near west edges land in different planes) and
    # each plane scans its own small window instead of the full per-tile
    # span — the divergence gather-chain count is sum(nsup_ks), not
    # K * nsup. wk*: [(2K+1) * ntiles] i32 flat (row 0 = the per-tile
    # window the sup planes are relative to; rows 1..K = plane window
    # starts in supers; rows K+1..2K = per-(k, tile) ACTUAL span counts
    # that gate the gather chains at run time).
    wkL: np.ndarray = None
    wkR: np.ndarray = None
    nsupL_ks: tuple = ()
    nsupR_ks: tuple = ()
    # per-k-RELATIVE i8 sup planes for the fused kernels (values
    # < nsup_k * 8, so they stay int8-representable at any mesh bandwidth;
    # the per-TILE-relative supL/supR planes above serve the two-kernel
    # path and overflow int8 when the combined span exceeds 16 supers)
    supLk: np.ndarray = None
    supRk: np.ndarray = None
    # False when the per-tile windows exceed the two-kernel path's budget
    # (sup planes above are then invalid); the fused kernels still work
    two_kernel_ok: bool = True


def _plan_debug(msg):
    if _os.environ.get("RDYTPU_PLAN_DEBUG"):
        import sys

        print(f"# plan: {msg}", file=sys.stderr)


def _vmem_budget() -> int:
    """VMEM scratch byte budget for plan admission (ADVICE r2: the GT-scaled
    super caps alone can admit plans whose double-buffered q window + flux
    rings exceed VMEM on older TPU generations or at ndof > 3)."""
    return int(_os.environ.get("RDYTPU_VMEM_BUDGET", 96 * 1024 * 1024))


def _qbuf_bytes(wq: int, ndof: int) -> int:
    return 2 * ndof * wq * 8 * 128 * 4


def _ring_bytes(nringL: int, nringR: int, ndof: int) -> int:
    return (nringL + nringR) * 8 * ndof * 128 * 4


def _cumcount(x: np.ndarray) -> np.ndarray:
    """Per-value running occurrence count (vectorized groupby-cumcount)."""
    n = len(x)
    o = np.argsort(x, kind="stable")
    xo = x[o]
    grp_start = np.r_[0, np.flatnonzero(np.diff(xo)) + 1]
    starts = np.repeat(grp_start, np.diff(np.r_[grp_start, n]))
    c = np.empty(n, np.int64)
    c[o] = np.arange(n) - starts
    return c


def _rank_by_row(cells: np.ndarray, rows: np.ndarray) -> np.ndarray:
    """k-plane assignment = rank of `rows` within each cell: plane k then
    holds each cell's k-th-nearest contribution, so plane rows cluster."""
    n = len(cells)
    order = np.lexsort((rows, cells))
    c_o = cells[order]
    grp_start = np.r_[0, np.flatnonzero(np.diff(c_o)) + 1]
    starts = np.repeat(grp_start, np.diff(np.r_[grp_start, n]))
    k = np.empty(n, np.int64)
    k[order] = np.arange(n) - starts
    return k


def _rank_by_cluster(cells, rows, gap=8, max_span=24):
    """k-plane assignment by per-tile ROW CLUSTERS (round 5, aligned
    layout): entries are grouped by proximity in ring-row space (a new
    cluster starts at any gap > `gap` rows or when a cluster exceeds
    `max_span` rows), and each (cluster, per-cell-multiplicity) pair gets
    its own plane. Unlike per-cell rank-by-row, a cell with only ONE
    contribution lands in the plane of ITS OWN row band — so straddler
    cells (e.g. the first column of a cell tile, whose in-edge lives one
    tile earlier) no longer stretch another band's window (measured on
    the 2.88M raster: rank-by-row gave nsupR_ks (7, 5); clusters give
    per-plane spans <= ceil(max_span/8))."""
    n = len(cells)
    if n == 0:
        return np.zeros(0, np.int64)
    tiles = cells // TE
    o = np.lexsort((rows, tiles))
    t_o, r_o = tiles[o], rows[o]
    new_tile = np.r_[True, t_o[1:] != t_o[:-1]]
    brk = new_tile | np.r_[True, (r_o[1:] - r_o[:-1]) > gap]
    cl = np.cumsum(brk) - 1
    starts_idx = np.flatnonzero(brk)
    start_rows = np.repeat(
        r_o[starts_idx], np.diff(np.r_[starts_idx, n])
    )
    wide = (r_o - start_rows) // max_span
    # sub-cluster id (cluster split by width), renumbered densely
    sub = cl * 8 + np.minimum(wide, 7)
    # per-(sub-cluster, cell) multiplicity: same cell twice in one band
    # spills to its own plane
    mult = _cumcount(sub * np.int64(TE) + (cells[o] % TE))
    # plane = within-tile ordinal of the (sub, mult) pair
    pair = sub * 16 + np.minimum(mult, 15)
    po = np.lexsort((pair, t_o))
    t_p = t_o[po]
    pr_p = pair[po]
    newt = np.r_[True, t_p[1:] != t_p[:-1]]
    newp = newt | np.r_[True, pr_p[1:] != pr_p[:-1]]
    ord_in_tile = np.cumsum(newp) - 1
    tile_first = np.repeat(
        ord_in_tile[np.flatnonzero(newt)],
        np.diff(np.r_[np.flatnonzero(newt), n]),
    )
    k_sorted = ord_in_tile - tile_first
    k = np.empty(n, np.int64)
    k[o[po]] = k_sorted
    return k


def _per_k_windows(k, cells, rows, K, Ct, base_sup):
    """Per-(plane, tile) window starts (supers) + static per-plane window
    sizes. Empty (plane, tile) combos inherit the per-tile base window
    (their sup-plane entries are zero-coef padding)."""
    tiles = cells // TE
    lo = np.full((K, Ct), np.iinfo(np.int64).max)
    hi = np.full((K, Ct), -1)
    np.minimum.at(lo, (k, tiles), rows)
    np.maximum.at(hi, (k, tiles), rows)
    has = hi >= 0
    ws = np.where(has, np.minimum(lo, hi + 1) // 8, base_sup[None, :])
    nsup_ks = tuple(
        int(np.max(np.where(has[kk], hi[kk] // 8 - ws[kk], 0))) + 1
        for kk in range(K)
    )
    wk = np.concatenate(
        [base_sup[None, :], ws], 0
    ).astype(np.int32).ravel()
    return wk, nsup_ks


def build_slotted_plan_aligned(
    int_left, int_right, int_cn, int_sn, courant_coef,
    num_cells: int, max_sup: int, bnd=None, ndof: int = 3,
):
    """Identity-aligned slot packing (round 5, VERDICT r4 #1).

    Edge tile (ct, k) holds the k-th L-side edges of cell tile ct at slot
    (row, lane) = the OWNING CELL's own position — so the cell-divergence
    L gather collapses to one aligned ring read + fma per k-plane
    (nsupL_ks == (1,)*KL), and the edge count per tile is exactly the
    cells' L-degrees (denser than greedy min-cell packing on balanced
    meshes: 5630 vs 6112 tiles on the 2.88M dam-break raster).

    Boundary pseudo-edges (il == ir == cell) fill their own cell's hole
    slots where the cell's L-degree leaves one (top/right walls of a
    raster), or form dense k-planes where a whole cell tile is on a wall
    (bottom/top rows). The topologically unavoidable leftovers (~1 per
    raster row on the left wall: sum(degL) parity) are RETURNED as a
    remainder set handled by the XLA glue (operator._finish_apply /
    _advance_fused_step add their flux + a linearized friction
    correction per stage).

    Returns (plan, kept_bnd, rem_bnd) or None when the mesh doesn't fit
    the identity constraints (falls back to the greedy packer):
      kept_bnd/rem_bnd: original boundary-edge indices kept in-plan /
      left to the XLA remainder path.
    """
    Ei = len(int_left)
    Eb = len(bnd["left"]) if bnd is not None else 0
    if Ei == 0:
        return None
    bl = np.asarray(bnd["left"], np.int64) if bnd is not None else None
    il_all = np.concatenate(
        [np.asarray(int_left, np.int64)] + ([bl] if Eb else [])
    )
    ir_all = np.concatenate(
        [np.asarray(int_right, np.int64)] + ([bl] if Eb else [])
    )
    E = Ei + Eb
    c = il_all
    ct = c // TE
    nct = -(-num_cells // TE)

    # k-rank per L cell: interior edges ordered by their right cell
    # (deterministic, clusters homogeneous edge directions per plane on
    # rasters), boundary pseudos after all interiors of the cell
    is_bnd = np.zeros(E, bool)
    is_bnd[Ei:] = True
    key2 = np.where(is_bnd, np.int64(1) << 62, ir_all)
    order0 = np.lexsort((np.arange(E), key2, c))
    c_o = c[order0]
    grp = np.r_[0, np.flatnonzero(np.diff(c_o)) + 1]
    starts = np.repeat(grp, np.diff(np.r_[grp, E]))
    k = np.empty(E, np.int64)
    k[order0] = np.arange(E) - starts
    Kmax = int(k.max()) + 1
    if Kmax > 8:
        _plan_debug(f"aligned: L-degree {Kmax} > 8")
        return None

    armed = np.zeros((nct, Kmax), np.int64)
    np.add.at(armed, (ct, k), 1)
    has_int = np.zeros((nct, Kmax), bool)
    ii = ~is_bnd
    if ii.any():
        np.logical_or.at(has_int, (ct[ii], k[ii]), True)
    # a (ct, k) tile exists if it holds any interior edge, or enough
    # boundary pseudos to be worth a dense tile (whole wall rows)
    exists = has_int | (armed >= TE // 2)
    rem_mask = is_bnd & ~exists[ct, k]
    rem_bnd = np.flatnonzero(rem_mask[Ei:])
    kept_bnd = np.flatnonzero(~rem_mask[Ei:])
    keep = ~rem_mask

    ntiles_real = int(exists.sum())
    ideal = -(-int(keep.sum()) // TE)
    if ntiles_real > 1.1 * ideal + 4:
        _plan_debug(
            f"aligned: tile inflation {ntiles_real} vs ideal {ideal}"
        )
        return None
    tile_id = np.cumsum(exists.ravel()).reshape(exists.shape) - 1

    ck, ctk, irk = c[keep], ct[keep], ir_all[keep]
    kk = k[keep]
    tile_of = tile_id[ctk, kk]
    slot_row = (ck % TE) // 128
    lane_l = ck & 127
    lane_r = irk & 127

    # colors: the route needs distinct colors per destination (R) lane
    # AND per source (L) lane within a tile. color = slot_row satisfies
    # the L constraint by construction (same tile + same L lane + same
    # cell row => same cell => same edge) and the R constraint for
    # homogeneous k-runs; the rare collisions (hole-filling pseudos next
    # to interior edges, mixed-direction runs) are repaired edge-by-edge
    color = slot_row.copy()
    rkey = (tile_of * 128 + lane_r) * 16 + color
    _, first = np.unique(rkey, return_index=True)
    coll = np.ones(len(rkey), bool)
    coll[first] = False
    if coll.any():
        if coll.sum() > 200_000:
            _plan_debug(f"aligned: too many color collisions {coll.sum()}")
            return None
        usedR = {}
        usedL = {}
        tl = tile_of * 128
        # seed the used-color sets only over tiles that have collisions
        bad_tiles = np.zeros(ntiles_real, bool)
        bad_tiles[tile_of[coll]] = True
        in_bad = bad_tiles[tile_of]
        for e in np.flatnonzero(in_bad & ~coll):
            usedR.setdefault(int(tl[e] + lane_r[e]), set()).add(
                int(color[e])
            )
            usedL.setdefault(int(tl[e] + lane_l[e]), set()).add(
                int(color[e])
            )
        for e in np.flatnonzero(coll):
            kr = int(tl[e] + lane_r[e])
            kl = int(tl[e] + lane_l[e])
            ur = usedR.setdefault(kr, set())
            ul = usedL.setdefault(kl, set())
            c = 0
            while c in ur or c in ul:
                c += 1
            if c >= 16:
                _plan_debug("aligned: color repair exceeded 16")
                return None
            color[e] = c
            ur.add(c)
            ul.add(c)
    rcap_used = 8 if int(color.max(initial=0)) < 8 else 16

    # per-tile q windows over both endpoints
    lo = np.minimum(ck, irk) >> 7
    hi = np.maximum(ck, irk) >> 7
    ws_tile = np.full(ntiles_real, np.iinfo(np.int64).max)
    np.minimum.at(ws_tile, tile_of, lo)
    ws_tile = (ws_tile >> 3) << 3
    span = np.zeros(ntiles_real, np.int64)
    np.maximum.at(span, tile_of, hi - ws_tile[tile_of])
    need_sup = int(span.max()) // 8 + 1
    if need_sup > max_sup:
        _plan_debug(f"aligned: need_sup {need_sup} > max_sup {max_sup}")
        return None

    # plan order = slot position order (keeps ws nondecreasing per tile)
    epos_l = (tile_of * 8 + slot_row) * 128 + lane_l
    kept_idx = np.flatnonzero(keep)
    order = kept_idx[np.argsort(epos_l, kind="stable")]
    inv = np.empty(len(kept_idx), np.int64)
    inv[np.argsort(epos_l, kind="stable")] = np.arange(len(kept_idx))

    # re-index the per-edge packing into plan order
    o_sel = np.argsort(epos_l, kind="stable")
    slot_row = slot_row[o_sel]
    color = color[o_sel]
    tile_of = tile_of[o_sel]
    il_s = ck[o_sel]
    ir_s = irk[o_sel]

    ntiles = -(-ntiles_real // GT) * GT
    # diagnostic: pad with inert tiles (perf experiments — inert tiles
    # compute garbage fluxes nothing consumes)
    ntiles = max(ntiles, -(-int(
        _os.environ.get("RDYTPU_PAD_NTILES", 0)) // GT) * GT)
    ws_rows = np.concatenate([
        ws_tile,
        np.full(ntiles - ntiles_real, ws_tile[-1], ws_tile.dtype),
    ])
    ws_sup = (ws_rows // 8).astype(np.int32)
    grp_w = ws_sup.reshape(-1, GT)
    gws = grp_w.min(axis=1).astype(np.int32)
    wq = int((grp_w.max(axis=1) - gws).max()) + need_sup
    if wq > 64 * max(1, GT // 8) or _qbuf_bytes(wq, ndof) > _vmem_budget():
        _plan_debug(f"aligned: group q window too large: wq={wq}")
        return None

    # ---- scatter the slot planes (numpy fill twin of build_slotted_plan)
    E_k = len(il_s)
    rrows = 8 if rcap_used == 8 else RROWS
    R_l, R_r = ntiles * 8, ntiles * rrows
    supL = np.zeros((R_l, 128), np.int8)
    supR = np.zeros((R_r, 128), np.int8)
    m_al = np.zeros((R_r, 128), np.int8)
    g_al = np.zeros((R_l, 128), np.int8)
    gi = np.zeros((R_r, 128), np.int8)
    mi = np.zeros((R_r, 128), np.int8)
    cn_s = np.zeros((R_l, 128), np.float32)
    sn_s = np.zeros((R_l, 128), np.float32)
    cc_s = np.zeros((R_l, 128), np.float32)
    slot_edge = np.full(R_l * 128, -1, np.int32)

    if bnd is not None:
        cn_all = np.concatenate([int_cn, np.asarray(bnd["cn"])])
        sn_all = np.concatenate([int_sn, np.asarray(bnd["sn"])])
        cc_all = np.concatenate([courant_coef[:Ei], np.asarray(bnd["ccoef"])])
        bt_all = np.concatenate(
            [np.zeros(Ei, np.int64), np.asarray(bnd["btype"], np.int64) + 1]
        )
    else:
        cn_all, sn_all = int_cn, int_sn
        cc_all = courant_coef[:Ei]
        bt_all = None

    laneL = il_s & 127
    laneR = ir_s & 127
    ws_of = ws_rows[tile_of]
    rl = il_s // 128 - ws_of
    rr = ir_s // 128 - ws_of
    rowsL = tile_of * 8 + slot_row
    rowsR = tile_of * rrows + color
    supL[rowsL, laneL] = rl
    supR[rowsR, laneR] = rr
    m_al[rowsR, laneL] = laneR
    if bt_all is not None:
        g_al[rowsL, laneL] = color | (bt_all[order] << 4)
    else:
        g_al[rowsL, laneL] = color
    gi[rowsR, laneL] = slot_row
    mi[rowsR, laneR] = laneL
    cn_s[rowsL, laneL] = cn_all[order].astype(np.float32)
    sn_s[rowsL, laneL] = sn_all[order].astype(np.float32)
    cc_s[rowsL, laneL] = cc_all[order].astype(np.float32)
    eposL = rowsL * 128 + laneL
    eposR = rowsR * 128 + laneR
    bnd_pos = None
    if bt_all is not None:
        # slot -> operator edge id: interior slots get their rank among
        # the plan-sorted interior edges; boundary slots keep Ei + the
        # ORIGINAL boundary position (remainder edges never reordered)
        is_int_o = order < Ei
        opid = np.where(
            is_int_o, np.cumsum(is_int_o) - 1, Ei + (order - Ei)
        ).astype(np.int32)
        slot_edge[eposL] = opid
        # kept boundary edge -> flat L-slot position, in KEPT order
        inv_all = np.full(E, -1, np.int64)
        inv_all[order] = np.arange(E_k)
        bnd_pos = eposL[inv_all[Ei + kept_bnd]].astype(np.int32)
    else:
        slot_edge[eposL] = np.arange(E_k, dtype=np.int32)

    plan = SlottedPlan(
        order=order, ntiles=ntiles, rrows=rrows, nsup=need_sup,
        wq=wq, gws=gws, ws=ws_sup,
        supL=supL, supR=supR, m=m_al, g=g_al, gi=gi, mi=mi,
        cn=cn_s, sn=sn_s, courant_coef=cc_s, slot_edge=slot_edge,
        eposL=eposL, eposR=eposR, bnd_pos=bnd_pos,
        il_s=il_s, ir_s=ir_s,
    )
    return plan, kept_bnd, rem_bnd


def _slot_pack_py(il, ir, max_sup, rcap=16):
    """Python twin of csrc rdy_slot_pack (one-pass packing + coloring).
    Returns (slot_row, color, tile_of, ws_rows, need_sup); raises
    ValueError when a lone edge exceeds the window budget."""
    cmask = (1 << rcap) - 1
    E = len(il)
    slot_row = np.zeros(E, np.int64)
    color = np.zeros(E, np.int64)
    tile_of = np.zeros(E, np.int64)
    ws_list = []
    cntL = np.zeros(128, np.int64)
    usedS = np.zeros(128, np.int64)
    usedD = np.zeros(128, np.int64)
    count = 0
    ws_row = 0
    need_sup = 1

    def open_tile(lo):
        nonlocal count, ws_row
        cntL[:] = 0
        usedS[:] = 0
        usedD[:] = 0
        count = 0
        ws_row = (int(lo) >> 10) << 3
        ws_list.append(ws_row)

    for e in range(E):
        l, r = int(il[e]), int(ir[e])
        lo, hi = (l, r) if l < r else (r, l)
        a, b = l & 127, r & 127
        attempt = 0
        while True:
            fresh = not ws_list or (count == 0 and attempt > 0)
            if not ws_list:
                open_tile(lo)
            freemask = ~(usedS[b] | usedD[a]) & cmask
            fits = (
                count < TE and cntL[a] < 8 and freemask
                and ((hi >> 7) - ws_row) < max_sup * 8
            )
            if fits:
                slot_row[e] = cntL[a]
                cntL[a] += 1
                k = (int(freemask) & -int(freemask)).bit_length() - 1
                color[e] = k
                usedS[b] |= 1 << k
                usedD[a] |= 1 << k
                tile_of[e] = len(ws_list) - 1
                need_sup = max(need_sup, ((hi >> 7) - ws_row) // 8 + 1)
                count += 1
                break
            if fresh:
                raise ValueError("bandwidth exceeds window budget")
            open_tile(lo)
            attempt += 1
    return (slot_row, color, tile_of,
            np.asarray(ws_list, np.int64), need_sup)


def build_slotted_plan(
    int_left: np.ndarray,
    int_right: np.ndarray,
    int_cn: np.ndarray,
    int_sn: np.ndarray,
    courant_coef: np.ndarray,  # [Ei]
    num_cells: int,
    max_sup: int = 4,
    rcap="auto",
    bnd=None,
    ndof: int = 3,
) -> Optional[SlottedPlan]:
    """Pack sorted interior edges into slot tiles. Returns None when any
    tile's cell window would exceed max_sup supers (mesh bandwidth too
    large for the static window budget — reorder with RCM).

    rcap caps the per-tile color count = the R-layout row height: an
    8-color packing halves the right-state gather/route work in the edge
    kernel and the fluxR traffic, at the cost of closing tiles earlier
    when colors run out. "auto" packs with 8 and falls back to 16 when
    that inflates the tile count by > 15%.

    bnd (unified mode): dict(left [Eb], cn, sn, ccoef, btype) folds the
    boundary edges into the same tiling as pseudo-edges with
    il == ir == the owning cell; the kernel replaces their gathered right
    state with the BC ghost state selected by the per-slot type code packed
    into the g plane's bits 4-5 (row picks are 4-bit)."""
    Ei = len(int_left)
    Eb = len(bnd["left"]) if bnd is not None else 0
    E = Ei + Eb
    if E == 0:
        return None

    from ...mesh import native

    bl = np.asarray(bnd["left"], np.int64) if bnd is not None else None
    sf = native.sort_fold(int_left, int_right, bl)
    if sf is not None:
        order, il, ir = sf
    else:
        # numpy fallback: materialise the concatenated edge list
        if bnd is not None:
            il_all = np.concatenate([int_left.astype(np.int64), bl])
            ir_all = np.concatenate([int_right.astype(np.int64), bl])
        else:
            il_all = int_left.astype(np.int64)
            ir_all = int_right.astype(np.int64)
        order = np.argsort(np.minimum(il_all, ir_all), kind="stable")
        il = il_all[order]
        ir = ir_all[order]

    # ---- one-pass packing + coloring (native, Python twin fallback) ----

    def pack(rc):
        packed = native.slot_pack(il, ir, max_sup, rcap=rc)
        if packed is None:
            packed = _slot_pack_py(il, ir, max_sup, rcap=rc)
        return packed

    try:
        if rcap == "auto":
            ideal = -(-E // TE)
            if native.available():
                # speculative: the 16-color pack runs concurrently with the
                # 8-color attempt (ctypes releases the GIL) so the fallback
                # decision costs no extra wall time
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(2) as _ex:
                    f8 = _ex.submit(pack, 8)
                    f16 = _ex.submit(pack, 16)
                    packed = f8.result()
                    rrows = 8
                    if len(packed[3]) > 1.02 * ideal:
                        packed16 = f16.result()
                        if len(packed[3]) > 1.15 * len(packed16[3]):
                            packed, rrows = packed16, 16
                    else:
                        f16.cancel()
            else:
                packed = pack(8)
                rrows = 8
                if len(packed[3]) > 1.02 * ideal:
                    packed16 = pack(16)
                    if len(packed[3]) > 1.15 * len(packed16[3]):
                        packed, rrows = packed16, 16
        else:
            packed = pack(int(rcap))
            rrows = RROWS if int(rcap) > 8 else 8
    except ValueError as e:
        _plan_debug(f"slot packing failed: {e}")
        return None
    slot_row, color, tile_of, ws_tile, need_sup = packed
    ws_rows = ws_tile[tile_of]  # [E] window start of each edge's tile
    # pad the tile count to a GT multiple; inert tiles inherit the LAST
    # window start so the shared group window stays tight (a 0 would blow
    # wq up to the whole mesh)
    ntiles = -(-len(ws_tile) // GT) * GT
    ws_tile = np.concatenate(
        [ws_tile, np.full(ntiles - len(ws_tile), ws_tile[-1], ws_tile.dtype)]
    )
    # group (grid-step) windows: tiles are min-cell sorted so ws is
    # nondecreasing; the group window = [min ws, max ws + nsup)
    ws_sup = (ws_tile // 8).astype(np.int32)
    grp = ws_sup.reshape(-1, GT)
    gws = grp.min(axis=1).astype(np.int32)
    wq = int((grp.max(axis=1) - gws).max()) + need_sup
    # scratch budget: 2 slots * ndof * wq supers of f32; 64 supers ~ 1.5 MB
    # VMEM at ndof=3. Larger GT makes the shared group window proportionally
    # wider, so the budget scales with GT. An absolute byte cap (ndof-aware,
    # RDYTPU_VMEM_BUDGET-configurable, default 96 MB of the ~128 MB VMEM)
    # backstops the per-GT heuristic so large-GT/ndof plans fall back to the
    # two-kernel path instead of failing pallas compilation.
    if wq > 64 * max(1, GT // 8):
        _plan_debug(f"group q window exceeds cap: wq={wq} > {64 * max(1, GT // 8)}")
        return None
    if _qbuf_bytes(wq, ndof) > _vmem_budget():
        _plan_debug(f"group q window exceeds VMEM budget: wq={wq} ndof={ndof}")
        return None

    # all index planes fit int8: window rows < max_sup*8 <= 120 (int8-safe,
    # < 128 even at the escalation cap max_sup=15), lanes < 128,
    # row picks < 16 (int8 plan traffic is 1/4 of the round-1 i32 planes)
    R_l, R_r = ntiles * 8, ntiles * rrows
    supL = np.zeros((R_l, 128), np.int8)
    supR = np.zeros((R_r, 128), np.int8)
    m_al = np.zeros((R_r, 128), np.int8)
    g_al = np.zeros((R_l, 128), np.int8)
    gi = np.zeros((R_r, 128), np.int8)
    mi = np.zeros((R_r, 128), np.int8)
    cn_s = np.zeros((R_l, 128), np.float32)
    sn_s = np.zeros((R_l, 128), np.float32)
    cc_s = np.zeros((R_l, 128), np.float32)
    slot_edge = np.full(R_l * 128, -1, np.int32)

    # native one-pass fill (bitwise twin of the numpy scatters below; at
    # the 2.88M-cell bench mesh the ~12 separate 5.7M-element fancy-index
    # passes cost ~3 s, the native sweep ~0.1 s)
    eposL = np.empty(E, np.int64)
    eposR = np.empty(E, np.int64)
    filled = native.fill_slot_planes(
        Ei, rrows, order, il, ir, int_cn, int_sn, courant_coef,
        (bnd["cn"], bnd["sn"], bnd["ccoef"], bnd["btype"])
        if bnd is not None else None,
        slot_row, color, tile_of, ws_tile, supL, supR, m_al, g_al, gi, mi,
        cn_s, sn_s, cc_s, slot_edge, eposL, eposR,
    )
    if filled is not False:
        return SlottedPlan(
            order=order, ntiles=ntiles, rrows=rrows, nsup=need_sup,
            wq=wq, gws=gws,
            ws=ws_sup,
            supL=supL, supR=supR, m=m_al, g=g_al, gi=gi, mi=mi,
            cn=cn_s, sn=sn_s,
            courant_coef=cc_s, slot_edge=slot_edge,
            eposL=eposL, eposR=eposR, bnd_pos=filled,
            il_s=il, ir_s=ir,
        )

    # ---- numpy fallback fill: concatenated per-edge attribute twins ----
    if bnd is not None:
        cn_all = np.concatenate([int_cn, bnd["cn"]])
        sn_all = np.concatenate([int_sn, bnd["sn"]])
        cc_all = np.concatenate([courant_coef, bnd["ccoef"]])
        # slot BC code: 0 interior; boundary types shifted by +1
        bt_all = np.concatenate(
            [np.zeros(Ei, np.int64), np.asarray(bnd["btype"], np.int64) + 1]
        )
    else:
        cn_all, sn_all, cc_all = int_cn, int_sn, courant_coef
        bt_all = None
    laneL = il & 127
    laneR = ir & 127
    rl = il // 128 - ws_rows
    rr = ir // 128 - ws_rows
    rowsL = tile_of * 8 + slot_row
    rowsR = tile_of * rrows + color
    supL[rowsL, laneL] = rl
    supR[rowsR, laneR] = rr
    m_al[rowsR, laneL] = laneR
    if bt_all is not None:
        # BC code packed into the align-row-pick plane's spare bits
        # (g < 16 always, so btype << 4 still fits int8)
        g_al[rowsL, laneL] = color | (bt_all[order] << 4)
    else:
        g_al[rowsL, laneL] = color
    gi[rowsR, laneL] = slot_row
    mi[rowsR, laneR] = laneL
    cn_c = cn_all[order].astype(np.float32)
    sn_c = sn_all[order].astype(np.float32)
    cc = cc_all[order].astype(np.float32)
    cn_s[rowsL, laneL] = cn_c
    sn_s[rowsL, laneL] = sn_c
    cc_s[rowsL, laneL] = cc
    eposL = rowsL * 128 + laneL
    eposR = rowsR * 128 + laneR
    bnd_pos = None
    if bt_all is not None:
        # slot -> operator edge id: interior slots get their rank among the
        # sorted interior edges (the operator's reordered interior index);
        # boundary slots get Ei + original boundary position (the boundary
        # block is never reordered)
        is_int = order < Ei
        opid = np.where(
            is_int, np.cumsum(is_int) - 1, Ei + (order - Ei)
        ).astype(np.int32)
        slot_edge[eposL] = opid
        inv_u = np.empty(E, np.int64)
        inv_u[order] = np.arange(E)
        bnd_pos = eposL[inv_u[Ei:]].astype(np.int32)
    else:
        slot_edge[eposL] = np.arange(E, dtype=np.int32)

    return SlottedPlan(
        order=order, ntiles=ntiles, rrows=rrows, nsup=need_sup,
        wq=wq, gws=gws,
        ws=ws_sup,
        supL=supL, supR=supR, m=m_al, g=g_al, gi=gi, mi=mi,
        cn=cn_s, sn=sn_s,
        courant_coef=cc_s, slot_edge=slot_edge,
        eposL=eposL, eposR=eposR, bnd_pos=bnd_pos,
        il_s=il, ir_s=ir,
    )


def build_cell_plan(
    plan: SlottedPlan,
    il_sorted: np.ndarray,  # sorted left cells [E]
    ir_sorted: np.ndarray,
    coefL: np.ndarray,  # [E] signed len/area wrt the left cell
    coefR: np.ndarray,
    num_cells: int,
    max_supL: int = 4,
    max_supR: int = 8,
    btype_sorted: Optional[np.ndarray] = None,
    ndof: int = 3,
    allow_fused_only: bool = False,
    cluster_k: bool = False,
) -> Optional[CellPlan]:
    C = num_cells
    E = len(il_sorted)
    Ct = -(-C // TE)
    Ct = -(-Ct // GT) * GT  # cell tiles, padded to a GT multiple

    from ...mesh import native

    # unified mode: each edge contributes only to the sides where its
    # signed coefficient is armed — interior edges both, boundary
    # pseudo-edges exactly one (their flux lands in BOTH rings, so
    # build_plan_arrays balances them onto the cell's emptier side to keep
    # the K planes — and with them the divergence gather-chain count —
    # minimal). The native filter fuses the masks, the epos // 128 row
    # computation, and the filtered copies into one pass per side; the L
    # and R sides are independent, so they run CONCURRENTLY (ctypes
    # releases the GIL — at 46M cells the paired passes halve ~70 s of
    # filter/stats wall time, round 5 VERDICT #5)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as _ex:
        fL = _ex.submit(native.cell_side_filter, il_sorted, plan.eposL,
                        coefL, btype_sorted)
        fR = _ex.submit(native.cell_side_filter, ir_sorted, plan.eposR,
                        coefR, btype_sorted)
        natL = fL.result()
        natR = fR.result()
    if natL is not None:
        il_l, rowL_l, coefL_l = natL
        ir_r, rowR_r, coefR_r = natR
    elif btype_sorted is not None:
        rowL = plan.eposL // 128
        rowR = plan.eposR // 128
        lmask = (btype_sorted == 0) | (coefL != 0.0)
        rmask = (btype_sorted == 0) | (coefR != 0.0)
        il_l = il_sorted[lmask]
        rowL_l = rowL[lmask]
        coefL_l = coefL[lmask]
        ir_r = ir_sorted[rmask]
        rowR_r = rowR[rmask]
        coefR_r = coefR[rmask]
    else:
        il_l, rowL_l, coefL_l = il_sorted, plan.eposL // 128, coefL
        ir_r, rowR_r, coefR_r = ir_sorted, plan.eposR // 128, coefR

    # rank-by-row + per-tile extents: native one-pass (bitwise twin of the
    # numpy lexsort/scatter path below; ~2.4 s -> ~0.2 s per build at the
    # 2.88M-cell bench mesh)
    kL = kR = None
    # cluster-k planes (aligned layout) have no native twin: rank the R
    # side by row bands in numpy and skip the native stats/fill fast path
    if cluster_k:
        statsL = statsR = None
    else:
        with ThreadPoolExecutor(2) as _ex:
            fL = _ex.submit(native.cell_side_stats, il_l, rowL_l, C, Ct)
            fR = _ex.submit(native.cell_side_stats, ir_r, rowR_r, C, Ct)
            statsL = fL.result()
            statsR = fR.result() if statsL is not None else None
    ctile_l = il_l // TE
    ctile_r = ir_r // TE
    if statsR is not None:
        KL, kL, tL_lo, tL_hi = statsL
        KR, kR, tR_lo, tR_hi = statsR
        if KL == 0 or KR == 0:
            return None
    else:
        if cluster_k:
            kL = _rank_by_row(il_l, rowL_l)
            kR = _rank_by_cluster(ir_r, rowR_r)
            KL = int(kL.max()) + 1 if len(kL) else 0
            KR = int(kR.max()) + 1 if len(kR) else 0
        else:
            KL = int(np.bincount(il_l, minlength=C).max()) \
                if len(il_l) else 0
            KR = int(np.bincount(ir_r, minlength=C).max()) \
                if len(ir_r) else 0
        if KL == 0 or KR == 0:
            return None

        tL_lo = np.full(Ct, np.iinfo(np.int64).max)
        tL_hi = np.zeros(Ct, np.int64)
        tR_lo = np.full(Ct, np.iinfo(np.int64).max)
        tR_hi = np.zeros(Ct, np.int64)
        np.minimum.at(tL_lo, ctile_l, rowL_l)
        np.maximum.at(tL_hi, ctile_l, rowL_l)
        np.minimum.at(tR_lo, ctile_r, rowR_r)
        np.maximum.at(tR_hi, ctile_r, rowR_r)
    tL_lo = np.minimum(tL_lo, tL_hi)
    tR_lo = np.minimum(tR_lo, tR_hi)
    wsL = (tL_lo >> 3) << 3
    wsR = (tR_lo >> 3) << 3
    nsupL = int((tL_hi - wsL).max()) // 8 + 1
    nsupR = int((tR_hi - wsR).max()) // 8 + 1
    two_kernel_ok = nsupL <= max_supL and nsupR <= max_supR
    if not two_kernel_ok:
        _plan_debug(
            f"cell plan per-tile windows exceed the two-kernel budget: "
            f"nsupL={nsupL}/{max_supL} nsupR={nsupR}/{max_supR}"
            + (" (fused-only)" if allow_fused_only else "")
        )
        if not allow_fused_only:
            return None
        # keep the scan caps sane for budget arithmetic below; the per-tile
        # sup planes are invalid (flagged) but the per-k planes are exact
        nsupL = min(nsupL, max_supL)
        nsupR = min(nsupR, max_supR)

    # cell tiles with no incident edges on a side (padding tiles) inherit
    # the previous tile's window start so group windows stay tight
    def _fill_empty(ws, ctiles):
        mask = np.zeros(Ct, bool)
        mask[ctiles] = True
        idx = np.where(mask, np.arange(Ct), -1)
        np.maximum.accumulate(idx, out=idx)
        if (idx < 0).any():
            first = idx[idx >= 0][0] if (idx >= 0).any() else 0
            idx = np.where(idx >= 0, idx, first)
        return ws[idx]

    wsL = _fill_empty(wsL, ctile_l)
    wsR = _fill_empty(wsR, ctile_r)
    # group (grid-step) shared flux windows
    grpL = (wsL // 8).reshape(-1, GT)
    grpR = (wsR // 8).reshape(-1, GT)
    gwsL = grpL.min(axis=1).astype(np.int32)
    gwsR = grpR.min(axis=1).astype(np.int32)
    wl = int((grpL.max(axis=1) - gwsL).max()) + nsupL
    wr = int((grpR.max(axis=1) - gwsR).max()) + nsupR
    # group-window scratch budget scales with GT (same reasoning as the
    # edge-plan wq cap: wider groups -> proportionally wider shared windows);
    # the byte cap folds in ndof (ADVICE r2: tracer runs scale scratch
    # linearly with ndof but previously passed the super-count caps)
    if not two_kernel_ok:
        wl = min(wl, nsupL + GT)
        wr = min(wr, nsupR + GT)
    if wl > 64 * max(1, GT // 8) or wr > 64 * max(1, GT // 8):
        _plan_debug(f"cell group windows exceed cap: wl={wl} wr={wr}")
        return None
    if 2 * (wl + wr) * 8 * ndof * 128 * 4 > _vmem_budget():
        _plan_debug(f"cell group windows exceed VMEM: wl={wl} wr={wr}")
        return None

    supLc = np.zeros((KL, Ct * 8, 128), np.int8)
    cfL = np.zeros((KL, Ct * 8, 128), np.float32)
    supRc = np.zeros((KR, Ct * 8, 128), np.int8)
    cfR = np.zeros((KR, Ct * 8, 128), np.float32)
    # per-k-RELATIVE sup planes for the fused kernels (int8-safe at any
    # bandwidth; padding entries are 0 with coef 0)
    supLk = np.zeros((KL, Ct * 8, 128), np.int8)
    supRk = np.zeros((KR, Ct * 8, 128), np.int8)

    crowL = il_l // 128
    claneL = il_l & 127
    crowR = ir_r // 128
    claneR = ir_r & 127
    if kL is not None:
        # native per-(k, tile) windows + K-plane scatters (bitwise twin of
        # the numpy path below); sides run concurrently
        with ThreadPoolExecutor(2) as _ex:
            fL = _ex.submit(
                native.cell_side_fill, il_l, rowL_l, kL, coefL_l, wsL,
                (wsL // 8), KL, Ct, supLc, cfL, supLk,
            )
            fR = _ex.submit(
                native.cell_side_fill, ir_r, rowR_r, kR, coefR_r, wsR,
                (wsR // 8), KR, Ct, supRc, cfR, supRk,
            )
            wkL, nsupL_ks = fL.result()
            wkR, nsupR_ks = fR.result()
        if max(nsupL_ks) > 15 or max(nsupR_ks) > 15:
            _plan_debug(
                f"per-k windows exceed int8: {nsupL_ks} / {nsupR_ks}"
            )
            return None
    else:
        if kL is None:
            kL = _rank_by_row(il_l, rowL_l)
            kR = _rank_by_row(ir_r, rowR_r)
        supLc[kL, crowL, claneL] = (rowL_l - wsL[ctile_l]).astype(np.int8)
        cfL[kL, crowL, claneL] = coefL_l.astype(np.float32)
        supRc[kR, crowR, claneR] = (rowR_r - wsR[ctile_r]).astype(np.int8)
        cfR[kR, crowR, claneR] = coefR_r.astype(np.float32)

        wkL, nsupL_ks = _per_k_windows(
            kL, il_l, rowL_l, KL, Ct, (wsL // 8).astype(np.int64)
        )
        wkR, nsupR_ks = _per_k_windows(
            kR, ir_r, rowR_r, KR, Ct, (wsR // 8).astype(np.int64)
        )
        if max(nsupL_ks) > 15 or max(nsupR_ks) > 15:
            # per-k windows must stay int8-representable (nsup_k * 8 <= 120)
            _plan_debug(
                f"per-k windows exceed int8: {nsupL_ks} / {nsupR_ks}"
            )
            return None

        wkL2 = wkL.reshape(KL + 1, Ct)[1:]
        wkR2 = wkR.reshape(KR + 1, Ct)[1:]
        supLk[kL, crowL, claneL] = (
            rowL_l - wkL2[kL, il_l // TE] * 8
        ).astype(np.int8)
        supRk[kR, crowR, claneR] = (
            rowR_r - wkR2[kR, ir_r // TE] * 8
        ).astype(np.int8)

    def slot_coefs(valsL, valsR):
        """Fill extra per-edge-side coefficient sets with the same
        (cell, slot) indexing (for the MUSCL LS-gradient kernel)."""
        outL, outR = [], []
        for v in valsL:
            arr = np.zeros((KL, Ct * 8, 128), np.float32)
            arr[kL, crowL, claneL] = v.astype(np.float32)
            outL.append(arr)
        for v in valsR:
            arr = np.zeros((KR, Ct * 8, 128), np.float32)
            arr[kR, crowR, claneR] = v.astype(np.float32)
            outR.append(arr)
        return outL, outR

    # extend the per-k window tables with per-(k, tile) ACTUAL span counts:
    # layout [2K+1, Ct] flat = [legacy row 0 | K window starts | K counts].
    # The static nsup_ks are tile MAXIMA (the whole mesh pays the worst
    # tile); the fused cell phase gates its gather chain on the per-tile
    # count instead (measured on the 2.88M bench raster: statics (5,5)/
    # (5,4) vs actual ~3 per plane — ~36% of the chain is dead work).
    def _per_k_counts(supk, cfk, K):
        rows = np.arange(Ct * 8) // 8
        cnt = np.zeros((K, Ct), np.int32)
        for k in range(K):
            v = np.where(cfk[k] != 0.0, (supk[k].astype(np.int32) >> 3) + 1,
                         0).max(axis=1)
            np.maximum.at(cnt[k], rows, v)
        return cnt

    wkL = np.concatenate(
        [wkL.reshape(KL + 1, Ct).astype(np.int32),
         _per_k_counts(supLk, cfL, KL)]
    ).reshape(-1)
    wkR = np.concatenate(
        [wkR.reshape(KR + 1, Ct).astype(np.int32),
         _per_k_counts(supRk, cfR, KR)]
    ).reshape(-1)

    cp = CellPlan(
        ntiles=Ct, nsupL=nsupL, nsupR=nsupR, wl=wl, wr=wr,
        wsL=(wsL // 8).astype(np.int32), wsR=(wsR // 8).astype(np.int32),
        gwsL=gwsL, gwsR=gwsR,
        supL=supLc, cfL=cfL, supR=supRc, cfR=cfR,
        wkL=wkL, wkR=wkR, nsupL_ks=nsupL_ks, nsupR_ks=nsupR_ks,
        supLk=supLk, supRk=supRk, two_kernel_ok=two_kernel_ok,
    )
    return cp, slot_coefs


# --------------------------------------------------------------- kernels

def _fetch_gather(fetch, sup_idx, comp, nsup):
    """Sublane-gather one component over nsup window supers, reading each
    super via fetch(comp, s) (a VMEM-scratch slice)."""
    if "gather" in _ABLATE:
        return fetch(comp, 0)
    acc = jnp.zeros((8, 128), jnp.float32)
    for s in range(nsup):
        src = fetch(comp, s)
        gat = jnp.take_along_axis(
            src, jnp.clip(sup_idx - s * 8, 0, 7), axis=0
        )
        acc = jnp.where((sup_idx >> 3) == s, gat, acc)
    return acc


def _window_gather(q_refs, sup_idx, comp, nsup):
    """Sublane-gather one component over nsup window supers."""
    acc = jnp.zeros((8, 128), jnp.float32)
    for s in range(nsup):
        src = q_refs[s][comp]
        gat = jnp.take_along_axis(
            src, jnp.clip(sup_idx - s * 8, 0, 7), axis=0
        )
        acc = jnp.where((sup_idx >> 3) == s, gat, acc)
    return acc


def _tile_edge_fluxes(fetch, supL, supR0, mm0, supR1, mm1, g, cn, sn,
                      nsup, ndof, upwind, tiny_h, h_anuga,
                      hr_dz=None, bs_vals=None, btype=None, bnd_kinds=(),
                      dir_vals=None):
    """Shared per-tile slot math: gather L/R states through the window
    `fetch`, align R->L, solve Roe (flow or coupled tracer), apply the
    HR/BS2002 variants, and dry-mask. Returns (fluxes[ndof], amax) as
    (8, 128) vregs in the L-layout.

    btype (unified plans): per-slot BC code (0 interior, 1 Dirichlet,
    2 reflecting, 3 critical outflow). Boundary slots gather the owning
    cell as BOTH states (il == ir in the plan); their right state is then
    replaced with the ghost state of the slot's BC — the in-kernel
    equivalent of the reference's per-boundary flux sub-operators
    (swe_fluxes_ceed.h:104-271). bnd_kinds is the static set of codes
    present (absent kinds compile to nothing); dir_vals = (h, u, v) ghost
    planes for Dirichlet slots, slotted from the runtime boundary values."""
    qs = []
    for comp in range(ndof):
        qL = _fetch_gather(fetch, supL, comp, nsup)
        z1a = _fetch_gather(fetch, supR0, comp, nsup)
        z2a = (
            z1a if "shuffle" in _ABLATE
            else jnp.take_along_axis(z1a, mm0, axis=1)
        )
        ya = jnp.take_along_axis(z2a, jnp.clip(g, 0, 7), axis=0)
        if supR1 is not None:
            z1b = _fetch_gather(fetch, supR1, comp, nsup)
            z2b = (
                z1b if "shuffle" in _ABLATE
                else jnp.take_along_axis(z1b, mm1, axis=1)
            )
            yb = jnp.take_along_axis(z2b, jnp.clip(g - 8, 0, 7), axis=0)
            qR = jnp.where(g < 8, ya, yb)
        else:
            qR = ya
        qs.append((qL, qR))

    (hl, hr_), (hul, hur), (hvl, hvr) = qs[:3]
    # velocities/concentrations from the RAW states; depths
    # hydrostatically reconstructed when hr
    # (swe_fluxes_hydro_recon_ceed.h: eta - max(z))
    ul, vl = regularized_velocity(hl, hul, hvl, tiny_h, h_anuga)
    ur, vr = regularized_velocity(hr_, hur, hvr, tiny_h, h_anuga)
    if btype is not None:
        from ...constants import GRAVITY

        if 2 in bnd_kinds:  # reflecting wall (swe_fluxes_ceed.h:158-212)
            is_b = btype == 2
            dum1 = sn * sn - cn * cn
            dum2 = 2.0 * sn * cn
            hr_ = jnp.where(is_b, hl, hr_)
            ur = jnp.where(is_b, ul * dum1 - vl * dum2, ur)
            vr = jnp.where(is_b, -ul * dum2 - vl * dum1, vr)
        if 3 in bnd_kinds:  # critical outflow (swe_fluxes_ceed.h:214-271)
            is_b = btype == 3
            g_c = jnp.float32(GRAVITY)
            uperp = ul * cn + vl * sn
            outgoing = uperp >= 0.0
            qcr = hl * jnp.abs(uperp)
            h_crit = jnp.cbrt(qcr * qcr / g_c)
            vel = jnp.sqrt(g_c * h_crit)
            hr_ = jnp.where(is_b, jnp.where(outgoing, h_crit, 0.0), hr_)
            ur = jnp.where(is_b, jnp.where(outgoing, vel * cn, 0.0), ur)
            vr = jnp.where(is_b, jnp.where(outgoing, vel * sn, 0.0), vr)
            blocked = is_b & ~outgoing  # inflow: both sides dry, no flux
            hl = jnp.where(blocked, 0.0, hl)
            ul = jnp.where(blocked, 0.0, ul)
            vl = jnp.where(blocked, 0.0, vl)
        if 1 in bnd_kinds:  # Dirichlet (swe_fluxes_ceed.h:104-156)
            is_b = btype == 1
            hr_ = jnp.where(is_b, dir_vals[0], hr_)
            ur = jnp.where(is_b, dir_vals[1], ur)
            vr = jnp.where(is_b, dir_vals[2], vr)
    if hr_dz is not None:
        hl_f = jnp.maximum(0.0, hl - hr_dz[0])
        hr_f = jnp.maximum(0.0, hr_ - hr_dz[1])
    else:
        hl_f, hr_f = hl, hr_
    if "roe" in _ABLATE and ndof == 3:
        flux_list = [
            0.5 * (hl_f + hr_f), 0.5 * (hul + hur), 0.5 * (hvl + hvr)
        ]
        amax = hl_f
    elif ndof == 3:
        f_h, f_hu, f_hv, amax = roe_flux(
            hl_f, ul, vl, hr_f, ur, vr, sn, cn, fast=True
        )
        flux_list = [f_h, f_hu, f_hv]
    else:
        from ..tracer.flux import safe_div, tracer_roe_flux

        cil = jnp.stack([safe_div(c[0], hl, hl, tiny_h) for c in qs[3:]])
        cir = jnp.stack([safe_div(c[1], hr_, hr_, tiny_h) for c in qs[3:]])
        if btype is not None:
            # ghost concentrations per BC (operator._finish_tracer twins):
            # reflecting slots need nothing (il == ir makes hcR == hcL and
            # hr_ == hl, so cir == cil already); critical outflow extends
            # the reference with the upstream concentration; Dirichlet
            # prescribes it (dir_vals rows 3+)
            if 3 in bnd_kinds:
                cir = jnp.where(btype == 3, cil, cir)
            if 1 in bnd_kinds:
                cir = jnp.where(
                    btype == 1,
                    jnp.stack([dir_vals[3 + j] for j in range(ndof - 3)]),
                    cir,
                )
        f_flow, f_tr, amax = tracer_roe_flux(
            hl_f, ul, vl, cil, hr_f, ur, vr, cir, sn, cn, upwind
        )
        flux_list = [f_flow[0], f_flow[1], f_flow[2]] + [
            f_tr[j] for j in range(ndof - 3)
        ]
    if bs_vals is not None:
        # BS2002 momentum correction (swe_roe_flux_ceed.h:117-119):
        # g * dhv^2 / 24 * (cn, sn) with dhv from the endpoint etas
        from ...constants import GRAVITY

        etab, etae, zvb, zve = bs_vals
        hvb = jnp.maximum(etab - zvb, 0.0)
        hve = jnp.maximum(etae - zve, 0.0)
        dhv = hve - hvb
        corr = jnp.float32(GRAVITY / 24.0) * dhv * dhv
        flux_list[1] = flux_list[1] + corr * cn
        flux_list[2] = flux_list[2] + corr * sn
    if hr_dz is not None:
        if ndof == 3:
            # outer guard: both *raw* dry; inner: both *reconstructed*
            # dry (swe_petsc.c:1094,1112)
            dry = ((hl < tiny_h) & (hr_ < tiny_h)) | (
                (hl_f <= tiny_h) & (hr_f <= tiny_h)
            )
        else:
            # tracer twin's convention (operator.py _apply_tracer)
            dry = ~(
                ((hl > tiny_h) | (hr_ > tiny_h))
                & ((hl_f > tiny_h) | (hr_f > tiny_h))
            )
    else:
        dry = (hl < tiny_h) & (hr_ < tiny_h)
    # no valid-slot mask: unfilled slots produce finite garbage that
    # the divergence (coef 0) and Courant (coef 0) plans never read
    mask = jnp.where(dry, 0.0, 1.0)
    fluxes = [f * mask for f in flux_list]
    return fluxes, amax * mask


def _edge_kernel(ws_ref, gws_ref, supL_ref, supR_ref, m_ref, g_ref, gi_ref,
                 mi_ref, cn_ref, sn_ref, *rest,
                 nsup, wq, ndof, upwind, tiny_h, h_anuga, rrows=RROWS,
                 hr=False, bs=False):
    """Group-window edge kernel: ONE q-window DMA of wq supers per grid
    step (shared by its GT tiles, double-buffered against compute) instead
    of GT * nsup per-tile fetches — adjacent tiles' windows overlap by
    (nsup - 1)/nsup, so the shared fetch cuts q HBM traffic ~2x."""
    if hr:
        dzl_ref, dzr_ref = rest[0], rest[1]
        rest = rest[2:]
    if bs:
        etab_ref, etae_ref, zvb_ref, zve_ref = rest[:4]
        rest = rest[4:]
    q_hbm = rest[0]
    oL_ref, oA_ref, oR_ref = rest[1], rest[2], rest[3]
    qbuf, sem = rest[4], rest[5]

    t = pl.program_id(0)
    nsteps = pl.num_programs(0)

    def _q_dma(slot, tt):
        rr = pl.multiple_of(gws_ref[tt] * 8, 8)
        return pltpu.make_async_copy(
            q_hbm.at[:, pl.ds(rr, wq * 8), :], qbuf.at[slot], sem.at[slot]
        )

    slot = jax.lax.rem(t, jnp.int32(2))
    nslot = jax.lax.rem(t + jnp.int32(1), jnp.int32(2))

    @pl.when(t == 0)
    def _():
        _q_dma(0, 0).start()

    @pl.when(t + 1 < nsteps)
    def _():
        _q_dma(nslot, t + 1).start()

    _q_dma(slot, t).wait()

    # int8 plan blocks -> i32 once per grid step (sublane-slicing i8 at
    # 8-row granularity straddles the (32, 128) i8 tile, so widen first)
    supL_all = supL_ref[:].astype(jnp.int32)
    supR_all = supR_ref[:].astype(jnp.int32)
    m_all = m_ref[:].astype(jnp.int32)
    g_all_i = g_ref[:].astype(jnp.int32)
    gi_all = gi_ref[:].astype(jnp.int32)
    mi_all = mi_ref[:].astype(jnp.int32)

    for gt in range(GT):
        r8 = slice(gt * 8, gt * 8 + 8)
        rA = slice(gt * rrows, gt * rrows + 8)
        rB = slice(gt * rrows + 8, gt * rrows + 16)
        off = (ws_ref[t * GT + gt] - gws_ref[t]) * 8  # 8-row aligned

        def fetch(comp, sup_s):
            return qbuf[slot, comp, pl.ds(off + sup_s * 8, 8), :]

        supL = supL_all[r8, :]
        supR0 = supR_all[rA, :]
        mm0 = m_all[rA, :]
        supR1 = mm1 = None
        if rrows == 16:
            supR1 = supR_all[rB, :]
            mm1 = m_all[rB, :]
        g = g_all_i[r8, :]
        fluxes, amax = _tile_edge_fluxes(
            fetch, supL, supR0, mm0, supR1, mm1, g,
            cn_ref[r8, :], sn_ref[r8, :],
            nsup, ndof, upwind, tiny_h, h_anuga,
            hr_dz=(dzl_ref[r8, :], dzr_ref[r8, :]) if hr else None,
            bs_vals=(
                (etab_ref[r8, :], etae_ref[r8, :],
                 zvb_ref[r8, :], zve_ref[r8, :]) if bs else None
            ),
        )
        for comp in range(ndof):
            oL_ref[r8, comp, :] = fluxes[comp]
        oA_ref[r8, :] = amax

        # route fluxes into the R-layout for the divergence kernel
        gi0 = gi_all[rA, :]
        mi0 = mi_all[rA, :]
        if rrows == 16:
            gi1 = gi_all[rB, :]
            mi1 = mi_all[rB, :]
        for comp in range(ndof):
            fL = fluxes[comp]
            u0 = jnp.take_along_axis(fL, gi0, axis=0)
            oR_ref[rA, comp, :] = jnp.take_along_axis(u0, mi0, axis=1)
            if rrows == 16:
                u1 = jnp.take_along_axis(fL, gi1, axis=0)
                oR_ref[rB, comp, :] = jnp.take_along_axis(u1, mi1, axis=1)


def edge_flux_slotted(
    arrays, q, tiny_h, h_anuga, nsup, wq, ndof=3, upwind=False,
    interpret=False, hr=False, bs=None,
):
    """Run the slot-routed edge kernel.

    q: [>=ndof, C] f32 (rows 0..2 flow, 3.. tracers). hr=True applies
    hydrostatic reconstruction from the slotted pl_hr_dzl/pl_hr_dzr drops.
    bs=(etab, etae) applies the BS2002 momentum correction from the slotted
    endpoint etas + the static pl_bs.zvb/zve elevations.
    Returns (fluxL [ntiles*8, ndof, 128], fluxR [ntiles*rrows, ndof, 128],
    amax [ntiles*8, 128])."""
    supL = arrays.pl_supL
    ntiles = supL.shape[0] // 8
    rrows = arrays.pl_supR.shape[0] // ntiles
    nsteps = ntiles // GT
    C = q.shape[1]
    Crows = -(-C // 128)
    q32 = q[:ndof].astype(jnp.float32)
    if C % 128:
        q32 = jnp.pad(q32, ((0, 0), (0, Crows * 128 - C)))
    q2d = jnp.pad(
        q32.reshape(ndof, Crows, 128), ((0, 0), (0, wq * 8 + 8), (0, 0))
    )

    in_specs = [
        pl.BlockSpec((GT * 8, 128), lambda t, ws, gw: (t, 0)),      # supL i8
        pl.BlockSpec((GT * rrows, 128), lambda t, ws, gw: (t, 0)),  # supR i8
        pl.BlockSpec((GT * rrows, 128), lambda t, ws, gw: (t, 0)),  # m i8
        pl.BlockSpec((GT * 8, 128), lambda t, ws, gw: (t, 0)),      # g i8
        pl.BlockSpec((GT * rrows, 128), lambda t, ws, gw: (t, 0)),  # gi i8
        pl.BlockSpec((GT * rrows, 128), lambda t, ws, gw: (t, 0)),  # mi i8
        pl.BlockSpec((GT * 8, 128), lambda t, ws, gw: (t, 0)),      # cn
        pl.BlockSpec((GT * 8, 128), lambda t, ws, gw: (t, 0)),      # sn
    ] + ([
        pl.BlockSpec((GT * 8, 128), lambda t, ws, gw: (t, 0)),      # hr dzl
        pl.BlockSpec((GT * 8, 128), lambda t, ws, gw: (t, 0)),      # hr dzr
    ] if hr else []) + ([
        pl.BlockSpec((GT * 8, 128), lambda t, ws, gw: (t, 0)),      # bs etab
        pl.BlockSpec((GT * 8, 128), lambda t, ws, gw: (t, 0)),      # bs etae
        pl.BlockSpec((GT * 8, 128), lambda t, ws, gw: (t, 0)),      # bs zvb
        pl.BlockSpec((GT * 8, 128), lambda t, ws, gw: (t, 0)),      # bs zve
    ] if bs is not None else []) + [
        pl.BlockSpec(memory_space=pltpu.ANY),  # q2d (group-window DMA)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((GT * 8, ndof, 128), lambda t, ws, gw: (t, 0, 0)),
            pl.BlockSpec((GT * 8, 128), lambda t, ws, gw: (t, 0)),
            pl.BlockSpec(
                (GT * rrows, ndof, 128), lambda t, ws, gw: (t, 0, 0)
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ndof, wq * 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    f = pl.pallas_call(
        functools.partial(
            _edge_kernel, nsup=nsup, wq=wq, ndof=ndof, upwind=bool(upwind),
            tiny_h=float(tiny_h), h_anuga=float(h_anuga), rrows=rrows,
            hr=bool(hr), bs=bs is not None,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ntiles * 8, ndof, 128), jnp.float32),
            jax.ShapeDtypeStruct((ntiles * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((ntiles * rrows, ndof, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )
    hr_args = (arrays.pl_hr_dzl, arrays.pl_hr_dzr) if hr else ()
    bs_args = (
        (bs[0], bs[1], arrays.pl_bs.zvb, arrays.pl_bs.zve)
        if bs is not None else ()
    )
    fluxL, amax, fluxR = f(
        arrays.pl_ws, arrays.pl_gws, supL, arrays.pl_supR, arrays.pl_m,
        arrays.pl_g, arrays.pl_gi, arrays.pl_mi,
        arrays.pl_cn, arrays.pl_sn, *hr_args, *bs_args,
        q2d,
    )
    return fluxL, fluxR, amax


def _cell_kernel(wsl_ref, wsr_ref, gwl_ref, gwr_ref,
                 sL_ref, cL_ref, sR_ref, cR_ref, fL_hbm, fR_hbm,
                 o_ref, flbuf, frbuf, semL, semR, *,
                 nsupL, nsupR, KL, KR, ncomp, wl, wr, drain=False):
    """Group-window divergence: ONE fluxL + ONE fluxR DMA window per grid
    step (shared by GT cell tiles, double-buffered) — round-1 read each
    fluxR byte ~3x through overlapping per-tile windows.

    drain=True: positivity-limit pre-pass — the flux windows carry only
    the mass component and the accumulation keeps the DRAINING part,
    sum(min(f_h * coef, 0)), per cell (operator._apply_positivity_limit's
    `contrib`/`drain` in slotted form)."""
    t = pl.program_id(0)
    nsteps = pl.num_programs(0)

    def _dma(slot, tt):
        rl = pl.multiple_of(gwl_ref[tt] * 8, 8)
        rr = pl.multiple_of(gwr_ref[tt] * 8, 8)
        if drain:  # mass component only
            return (
                pltpu.make_async_copy(
                    fL_hbm.at[pl.ds(rl, wl * 8), 0], flbuf.at[slot],
                    semL.at[slot],
                ),
                pltpu.make_async_copy(
                    fR_hbm.at[pl.ds(rr, wr * 8), 0], frbuf.at[slot],
                    semR.at[slot],
                ),
            )
        return (
            pltpu.make_async_copy(
                fL_hbm.at[pl.ds(rl, wl * 8)], flbuf.at[slot], semL.at[slot]
            ),
            pltpu.make_async_copy(
                fR_hbm.at[pl.ds(rr, wr * 8)], frbuf.at[slot], semR.at[slot]
            ),
        )

    slot = jax.lax.rem(t, jnp.int32(2))
    nslot = jax.lax.rem(t + jnp.int32(1), jnp.int32(2))

    @pl.when(t == 0)
    def _():
        for d in _dma(0, 0):
            d.start()

    @pl.when(t + 1 < nsteps)
    def _():
        for d in _dma(nslot, t + 1):
            d.start()

    for d in _dma(slot, t):
        d.wait()

    # widen the int8 slot planes once (i8 sublane slices straddle tiles)
    sL_all = sL_ref[:].astype(jnp.int32)
    sR_all = sR_ref[:].astype(jnp.int32)

    for gt in range(GT):
        r8 = slice(gt * 8, gt * 8 + 8)
        offL = (wsl_ref[t * GT + gt] - gwl_ref[t]) * 8
        offR = (wsr_ref[t * GT + gt] - gwr_ref[t]) * 8
        acc = [jnp.zeros((8, 128), jnp.float32) for _ in range(ncomp)]

        def side(buf, off, s_all, c_ref, K, nsup):
            for k in range(K):
                sup = s_all[k, r8]
                cf = c_ref[k, r8]
                for comp in range(ncomp):
                    gat = jnp.zeros((8, 128), jnp.float32)
                    for s in range(nsup):
                        if drain:
                            src = buf[
                                slot,
                                pl.ds(pl.multiple_of(off + s * 8, 8), 8),
                                :,
                            ]
                        else:
                            src = buf[
                                slot,
                                pl.ds(pl.multiple_of(off + s * 8, 8), 8),
                                comp, :,
                            ]
                        gg = jnp.take_along_axis(
                            src, jnp.clip(sup - s * 8, 0, 7), axis=0
                        )
                        gat = jnp.where((sup >> 3) == s, gg, gat)
                    if drain:
                        acc[comp] = acc[comp] + jnp.minimum(gat * cf, 0.0)
                    else:
                        acc[comp] = acc[comp] + gat * cf

        side(flbuf, offL, sL_all, cL_ref, KL, nsupL)
        side(frbuf, offR, sR_all, cR_ref, KR, nsupR)
        for comp in range(ncomp):
            o_ref[r8, comp, :] = acc[comp]


def cell_div_slotted(arrays, fluxL, fluxR, nsupL, nsupR, wl, wr, ncomp=3,
                     interpret=False):
    """Flux divergence from the two slotted flux layouts.

    Returns [Ct*8, ncomp, 128] (ROW-major — unlike fused_rhs_slotted,
    which emits component-major [ncomp, Ct*8, 128]); flatten with
    `out.transpose(1, 0, 2).reshape(ncomp, -1)[:, :C]`."""
    supL = arrays.pl_cd_supL
    KL, RcL, _ = supL.shape
    KR = arrays.pl_cd_supR.shape[0]
    Ct = RcL // 8
    nsteps = Ct // GT
    fluxL = jnp.pad(fluxL, ((0, wl * 8 + 8), (0, 0), (0, 0)))
    fluxR = jnp.pad(fluxR, ((0, wr * 8 + RROWS), (0, 0), (0, 0)))

    in_specs = [
        pl.BlockSpec((KL, GT * 8, 128), lambda t, a, b, c, d: (0, t, 0)),
        pl.BlockSpec((KL, GT * 8, 128), lambda t, a, b, c, d: (0, t, 0)),
        pl.BlockSpec((KR, GT * 8, 128), lambda t, a, b, c, d: (0, t, 0)),
        pl.BlockSpec((KR, GT * 8, 128), lambda t, a, b, c, d: (0, t, 0)),
        pl.BlockSpec(memory_space=pltpu.ANY),  # fluxL (group-window DMA)
        pl.BlockSpec(memory_space=pltpu.ANY),  # fluxR
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (GT * 8, ncomp, 128), lambda t, a, b, c, d: (t, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, wl * 8, ncomp, 128), jnp.float32),
            pltpu.VMEM((2, wr * 8, ncomp, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    f = pl.pallas_call(
        functools.partial(
            _cell_kernel, nsupL=nsupL, nsupR=nsupR, KL=KL, KR=KR,
            ncomp=ncomp, wl=wl, wr=wr,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Ct * 8, ncomp, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )
    return f(
        arrays.pl_cd_wsL, arrays.pl_cd_wsR,
        arrays.pl_cd_gwsL, arrays.pl_cd_gwsR,
        arrays.pl_cd_supL, arrays.pl_cd_cfL,
        arrays.pl_cd_supR, arrays.pl_cd_cfR,
        fluxL, fluxR,
    )


def cell_drain_slotted(arrays, fluxL, fluxR, nsupL, nsupR, wl, wr,
                       interpret=False):
    """Per-cell DRAINING mass rate sum(min(f_h * coef, 0)) from the two
    slotted flux layouts (the positivity limiter's `drain` accumulation,
    operator._apply_positivity_limit). Returns [Ct*8, 128] f32."""
    supL = arrays.pl_cd_supL
    KL, RcL, _ = supL.shape
    KR = arrays.pl_cd_supR.shape[0]
    Ct = RcL // 8
    nsteps = Ct // GT
    fluxL = jnp.pad(fluxL, ((0, wl * 8 + 8), (0, 0), (0, 0)))
    fluxR = jnp.pad(fluxR, ((0, wr * 8 + RROWS), (0, 0), (0, 0)))

    in_specs = [
        pl.BlockSpec((KL, GT * 8, 128), lambda t, a, b, c, d: (0, t, 0)),
        pl.BlockSpec((KL, GT * 8, 128), lambda t, a, b, c, d: (0, t, 0)),
        pl.BlockSpec((KR, GT * 8, 128), lambda t, a, b, c, d: (0, t, 0)),
        pl.BlockSpec((KR, GT * 8, 128), lambda t, a, b, c, d: (0, t, 0)),
        pl.BlockSpec(memory_space=pltpu.ANY),  # fluxL (mass comp DMA)
        pl.BlockSpec(memory_space=pltpu.ANY),  # fluxR
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (GT * 8, 1, 128), lambda t, a, b, c, d: (t, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, wl * 8, 128), jnp.float32),
            pltpu.VMEM((2, wr * 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    f = pl.pallas_call(
        functools.partial(
            _cell_kernel, nsupL=nsupL, nsupR=nsupR, KL=KL, KR=KR,
            ncomp=1, wl=wl, wr=wr, drain=True,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Ct * 8, 1, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )
    out = f(
        arrays.pl_cd_wsL, arrays.pl_cd_wsR,
        arrays.pl_cd_gwsL, arrays.pl_cd_gwsR,
        arrays.pl_cd_supL, arrays.pl_cd_cfL,
        arrays.pl_cd_supR, arrays.pl_cd_cfR,
        fluxL, fluxR,
    )
    return out[:, 0, :]


def _pos_scale_kernel(ws_ref, supL_ref, supR_ref, m_ref, g_ref, gi_ref,
                      mi_ref, fL_ref, fR_ref, *rest, nsup, rrows):
    """Scale every edge slot's flux by the donor cell's positivity factor
    gathered through the q-window machinery (s plays the role of q)."""
    s_all = rest[: GT * nsup]
    oL_ref, oR_ref = rest[GT * nsup], rest[GT * nsup + 1]

    supL_all = supL_ref[:].astype(jnp.int32)
    supR_all = supR_ref[:].astype(jnp.int32)
    m_all = m_ref[:].astype(jnp.int32)
    g_all_i = g_ref[:].astype(jnp.int32)
    gi_all = gi_ref[:].astype(jnp.int32)
    mi_all = mi_ref[:].astype(jnp.int32)

    for gt in range(GT):
        r8 = slice(gt * 8, gt * 8 + 8)
        rA = slice(gt * rrows, gt * rrows + 8)
        rB = slice(gt * rrows + 8, gt * rrows + 16)
        s_refs = s_all[gt * nsup : (gt + 1) * nsup]
        supL = supL_all[r8, :]
        supR0 = supR_all[rA, :]
        mm0 = m_all[rA, :]
        g = g_all_i[r8, :]

        sL = _window_gather(s_refs, supL, 0, nsup)
        z1a = _window_gather(s_refs, supR0, 0, nsup)
        z2a = jnp.take_along_axis(z1a, mm0, axis=1)
        ya = jnp.take_along_axis(z2a, jnp.clip(g, 0, 7), axis=0)
        if rrows == 16:
            supR1 = supR_all[rB, :]
            mm1 = m_all[rB, :]
            z1b = _window_gather(s_refs, supR1, 0, nsup)
            z2b = jnp.take_along_axis(z1b, mm1, axis=1)
            yb = jnp.take_along_axis(z2b, jnp.clip(g - 8, 0, 7), axis=0)
            sR = jnp.where(g < 8, ya, yb)
        else:
            sR = ya

        f_h = fL_ref[r8, 0, :]
        fac = jnp.where(f_h > 0.0, sL, sR)
        for comp in range(3):
            oL_ref[r8, comp, :] = fL_ref[r8, comp, :] * fac

        gi0 = gi_all[rA, :]
        mi0 = mi_all[rA, :]
        u0 = jnp.take_along_axis(fac, gi0, axis=0)
        facR0 = jnp.take_along_axis(u0, mi0, axis=1)
        for comp in range(3):
            oR_ref[rA, comp, :] = fR_ref[rA, comp, :] * facR0
        if rrows == 16:
            gi1 = gi_all[rB, :]
            mi1 = mi_all[rB, :]
            u1 = jnp.take_along_axis(fac, gi1, axis=0)
            facR1 = jnp.take_along_axis(u1, mi1, axis=1)
            for comp in range(3):
                oR_ref[rB, comp, :] = fR_ref[rB, comp, :] * facR1


def positivity_scale_slotted(op, h, dt, fluxL, fluxR, fb):
    """Audusse-style positivity limiting for the slotted MUSCL path: scale
    every edge flux (interior AND boundary) by the donor cell's factor
    s = min(1, h / (dt * drain)) — the exact twin of
    operator._apply_positivity_limit, with the per-cell drain accumulated
    by cell_drain_slotted and the donor's s gathered through the slot
    windows. Wet cells have s == 1.0 exactly (fluxes bitwise unchanged).

    Returns (fluxL', fluxR', fb')."""
    a = op.arrays
    C = op.num_cells
    dtype = h.dtype
    interp = op.pallas_interpret
    drain_neg = cell_drain_slotted(
        a, fluxL.astype(jnp.float32), fluxR.astype(jnp.float32),
        op.pallas_cd_nsup_l, op.pallas_cd_nsup_r,
        op.pallas_cd_wl, op.pallas_cd_wr, interpret=interp,
    ).reshape(-1)[:C].astype(dtype)
    drain = -drain_neg
    if op.num_boundary_edges:
        coefb = -a.bnd_len / a.area[a.bnd_left]
        contrib_b = jnp.minimum(fb[0] * coefb, 0.0)
        drain = drain - (
            jnp.zeros_like(drain).at[a.bnd_left].add(contrib_b)
        )
    drain_safe = jnp.where(drain > 0.0, drain, 1.0)
    s = jnp.where(
        drain > 0.0, jnp.clip(h / (dt * drain_safe), 0.0, 1.0), 1.0
    )

    # interior edges: gather s through the slot windows and scale
    supL = a.pl_supL
    ntiles = supL.shape[0] // 8
    rrows = a.pl_supR.shape[0] // ntiles
    nsup = op.pallas_nsup
    Crows = -(-C // 128)
    s32 = s.astype(jnp.float32)
    if C % 128:
        s32 = jnp.pad(s32, (0, Crows * 128 - C))
    s2d = jnp.pad(
        s32.reshape(1, Crows, 128), ((0, 0), (0, nsup * 8 + 8), (0, 0))
    )
    nsteps = ntiles // GT
    in_specs = [
        pl.BlockSpec((GT * 8, 128), lambda t, ws: (t, 0)),      # supL i8
        pl.BlockSpec((GT * rrows, 128), lambda t, ws: (t, 0)),  # supR i8
        pl.BlockSpec((GT * rrows, 128), lambda t, ws: (t, 0)),  # m i8
        pl.BlockSpec((GT * 8, 128), lambda t, ws: (t, 0)),      # g i8
        pl.BlockSpec((GT * rrows, 128), lambda t, ws: (t, 0)),  # gi i8
        pl.BlockSpec((GT * rrows, 128), lambda t, ws: (t, 0)),  # mi i8
        pl.BlockSpec((GT * 8, 3, 128), lambda t, ws: (t, 0, 0)),   # fluxL
        pl.BlockSpec((GT * rrows, 3, 128), lambda t, ws: (t, 0, 0)),
    ] + [
        pl.BlockSpec(
            (1, 8, 128),
            lambda t, ws, g=g_, s_=s_: (0, ws[t * GT + g_] + s_, 0),
        )
        for g_ in range(GT)
        for s_ in range(nsup)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((GT * 8, 3, 128), lambda t, ws: (t, 0, 0)),
            pl.BlockSpec((GT * rrows, 3, 128), lambda t, ws: (t, 0, 0)),
        ],
    )
    f = pl.pallas_call(
        functools.partial(_pos_scale_kernel, nsup=nsup, rrows=rrows),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ntiles * 8, 3, 128), jnp.float32),
            jax.ShapeDtypeStruct((ntiles * rrows, 3, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interp,
    )
    fluxL2, fluxR2 = f(
        a.pl_ws, supL, a.pl_supR, a.pl_m, a.pl_g, a.pl_gi, a.pl_mi,
        fluxL.astype(jnp.float32), fluxR.astype(jnp.float32),
        *([s2d] * (GT * nsup)),
    )

    if op.num_boundary_edges and fb.shape[1]:
        s_b = jnp.where(fb[0] > 0.0, s[a.bnd_left], 1.0)
        fb = fb * s_b
    return fluxL2, fluxR2, fb


# ------------------------------------------- fused streaming edge+cell RHS

class FusedSchedule(NamedTuple):
    """Host-built schedule interleaving edge-flux groups and (lagged) cell
    divergence groups on ONE sequential pallas grid, with fluxes held in
    VMEM ring buffers so they never round-trip through HBM. Round-1
    measurement: the two-kernel path is pure-DMA-bound (removing ALL
    compute from the edge kernel saves 6%), and the fluxL/fluxR HBM
    write+read was ~55% of its total traffic — streaming them through VMEM
    is the single biggest step toward the HBM roofline."""

    nsteps: int  # total grid steps (>= edge groups; cells lag edges)
    negrp: int  # edge groups (= ntiles // GT)
    nringL: int  # fluxL ring size in 8-row supers
    nringR: int
    eg: np.ndarray  # [nsteps] i32 edge-group block index (clamped tail)
    cg: np.ndarray  # [nsteps] i32 cell-group output index (monotone)
    doc: np.ndarray  # [nsteps] i32 1 when this step computes a cell group


def build_fused_schedule(plan: SlottedPlan, cp: CellPlan,
                         max_ring: int = 0,
                         ndof: int = 3) -> Optional[FusedSchedule]:
    """Schedule cell group ct at the earliest step s(ct) whose edge
    progress covers ct's flux windows (strictly increasing s). Ring sizes
    = the max distance between the edge write frontier and the oldest
    super still needed; None when a ring exceeds `max_ring` supers
    (default scales with GT: the edge frontier advances GT tiles per grid
    step, so the lag scales with it; 128 supers * ndof * 4 KB ~ 1.5 MB)."""
    if not max_ring:
        max_ring = 128 * max(1, GT // 8)
    GTn = GT
    rp = plan.rrows // 8
    ntiles = plan.ntiles
    negrp = ntiles // GTn
    ncgrp = cp.ntiles // GTn
    totL = ntiles  # fluxL supers (1 per edge tile)
    totR = ntiles * rp

    grpL = cp.wsL.reshape(-1, GTn)
    grpR = cp.wsR.reshape(-1, GTn)
    gL_lo = grpL.min(axis=1).astype(np.int64)
    gR_lo = grpR.min(axis=1).astype(np.int64)
    # per-tile max super actually read = max over k planes of the plane
    # window end (exact even when the combined per-tile span exceeds the
    # two-kernel budget and cp.nsupL/R are clamped)
    KLp = len(cp.nsupL_ks)
    KRp = len(cp.nsupR_ks)
    wkL2 = cp.wkL.reshape(-1, cp.ntiles)[1 : KLp + 1].astype(np.int64)
    wkR2 = cp.wkR.reshape(-1, cp.ntiles)[1 : KRp + 1].astype(np.int64)
    endL = np.max(
        wkL2 + np.asarray(cp.nsupL_ks, np.int64)[:, None], axis=0
    )
    endR = np.max(
        wkR2 + np.asarray(cp.nsupR_ks, np.int64)[:, None], axis=0
    )
    needL = np.minimum(endL.reshape(-1, GTn).max(axis=1), totL)
    needR = np.minimum(endR.reshape(-1, GTn).max(axis=1), totR)
    g_need = np.maximum(
        -(-needL // GTn), -(-needR // (GTn * rp))
    ).astype(np.int64) - 1
    g_need = np.maximum(g_need, 0)
    # scheduling slack: run each cell group D edge-steps AFTER the
    # earliest covering step, so its ring reads never stall on the edge
    # frontier (the rings grow by D*GT supers to compensate)
    g_need = g_need + int(_os.environ.get("RDYTPU_SCHED_DELAY", 0))
    # s(ct) = max(g_need[ct], s(ct-1)+1), vectorized as a running max of
    # (g_need - arange) + arange
    ar = np.arange(ncgrp, dtype=np.int64)
    s = np.maximum.accumulate(g_need - ar) + ar
    nsteps = int(max(negrp, s[-1] + 1))

    frontL = np.minimum((s + 1) * GTn, totL)
    frontR = np.minimum((s + 1) * GTn * rp, totR)
    nringL = max(int((frontL - gL_lo).max()), GTn)
    nringR = max(int((frontR - gR_lo).max()), GTn * rp)
    # diagnostic knobs (perf experiments only; larger rings are always
    # semantically safe — reads wrap later)
    nringL = max(nringL, int(_os.environ.get("RDYTPU_MIN_NRINGL", 0)))
    nringR = max(nringR, int(_os.environ.get("RDYTPU_MIN_NRINGR", 0)))
    if nringL > max_ring or nringR > max_ring:
        _plan_debug(
            f"fused rings exceed cap: {nringL}/{nringR} > {max_ring}"
        )
        return None
    # combined scratch (double-buffered q window + both flux rings) must fit
    # the VMEM budget (ADVICE r2)
    if _qbuf_bytes(plan.wq, ndof) + _ring_bytes(nringL, nringR, ndof) > (
        _vmem_budget()
    ):
        return None

    eg = np.minimum(np.arange(nsteps), negrp - 1).astype(np.int32)
    cg = np.zeros(nsteps, np.int32)
    doc = np.zeros(nsteps, np.int32)
    cg[s] = np.arange(ncgrp, dtype=np.int32)
    np.maximum.accumulate(cg, out=cg)
    doc[s] = 1
    return FusedSchedule(
        nsteps=nsteps, negrp=negrp, nringL=nringL, nringR=nringR,
        eg=eg, cg=cg, doc=doc,
    )


def _edge_phase_tiles(t, slot, qbuf, e8_ref, ef_ref, ws_ref, ws_row,
                      gws_ref,
                      o_cmax, o_cidx, ringL, ringR, *, nsup, ndof, upwind,
                      tiny_h, h_anuga, rrows, nringL, nringR, hr, bs_refs,
                      dirp_ref, bnd_kinds):
    """One grid step's edge phase, shared by the fused-RHS and fused-STEP
    kernels: compute the GT-tile group's fluxes into the VMEM rings and
    fold the Courant max/argmax."""
    rp = rrows // 8
    RE8 = 16 + 4 * rrows  # merged i8 rows per tile
    REF = 24 + (16 if hr else 0)  # merged f32 rows per tile
    e8_all = e8_ref[:].astype(jnp.int32)
    rowlane = (
        jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    )

    for gt in range(GT):
        r8 = slice(gt * 8, gt * 8 + 8)
        b = gt * RE8
        supL = e8_all[b : b + 8, :]
        g_pick = e8_all[b + 8 : b + 16, :]
        btype = None
        if bnd_kinds:
            # unified plan: BC code packed into g bits 4-5
            btype = g_pick >> 4
            g_pick = g_pick & 15
        sR = b + 16
        supR0 = e8_all[sR : sR + 8, :]
        supR1 = e8_all[sR + 8 : sR + 16, :] if rrows == 16 else None
        sM = b + 16 + rrows
        mm0 = e8_all[sM : sM + 8, :]
        mm1 = e8_all[sM + 8 : sM + 16, :] if rrows == 16 else None
        sGi = b + 16 + 2 * rrows
        gi0 = e8_all[sGi : sGi + 8, :]
        sMi = b + 16 + 3 * rrows
        mi0 = e8_all[sMi : sMi + 8, :]
        fb = gt * REF
        cn_t = ef_ref[fb : fb + 8, :]
        sn_t = ef_ref[fb + 8 : fb + 16, :]
        cc_t = ef_ref[fb + 16 : fb + 24, :]
        # ws arrives as an SMEM block [8, GT] covering 8 edge groups
        # (Mosaic block shapes must be (8k, 128k|full)); ws_row picks the
        # step's group. eg[t] == t while t < negrp, so gws_ref[t] matches
        off = (ws_ref[ws_row, gt] - gws_ref[t]) * 8

        def fetch(comp, sup_s):
            return qbuf[
                slot, comp, pl.ds(pl.multiple_of(off + sup_s * 8, 8), 8), :
            ]

        fluxes, amax = _tile_edge_fluxes(
            fetch, supL, supR0, mm0, supR1, mm1,
            g_pick, cn_t, sn_t,
            nsup, ndof, upwind, tiny_h, h_anuga,
            hr_dz=(
                (ef_ref[fb + 24 : fb + 32, :],
                 ef_ref[fb + 32 : fb + 40, :]) if hr else None
            ),
            bs_vals=(
                (bs_refs[0][r8, :], bs_refs[1][r8, :],
                 bs_refs[2][r8, :], bs_refs[3][r8, :])
                if bs_refs is not None else None
            ),
            btype=btype, bnd_kinds=bnd_kinds,
            dir_vals=(
                tuple(dirp_ref[c, r8, :] for c in range(ndof))
                if dirp_ref is not None else None
            ),
        )

        # Courant fold: value + linear slot index (no amax HBM write)
        ci = amax * cc_t
        cur = o_cmax[:]
        upd = ci > cur
        base = (t * GT + gt) * TE
        o_cmax[:] = jnp.where(upd, ci, cur)
        o_cidx[:] = jnp.where(upd, rowlane + base, o_cidx[:])

        # fluxL ring store at super (t*GT + gt) mod nringL
        posL = pl.multiple_of(
            jax.lax.rem(t * GT + gt, jnp.int32(nringL)) * 8, 8
        )
        for comp in range(ndof):
            ringL[pl.ds(posL, 8), comp, :] = fluxes[comp]

        # route into the R-layout ring
        posR = pl.multiple_of(jax.lax.rem(
            (t * GT + gt) * rp, jnp.int32(nringR)
        ) * 8, 8)
        for comp in range(ndof):
            fL = fluxes[comp]
            u0 = jnp.take_along_axis(fL, gi0, axis=0)
            ringR[pl.ds(posR, 8), comp, :] = (
                u0 if "shuffle" in _ABLATE
                else jnp.take_along_axis(u0, mi0, axis=1)
            )
        if rrows == 16:
            gi1 = e8_all[sGi + 8 : sGi + 16, :]
            mi1 = e8_all[sMi + 8 : sMi + 16, :]
            posR1 = pl.multiple_of(jax.lax.rem(
                (t * GT + gt) * rp + 1, jnp.int32(nringR)
            ) * 8, 8)
            for comp in range(ndof):
                fL = fluxes[comp]
                u1 = jnp.take_along_axis(fL, gi1, axis=0)
                ringR[pl.ds(posR1, 8), comp, :] = (
                    u1 if "shuffle" in _ABLATE
                    else jnp.take_along_axis(u1, mi1, axis=1)
                )


def _gt_ring_div(ringL, ringR, sL_all, sR_all, cf_ref, r8, wkL_ref, wkR_ref,
                 wk_col, *, KL, KR, ndof, nsupL_ks, nsupR_ks, nringL,
                 nringR, ident_l=False):
    # the identity fast path is OPT-IN (RDYTPU_IDENT_FAST=1): measured
    # on-chip it SERIALIZES the step kernel's DMA pipeline (floor 0.20 ->
    # 0.55 s/500 at 2.88M) even though it removes the row-pick/select
    # work — and the generic chain's cost turns out to be a fixed
    # ~3.5 us per cell phase INDEPENDENT of chain length (6, 14, and 19
    # unrolled iterations all measure 0.31 s/500), so there is nothing
    # for the fast path to win. BASELINE.md round 5.
    if not _os.environ.get("RDYTPU_IDENT_FAST"):
        ident_l = False
    """One GT-tile's flux divergence gathered from the VMEM rings (shared
    by the fused-RHS and fused-STEP cell phases).

    Each k-plane scans only its own per-(plane, tile) window (wk arrays;
    plane rows cluster because contributions are ranked by row per cell),
    so the gather-chain count is sum(nsup_ks) per side instead of
    K * per-tile-span — on a quad raster that cuts the R side ~3x (the far
    south-edge plane and the near west-edge plane each span ~2-3 supers
    while the combined per-tile span is ~10)."""
    acc = [jnp.zeros((8, 128), jnp.float32) for _ in range(ndof)]

    def side(ring, wk_ref, s_all, K, nsup_ks, nring, k0=0, ident=False):
        for k in range(K):
            if ident and nsup_ks[k] == 1:
                # identity-aligned plane (round 5): tile (ct, k) holds the
                # k-th L edges at the owning cell's own (row, lane), so
                # the "gather" is ONE aligned ring-block read + fma —
                # no row pick, no super select
                w_k = wk_ref[k + 1, wk_col]
                pos = pl.multiple_of(
                    jax.lax.rem(w_k, jnp.int32(nring)) * 8, 8
                )
                block = ring[pl.ds(pos, 8), :, :]
                cf = cf_ref[k0 + k, r8]
                for comp in range(ndof):
                    acc[comp] = acc[comp] + block[:, comp, :] * cf
                continue
            # wk arrives as an SMEM BLOCK [(2K+1), 128] covering 8 cell
            # groups (the whole-table scalar-prefetch form overflowed the
            # 1 MB SMEM at 46M cells: O(tiles) tables); wk_col picks this
            # group's tile within the block
            w_k = wk_ref[k + 1, wk_col]
            # per-(k, tile) ACTUAL span: the static nsup_ks[k] is the max
            # over all tiles; most tiles need ~60% of it (build_cell_plan
            # measurement), so the tail iterations branch away at run time
            cnt_k = wk_ref[K + 1 + k, wk_col]
            # sup planes are per-k-window-relative (int8-safe at any mesh
            # bandwidth); zero-coef padding entries read window row 0
            # harmlessly
            sup = s_all[k, r8]
            if _os.environ.get("RDYTPU_LAZY_WIDEN"):
                sup = sup.astype(jnp.int32)
            cf = cf_ref[k0 + k, r8]
            gats = [jnp.zeros((8, 128), jnp.float32) for _ in range(ndof)]

            # one ring slice + one select mask shared by all ndof
            # components (the per-comp dynamic slices / compares were
            # ~1/3 of the chain's VPU issue)
            def _gather_s(_s, g):
                pos = pl.multiple_of(
                    jax.lax.rem(w_k + _s, jnp.int32(nring)) * 8, 8
                )
                block = ring[pl.ds(pos, 8), :, :]  # [8, ndof, 128]
                idx = jnp.clip(sup - _s * 8, 0, 7)
                sel = (sup >> 3) == _s
                return tuple(
                    jnp.where(
                        sel,
                        jnp.take_along_axis(
                            block[:, comp, :], idx, axis=0
                        ),
                        g[comp],
                    )
                    for comp in range(ndof)
                )

            if _CNT_GATE == "fori":
                # dynamic trip count = the per-(k, tile) ACTUAL span (avg
                # ~60% of the static max on the bench raster)
                gats = list(jax.lax.fori_loop(
                    0,
                    jnp.minimum(cnt_k, jnp.int32(nsup_ks[k])),
                    _gather_s, tuple(gats),
                ))
            else:
                for s in range(nsup_ks[k]):
                    if s == 0 or _CNT_GATE == "0":
                        gats = list(_gather_s(s, tuple(gats)))
                    else:
                        gats = list(jax.lax.cond(
                            s < cnt_k,
                            lambda g, _s=s: _gather_s(_s, g),
                            lambda g: g, tuple(gats),
                        ))
            for comp in range(ndof):
                acc[comp] = acc[comp] + gats[comp] * cf

    side(ringL, wkL_ref, sL_all, KL, nsupL_ks, nringL, ident=ident_l)
    side(ringR, wkR_ref, sR_all, KR, nsupR_ks, nringR, k0=KL)
    return acc


def _fused_kernel(gws_ref, eg_ref, cg_ref, doc_ref,
                  ws_ref, cwsL_ref, cwsR_ref,
                  e8_ref, ef_ref, c8_ref, cf_ref, *rest,
                  nsup, wq, ndof, upwind, tiny_h, h_anuga, rrows,
                  nsupL_ks, nsupR_ks, Ct, KL, KR, negrp, nringL, nringR,
                  hr=False, bs=False, bnd_kinds=(), smem_blocked=False,
                  ident_l=False):
    """Streaming fused RHS: per grid step, (a) compute one GT-tile group of
    edge fluxes into VMEM rings + fold the Courant max/argmax, (b) when the
    schedule says a cell group's flux windows are complete, gather its
    divergence from the rings. Fluxes and Courant slots never touch HBM.

    Plan inputs arrive as FOUR merged streams (e8 = the six i8 index
    planes interleaved per tile; ef = cn/sn/courant-coef [+ HR drops] f32;
    c8/cf = L+R cell plans concatenated on K) -- the round-2 floor
    ablation measured 74% of the step in the DMA/pipeline skeleton with 13
    separate small streams."""
    if bs:
        etab_ref, etae_ref, zvb_ref, zve_ref = rest[:4]
        rest = rest[4:]
    has_dir = 1 in bnd_kinds
    if has_dir:
        dirp_ref = rest[0]  # [GT*8-block, 3, 128] Dirichlet ghost planes
        rest = rest[1:]
    q_hbm = rest[0]
    o_div, o_cmax, o_cidx = rest[1], rest[2], rest[3]
    qbuf, sem, ringL, ringR = rest[4], rest[5], rest[6], rest[7]
    RE8 = 16 + 4 * rrows  # merged i8 rows per tile
    REF = 24 + (16 if hr else 0)  # merged f32 rows per tile

    t = pl.program_id(0)
    rp = rrows // 8

    def _q_dma(slot, tt):
        rr = pl.multiple_of(gws_ref[tt] * 8, 8)
        return pltpu.make_async_copy(
            q_hbm.at[:, pl.ds(rr, wq * 8), :], qbuf.at[slot], sem.at[slot]
        )

    slot = jax.lax.rem(t, jnp.int32(2))
    nslot = jax.lax.rem(t + jnp.int32(1), jnp.int32(2))

    @pl.when(t == 0)
    def _():
        _q_dma(0, 0).start()
        o_cmax[:] = jnp.zeros((8, 128), jnp.float32)
        o_cidx[:] = jnp.zeros((8, 128), jnp.int32)

    @pl.when(t + 1 < negrp)
    def _():
        _q_dma(nslot, t + 1).start()

    # ---------------- edge phase: flux group t -> VMEM rings -------------
    @pl.when(t < negrp)
    def _edge_phase():
        _q_dma(slot, t).wait()
        bs_refs = (
            (etab_ref, etae_ref, zvb_ref, zve_ref) if bs else None
        )
        ws_row = (
            jax.lax.rem(eg_ref[t], jnp.int32(8)) if smem_blocked
            else eg_ref[t]
        )
        _edge_phase_tiles(
            t, slot, qbuf, e8_ref, ef_ref, ws_ref, ws_row, gws_ref,
            o_cmax, o_cidx, ringL, ringR,
            nsup=nsup, ndof=ndof, upwind=upwind, tiny_h=tiny_h,
            h_anuga=h_anuga, rrows=rrows, nringL=nringL, nringR=nringR,
            hr=hr, bs_refs=bs_refs,
            dirp_ref=dirp_ref if has_dir else None, bnd_kinds=bnd_kinds,
        )

    # ---------------- cell phase: divergence group cg[t] ------------------
    @pl.when(doc_ref[t] == 1)
    def _cell_phase():
        if "cell" in _ABLATE:
            for gt in range(GT):
                r8 = slice(gt * 8, gt * 8 + 8)
                for comp in range(ndof):
                    o_div[comp, r8, :] = jnp.zeros((8, 128), jnp.float32)
            return
        cgi = cg_ref[t]
        wk_base = (
            jax.lax.rem(cgi, jnp.int32(8)) if smem_blocked else cgi
        ) * GT
        c8_all = (
            c8_ref[:] if _os.environ.get("RDYTPU_LAZY_WIDEN")
            else c8_ref[:].astype(jnp.int32)
        )
        sL_all = c8_all[:KL]
        sR_all = c8_all[KL:]
        for gt in range(GT):
            r8 = slice(gt * 8, gt * 8 + 8)
            acc = _gt_ring_div(
                ringL, ringR, sL_all, sR_all, cf_ref, r8,
                cwsL_ref, cwsR_ref, wk_base + gt,
                KL=KL, KR=KR, ndof=ndof, nsupL_ks=nsupL_ks,
                nsupR_ks=nsupR_ks, nringL=nringL, nringR=nringR,
                ident_l=ident_l,
            )
            # component-major output: div.reshape(ndof, -1) is then a
            # free view (the old [rows, ndof, 128] layout cost a
            # materialized 70 MB/step XLA transpose at 2.88M cells)
            for comp in range(ndof):
                o_div[comp, r8, :] = acc[comp]


def fused_rhs_slotted(arrays, q, tiny_h, h_anuga, nsup, wq, sched,
                      nsup_lk, nsup_rk, ndof=3, upwind=False,
                      interpret=False, hr=False, bs=None, bnd_kinds=(),
                      dir_planes=None, ident_l=False):
    """Run the streaming fused edge-flux + divergence + Courant kernel.

    bnd_kinds (unified plans): static tuple of BC codes folded into the
    plan; the emitted divergence then already includes the boundary-edge
    fluxes. dir_planes: [3, ntiles*8, 128] Dirichlet ghost (h, u, v)
    planes (see slot_dirichlet_planes), required when 1 in bnd_kinds.

    Returns (div [ndof, Ct*8, 128], cmax [8, 128] f32, cidx [8, 128] i32)
    where cidx holds linear L-slot indices (feed through pl_slot_edge)."""
    nsteps, negrp, nringL, nringR = (
        sched.nsteps, sched.negrp, sched.nringL, sched.nringR,
    )
    supL = arrays.pl_supL
    ntiles = supL.shape[0] // 8
    rrows = arrays.pl_supR.shape[0] // ntiles
    KL = arrays.pl_cd_supL.shape[0]
    KR = arrays.pl_cd_supR.shape[0]
    Ct = arrays.pl_cd_supL.shape[1] // 8
    C = q.shape[1]
    Crows = -(-C // 128)
    q32 = q[:ndof].astype(jnp.float32)
    if C % 128:
        q32 = jnp.pad(q32, ((0, 0), (0, Crows * 128 - C)))
    q2d = jnp.pad(
        q32.reshape(ndof, Crows, 128), ((0, 0), (0, wq * 8 + 8), (0, 0))
    )

    def em(i):  # edge-group tensor block, clamped tail
        return pl.BlockSpec(
            (GT * i, 128), lambda t, gw, eg, cg, doc: (eg[t], 0)
        )

    def cm3(K):  # cell-plan [K, Ct*8, 128] block indexed by cell group
        return pl.BlockSpec(
            (K, GT * 8, 128),
            lambda t, gw, eg, cg, doc: (0, cg[t], 0),
        )

    # per-tile window tables ride as SMEM BLOCKS (one GT-group slice per
    # step) instead of whole-table scalar prefetch: the O(tiles) tables
    # overflow the 1 MB SMEM at 46M cells (measured: 2.19 MB requested)
    rowsL = arrays.pl_cd_wkL.shape[0] // Ct
    rowsR = arrays.pl_cd_wkR.shape[0] // Ct
    # window tables ride in SMEM: whole-array when they fit the 1 MB
    # budget (fastest — one resident copy, like the old scalar prefetch),
    # 8-group blocks when O(tiles) tables would overflow it (46M cells
    # measured 2.19 MB requested; the blocked form costs ~5% at 2.88M)
    smem_blocked = _tables_blocked(ntiles, rowsL + rowsR, Ct)
    if smem_blocked:
        ws_spec = pl.BlockSpec(
            (8, GT), lambda t, gw, eg, cg, doc: (eg[t] // 8, 0),
            memory_space=pltpu.SMEM,
        )
        wkL_spec = pl.BlockSpec(
            (rowsL, 8 * GT), lambda t, gw, eg, cg, doc: (0, cg[t] // 8),
            memory_space=pltpu.SMEM,
        )
        wkR_spec = pl.BlockSpec(
            (rowsR, 8 * GT), lambda t, gw, eg, cg, doc: (0, cg[t] // 8),
            memory_space=pltpu.SMEM,
        )
    else:
        ws_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        wkL_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        wkR_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [
        ws_spec,
        wkL_spec,
        wkR_spec,
        em(16 + 4 * rrows),  # merged i8 plan (supL|g|supR|m|gi|mi per tile)
        em(24 + (16 if hr else 0)),  # merged f32 geom (cn|sn|cc[|dzl|dzr])
        cm3(KL + KR),  # merged cell sup i8 (L then R on K)
        cm3(KL + KR),  # merged cell coef f32
    ] + (
        [em(8), em(8), em(8), em(8)] if bs is not None else []
    ) + (
        [pl.BlockSpec(  # Dirichlet ghost (h, u, v[, c..]) in the L-layout
            (ndof, GT * 8, 128),
            lambda t, gw, eg, cg, doc: (0, eg[t], 0),
        )] if 1 in bnd_kinds else []
    ) + [
        pl.BlockSpec(memory_space=pltpu.ANY),  # q2d (group-window DMA)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (ndof, GT * 8, 128),
                lambda t, gw, eg, cg, doc: (0, cg[t], 0),
            ),
            pl.BlockSpec(
                (8, 128), lambda t, gw, eg, cg, doc: (0, 0)
            ),
            pl.BlockSpec(
                (8, 128), lambda t, gw, eg, cg, doc: (0, 0)
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ndof, wq * 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((nringL * 8, ndof, 128), jnp.float32),
            pltpu.VMEM((nringR * 8, ndof, 128), jnp.float32),
        ],
    )
    f = pl.pallas_call(
        functools.partial(
            _fused_kernel, nsup=nsup, wq=wq, ndof=ndof, upwind=bool(upwind),
            tiny_h=float(tiny_h), h_anuga=float(h_anuga), rrows=rrows,
            nsupL_ks=tuple(nsup_lk), nsupR_ks=tuple(nsup_rk), Ct=Ct,
            KL=KL, KR=KR, negrp=negrp,
            nringL=nringL, nringR=nringR, hr=bool(hr), bs=bs is not None,
            bnd_kinds=tuple(bnd_kinds), smem_blocked=smem_blocked,
            ident_l=bool(ident_l),
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ndof, Ct * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )
    bs_args = (
        (bs[0], bs[1], arrays.pl_bs.zvb, arrays.pl_bs.zve)
        if bs is not None else ()
    )
    dir_args = (dir_planes,) if 1 in bnd_kinds else ()
    div, cmax, cidx = f(
        arrays.pl_gws,
        arrays.pl_fs_eg, arrays.pl_fs_cg, arrays.pl_fs_doc,
        _pad_rows(arrays.pl_ws.reshape(negrp, GT), 8)
        if smem_blocked else arrays.pl_ws.reshape(negrp, GT),
        _pad_cols(arrays.pl_cd_wkL.reshape(rowsL, Ct), 8 * GT)
        if smem_blocked else arrays.pl_cd_wkL.reshape(rowsL, Ct),
        _pad_cols(arrays.pl_cd_wkR.reshape(rowsR, Ct), 8 * GT)
        if smem_blocked else arrays.pl_cd_wkR.reshape(rowsR, Ct),
        arrays.pl_fz_e8, arrays.pl_fz_ef,
        arrays.pl_fz_c8, arrays.pl_fz_cf,
        *bs_args, *dir_args,
        q2d,
    )
    return div, cmax, cidx


def slot_dirichlet_planes(bnd_pos, ntiles8, boundary_values, tiny_h,
                          h_anuga, ndof=3, sel=None):
    """Scatter runtime Dirichlet boundary values into L-layout ghost
    planes for the unified fused kernel.

    bnd_pos: [Eb] i32 flat L-slot position per boundary edge;
    boundary_values: [>=ndof, Eb]. Returns [ndof, ntiles8, 128] f32 of the
    ghost (h, u, v[, c_1..c_nt]) — the same regularized velocities (and
    depth-guarded concentrations) the XLA twin computes for Dirichlet
    ghost states (ops/swe/boundary.py ghost_states; operator._finish_tracer
    cir_s = safe_div(bv[3:], h_b)). Non-Dirichlet slots receive values too;
    the kernel only reads Dirichlet slots."""
    from ..swe.riemann import regularized_velocity as _rv
    from ..tracer.flux import safe_div

    if sel is not None:
        # aligned plans fold only a subset of the boundary edges; bnd_pos
        # is kept-length and indexes boundary_values through `sel`
        boundary_values = boundary_values[:, jnp.asarray(sel, jnp.int32)]
    hb = boundary_values[0].astype(jnp.float32)
    ub, vb = _rv(
        hb, boundary_values[1].astype(jnp.float32),
        boundary_values[2].astype(jnp.float32),
        jnp.float32(tiny_h), jnp.float32(h_anuga),
    )
    rows = [hb, ub, vb] + [
        safe_div(
            boundary_values[3 + j].astype(jnp.float32), hb, hb,
            jnp.float32(tiny_h),
        )
        for j in range(ndof - 3)
    ]
    flat = jnp.zeros((ndof, ntiles8 * 128), jnp.float32)
    flat = flat.at[:, bnd_pos].set(jnp.stack(rows))
    return flat.reshape(ndof, ntiles8, 128)


# ------------------------------------------ fused full-step kernel (tier B)

def _tables_blocked(ntiles, wk_rows, Ct):
    """True when the per-tile window tables exceed the resident-SMEM
    budget and must ride as per-step blocks (the blocked form costs ~5%
    at bench scale, so small meshes keep the resident copy)."""
    bytes_ = (ntiles + wk_rows * Ct) * 4
    return bytes_ > 600 * 1024


def _pad_rows(x, mult):
    """Pad axis 0 to a multiple of `mult` (SMEM block-shape rules)."""
    r = (-x.shape[0]) % mult
    return jnp.pad(x, ((0, r), (0, 0))) if r else x


def _pad_cols(x, mult):
    """Pad axis 1 to a multiple of `mult` (padding is never indexed:
    column = (cg % 8) * GT + gt stays under the real tile count)."""
    r = (-x.shape[1]) % mult
    return jnp.pad(x, ((0, 0), (0, r))) if r else x


def pack_rows(x, rows):
    """[n, C] -> [n, rows, 128] f32 tile-row layout (zero padded)."""
    n, C = x.shape
    r = -(-C // 128)
    x32 = x.astype(jnp.float32)
    if C % 128:
        x32 = jnp.pad(x32, ((0, 0), (0, r * 128 - C)))
    x2 = x32.reshape(n, r, 128)
    if rows > r:
        x2 = jnp.pad(x2, ((0, 0), (0, rows - r), (0, 0)))
    return x2


def unpack_rows(x2, C, dtype):
    """[n, rows, 128] -> [n, C] (free reshape + slice)."""
    return x2.reshape(x2.shape[0], -1)[:, :C].astype(dtype)


def _fused_step_kernel(gws_ref, eg_ref, cg_ref, doc_ref, co_ref, scal_ref,
                       ws_ref, cwsL_ref, cwsR_ref,
                       e8_ref, ef_ref, c8_ref,
                       cf_ref, *rest, nsup, wq, upwind, tiny_h, h_anuga,
                       rrows, nsupL_ks, nsupR_ks, Ct, KL, KR, negrp,
                       nringL, nringR,
                       ncgrp, bnd_kinds, alpha, beta, gfac, source_method,
                       emit_prim, xq_threshold, uniform_geom, has_ext,
                       smem_blocked=False, nt=0, num_sediment=0,
                       sed_params=None, ident_l=False):
    """Streaming fused FULL-STEP kernel: the edge phase of _fused_kernel
    plus a cell phase that consumes the ring divergence, applies the source
    terms (ops/swe/sources.py twins; reference swe_sources_ceed.h:37-105;
    for nt > 0 the coupled tracer twins, ops/tracer/sources.py /
    tracer_sources_ceed.h:37-160 incl. Hairsine-Rose e/d on the sediment
    rows), and emits ONE RK stage update

        q_out = alpha * qA + beta * qB + gfac * dt * (div + src(qB, div))

    directly in the state's tile-row layout — the interval loop carries
    [3+nt, NB*GT*8, 128] and per-step XLA work drops to scalars. Pad grid
    steps (co >= ncgrp) zero the q-window slack rows so window reads past
    the last cell stay dry."""
    ndof = 3 + nt
    has_dir = 1 in bnd_kinds
    dirp_ref = None
    if has_dir:
        dirp_ref = rest[0]
        rest = rest[1:]
    qc_ref = rest[0]  # stage-state rows of this step's cell group
    rest = rest[1:]
    qa_ref = None
    if alpha != 0.0:
        qa_ref = rest[0]  # step-start state rows (multi-stage combine)
        rest = rest[1:]
    geom_ref = ext_ref = None
    if not uniform_geom:
        geom_ref = rest[0]
        rest = rest[1:]
    if has_ext:
        ext_ref = rest[0]
        rest = rest[1:]
    q_hbm = rest[0]
    o_q, o_cmax, o_cidx = rest[1], rest[2], rest[3]
    rest = rest[4:]
    o_prim = None
    if emit_prim:
        o_prim = rest[0]
        rest = rest[1:]
    qbuf, sem, ringL, ringR = rest

    t = pl.program_id(0)

    def _q_dma(slot, tt):
        rr = pl.multiple_of(gws_ref[tt] * 8, 8)
        return pltpu.make_async_copy(
            q_hbm.at[:, pl.ds(rr, wq * 8), :], qbuf.at[slot], sem.at[slot]
        )

    slot = jax.lax.rem(t, jnp.int32(2))
    nslot = jax.lax.rem(t + jnp.int32(1), jnp.int32(2))

    @pl.when(t == 0)
    def _():
        _q_dma(0, 0).start()
        o_cmax[:] = jnp.zeros((8, 128), jnp.float32)
        o_cidx[:] = jnp.zeros((8, 128), jnp.int32)

    @pl.when(t + 1 < negrp)
    def _():
        _q_dma(nslot, t + 1).start()

    @pl.when(t < negrp)
    def _edge_phase():
        _q_dma(slot, t).wait()
        ws_row = (
            jax.lax.rem(eg_ref[t], jnp.int32(8)) if smem_blocked
            else eg_ref[t]
        )
        _edge_phase_tiles(
            t, slot, qbuf, e8_ref, ef_ref, ws_ref, ws_row, gws_ref,
            o_cmax, o_cidx, ringL, ringR,
            nsup=nsup, ndof=ndof, upwind=upwind, tiny_h=tiny_h,
            h_anuga=h_anuga, rrows=rrows, nringL=nringL, nringR=nringR,
            hr=False, bs_refs=None, dirp_ref=dirp_ref, bnd_kinds=bnd_kinds,
        )

    @pl.when(doc_ref[t] == 1)
    def _cell_phase():
        is_pad = co_ref[t] >= ncgrp

        @pl.when(is_pad)
        def _():
            z = jnp.zeros((GT * 8, 128), jnp.float32)
            for comp in range(ndof):
                o_q[comp, :, :] = z
                if emit_prim:
                    o_prim[comp, :, :] = z

        @pl.when(jnp.logical_not(is_pad))
        def _():
            from ...constants import GRAVITY

            dt = scal_ref[0]
            gdt = jnp.float32(gfac) * dt
            g_c = jnp.float32(GRAVITY)
            th = jnp.float32(tiny_h)
            cgi = cg_ref[t]
            wk_base = (
                jax.lax.rem(cgi, jnp.int32(8)) if smem_blocked else cgi
            ) * GT
            c8_all = (
            c8_ref[:] if _os.environ.get("RDYTPU_LAZY_WIDEN")
            else c8_ref[:].astype(jnp.int32)
        )
            sL_all = c8_all[:KL]
            sR_all = c8_all[KL:]
            for gt in range(GT):
                r8 = slice(gt * 8, gt * 8 + 8)
                if "cell" in _ABLATE:
                    acc = [jnp.zeros((8, 128), jnp.float32)] * ndof
                else:
                    acc = _gt_ring_div(
                        ringL, ringR, sL_all, sR_all, cf_ref, r8,
                        cwsL_ref, cwsR_ref, wk_base + gt,
                        KL=KL, KR=KR, ndof=ndof, nsupL_ks=nsupL_ks,
                        nsupR_ks=nsupR_ks, nringL=nringL, nringR=nringR,
                        ident_l=ident_l,
                    )
                h = qc_ref[0, r8, :]
                hu = qc_ref[1, r8, :]
                hv = qc_ref[2, r8, :]
                if uniform_geom:
                    # structure-static elision: the VALUES stay runtime
                    # (scal_ref), so set_manning_n with a new uniform value
                    # still flows without retracing
                    dzx, dzy, mann = scal_ref[1], scal_ref[2], scal_ref[3]
                else:
                    dzx = geom_ref[0, r8, :]
                    dzy = geom_ref[1, r8, :]
                    mann = geom_ref[2, r8, :]
                if has_ext:
                    e0 = ext_ref[0, r8, :]
                    e1 = ext_ref[1, r8, :]
                    e2 = ext_ref[2, r8, :]
                else:
                    e0 = e1 = e2 = jnp.float32(0.0)

                # sources: exact twins of ops/swe/sources.py in f32 (for
                # nt > 0 the coupled twin ops/tracer/sources.py, whose wet
                # guard is strict `>` and whose friction groups the
                # divergence/bed-slope sum BEFORE the dt multiply)
                bedx = dzx * g_c * h
                bedy = dzy * g_c * h
                wet = (h > th) if nt else (h >= th)
                h_safe = jnp.where(wet, h, 1.0)
                if nt:
                    u = jnp.where(wet, hu / h_safe, 0.0)
                    v = jnp.where(wet, hv / h_safe, 0.0)
                    cd = g_c * mann * mann * jnp.power(
                        h_safe, -1.0 / 3.0
                    )
                    if source_method == 2:  # SOURCE_NONE (ARK-IMEX expl.)
                        s1 = -bedx + e1
                        s2 = -bedy + e2
                    else:  # semi-implicit tb/(1 + dt*tb), tracer ordering
                        speed = jnp.sqrt(u * u + v * v)
                        tb = cd * speed / h_safe
                        factor = tb / (1.0 + dt * tb)
                        tbx = jnp.where(
                            wet, (hu + dt * (acc[1] - bedx)) * factor, 0.0
                        )
                        tby = jnp.where(
                            wet, (hv + dt * (acc[2] - bedy)) * factor, 0.0
                        )
                        s1 = -bedx - tbx + e1
                        s2 = -bedy - tby + e2
                elif source_method == 2:  # SOURCE_NONE (ARK-IMEX explicit)
                    s1 = -bedx + e1
                    s2 = -bedy + e2
                elif source_method == 1:  # implicit XQ2018 closed form
                    ax = acc[1] - bedx
                    ay = acc[2] - bedy
                    mx = hu + ax * dt
                    my = hv + ay * dt
                    n2g = g_c * mann * mann
                    lam = (
                        n2g
                        * jnp.power(h_safe, -4.0 / 3.0)
                        * jnp.sqrt(
                            (mx / h_safe) ** 2 + (my / h_safe) ** 2
                        )
                    )
                    dtlam = dt * lam
                    dtlam_safe = jnp.where(dtlam > 0.0, dtlam, 1.0)
                    root = jnp.sqrt(1.0 + 4.0 * dtlam)
                    qx1 = jnp.where(
                        dtlam < jnp.float32(xq_threshold), mx,
                        (mx - mx * root) / (-2.0 * dtlam_safe),
                    )
                    qy1 = jnp.where(
                        dtlam < jnp.float32(xq_threshold), my,
                        (my - my * root) / (-2.0 * dtlam_safe),
                    )
                    qmag = jnp.sqrt(qx1 * qx1 + qy1 * qy1)
                    h73 = n2g * jnp.power(h_safe, -7.0 / 3.0)
                    s1 = -bedx - jnp.where(wet, h73 * qx1 * qmag, 0.0) + e1
                    s2 = -bedy - jnp.where(wet, h73 * qy1 * qmag, 0.0) + e2
                else:  # semi-implicit tb/(1 + dt*tb)
                    u = hu / h_safe
                    v = hv / h_safe
                    cd = g_c * mann * mann * jnp.power(
                        h_safe, -1.0 / 3.0
                    )
                    speed = jnp.sqrt(u * u + v * v)
                    tb = cd * speed / h_safe
                    factor = tb / (1.0 + dt * tb)
                    tbx = jnp.where(
                        wet, (hu + dt * acc[1] - dt * bedx) * factor, 0.0
                    )
                    tby = jnp.where(
                        wet, (hv + dt * acc[2] - dt * bedy) * factor, 0.0
                    )
                    s1 = -bedx - tbx + e1
                    s2 = -bedy - tby + e2

                up0 = beta * h + gdt * (acc[0] + e0)
                up1 = beta * hu + gdt * (acc[1] + s1)
                up2 = beta * hv + gdt * (acc[2] + s2)
                if qa_ref is not None:
                    up0 = up0 + alpha * qa_ref[0, r8, :]
                    up1 = up1 + alpha * qa_ref[1, r8, :]
                    up2 = up2 + alpha * qa_ref[2, r8, :]
                o_q[0, r8, :] = up0
                o_q[1, r8, :] = up1
                o_q[2, r8, :] = up2

                if nt:
                    # tracer rows: Hairsine-Rose erosion/deposition on the
                    # sediment classes, passive advection on the rest
                    # (ops/tracer/sources.py:88-100 twin)
                    kp, ws_v, tau_ce, tau_cd, rhow = sed_params
                    tau_b = jnp.float32(0.5 * rhow) * cd * (u * u + v * v)
                    e_t = (
                        jnp.float32(kp)
                        * (tau_b - jnp.float32(tau_ce))
                        / jnp.float32(tau_ce)
                    )
                    for j in range(nt):
                        hc_j = qc_ref[3 + j, r8, :]
                        ci_j = jnp.where(wet, hc_j / h_safe, 0.0)
                        ej = (
                            ext_ref[3 + j, r8, :] if has_ext
                            else jnp.float32(0.0)
                        )
                        if j < num_sediment:
                            d_j = jnp.float32(ws_v) * ci_j * (
                                1.0 - tau_b / jnp.float32(tau_cd)
                            )
                            sj = jnp.where(wet, e_t - d_j, 0.0) + ej
                        else:
                            sj = ej
                        upj = beta * hc_j + gdt * (acc[3 + j] + sj)
                        if qa_ref is not None:
                            upj = upj + alpha * qa_ref[3 + j, r8, :]
                        o_q[3 + j, r8, :] = upj
                        if emit_prim:
                            o_prim[3 + j, r8, :] = ci_j

                if emit_prim:
                    # primitives of the STAGE INPUT (stage 1's input is the
                    # step-start state, matching r1.prim in the twin)
                    denom = h * h + jnp.float32(h_anuga) ** 2
                    denom_safe = jnp.where(denom > 0.0, denom, 1.0)
                    o_prim[0, r8, :] = h
                    o_prim[1, r8, :] = jnp.where(
                        wet, hu * h / denom_safe, 0.0
                    )
                    o_prim[2, r8, :] = jnp.where(
                        wet, hv * h / denom_safe, 0.0
                    )


def fused_step_slotted(arrays, q2d, dt_f32, step_meta, nsup, wq, nsup_lk,
                       nsup_rk, tiny_h, h_anuga, xq_threshold, source_method,
                       bnd_kinds, geom2d, ext2d, alpha, beta, gfac,
                       qA2d=None, dir_planes=None, emit_prim=False,
                       uniform_scal=None, interpret=False,
                       num_tracers=0, num_sediment=0, sed_params=None,
                       upwind=False, ident_l=False):
    """One RK stage of the full-step fused kernel.

    q2d: [3+nt, NB*GT*8, 128] stage state in tile-row layout (pack_rows;
    rows 3+ are tracer hc planes when num_tracers > 0);
    dt_f32: traced f32 scalar (the step dt; sources use it, the update
    uses gfac * dt); alpha/beta/gfac: static stage coefficients.
    uniform_scal: (dz_dx0, dz_dy0, mann0) traced scalars replacing the
    geometry stream on uniform meshes (pass geom2d=None); ext2d=None
    elides the external-source stream (no sources configured).
    Returns (q2d_new, cmax8, cidx8[, prim2d])."""
    nt = int(num_tracers)
    ndof = 3 + nt
    if sed_params is None:
        from ..tracer.sources import SedimentParams

        sed_params = SedimentParams()
    sp_tuple = (
        float(sed_params.kp_constant),
        float(sed_params.settling_velocity),
        float(sed_params.tau_critical_erosion),
        float(sed_params.tau_critical_deposition),
        float(sed_params.rhow),
    )
    ns, negrp, nringL, nringR, NB, ncgrp = step_meta
    Ct_cells = ncgrp * GT
    supL = arrays.pl_supL
    ntiles = supL.shape[0] // 8
    rrows = arrays.pl_supR.shape[0] // ntiles
    KL = arrays.pl_cd_supL.shape[0]
    KR = arrays.pl_cd_supR.shape[0]
    has_dir = 1 in bnd_kinds
    uniform_geom = geom2d is None
    has_ext = ext2d is not None
    rows = NB * GT * 8

    zero = jnp.float32(0.0)
    scal = jnp.stack(
        [jnp.asarray(dt_f32, jnp.float32)]
        + (
            [jnp.asarray(v, jnp.float32) for v in uniform_scal]
            if uniform_geom else [zero, zero, zero]
        )
    )

    def em(i):  # edge-group block (by eg)
        return pl.BlockSpec(
            (GT * i, 128),
            lambda t, gw, eg, cg, doc, co, dtb: (eg[t], 0),
        )

    def cm3(K):  # cell-plan block (by clamped cell group)
        return pl.BlockSpec(
            (K, GT * 8, 128),
            lambda t, gw, eg, cg, doc, co, dtb: (0, cg[t], 0),
        )

    def cg3(n=3):  # [n, rows, 128] cell-row block (by clamped cell group)
        return pl.BlockSpec(
            (n, GT * 8, 128),
            lambda t, gw, eg, cg, doc, co, dtb: (0, cg[t], 0),
        )

    def co3():  # output block (by raw output index, incl. pad blocks)
        return pl.BlockSpec(
            (ndof, GT * 8, 128),
            lambda t, gw, eg, cg, doc, co, dtb: (0, co[t], 0),
        )

    # per-tile window tables as SMEM blocks (see fused_rhs_slotted)
    rowsL = arrays.pl_cd_wkL.shape[0] // Ct_cells
    rowsR = arrays.pl_cd_wkR.shape[0] // Ct_cells
    smem_blocked = _tables_blocked(ntiles, rowsL + rowsR, Ct_cells)
    if smem_blocked:
        ws_spec = pl.BlockSpec(
            (8, GT), lambda t, gw, eg, cg, doc, co, dtb: (eg[t] // 8, 0),
            memory_space=pltpu.SMEM,
        )
        wkL_spec = pl.BlockSpec(
            (rowsL, 8 * GT),
            lambda t, gw, eg, cg, doc, co, dtb: (0, cg[t] // 8),
            memory_space=pltpu.SMEM,
        )
        wkR_spec = pl.BlockSpec(
            (rowsR, 8 * GT),
            lambda t, gw, eg, cg, doc, co, dtb: (0, cg[t] // 8),
            memory_space=pltpu.SMEM,
        )
    else:
        ws_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        wkL_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        wkR_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [
        ws_spec,
        wkL_spec,
        wkR_spec,
        em(16 + 4 * rrows),  # merged i8 plan
        em(24),              # merged f32 geom (cn|sn|cc)
        cm3(KL + KR),        # merged cell sup i8
        cm3(KL + KR),        # merged cell coef f32
    ] + (
        [pl.BlockSpec(
            (ndof, GT * 8, 128),
            lambda t, gw, eg, cg, doc, co, dtb: (0, eg[t], 0),
        )] if has_dir else []
    ) + [
        cg3(ndof),  # qc: stage-state rows of the cell group
    ] + (
        [cg3(ndof)] if alpha != 0.0 else []  # qA: step-start state rows
    ) + (
        [] if uniform_geom else [cg3()]  # geom (dz_dx | dz_dy | mannings)
    ) + (
        [cg3(ndof)] if has_ext else []  # ext sources
    ) + [
        pl.BlockSpec(memory_space=pltpu.ANY),  # q2d (group-window DMA)
    ]
    out_specs = [
        co3(),  # q_out
        pl.BlockSpec(
            (8, 128),
            lambda t, gw, eg, cg, doc, co, dtb: (0, 0),
        ),
        pl.BlockSpec(
            (8, 128),
            lambda t, gw, eg, cg, doc, co, dtb: (0, 0),
        ),
    ] + ([co3()] if emit_prim else [])
    out_shape = [
        jax.ShapeDtypeStruct((ndof, rows, 128), jnp.float32),
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
        jax.ShapeDtypeStruct((8, 128), jnp.int32),
    ] + (
        [jax.ShapeDtypeStruct((ndof, rows, 128), jnp.float32)]
        if emit_prim else []
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(ns,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, ndof, wq * 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((nringL * 8, ndof, 128), jnp.float32),
            pltpu.VMEM((nringR * 8, ndof, 128), jnp.float32),
        ],
    )
    f = pl.pallas_call(
        functools.partial(
            _fused_step_kernel, nsup=nsup, wq=wq, upwind=bool(upwind),
            tiny_h=float(tiny_h), h_anuga=float(h_anuga), rrows=rrows,
            nsupL_ks=tuple(nsup_lk), nsupR_ks=tuple(nsup_rk),
            Ct=ncgrp * GT, KL=KL, KR=KR, negrp=negrp,
            nringL=nringL, nringR=nringR, ncgrp=ncgrp,
            bnd_kinds=tuple(bnd_kinds), alpha=float(alpha),
            beta=float(beta), gfac=float(gfac),
            source_method=int(source_method), emit_prim=bool(emit_prim),
            xq_threshold=float(xq_threshold),
            uniform_geom=uniform_geom, has_ext=has_ext,
            smem_blocked=smem_blocked, nt=nt,
            num_sediment=int(num_sediment), sed_params=sp_tuple,
            ident_l=bool(ident_l),
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )
    dir_args = (dir_planes,) if has_dir else ()
    qa_args = (qA2d,) if alpha != 0.0 else ()
    geom_args = () if uniform_geom else (geom2d,)
    ext_args = (ext2d,) if has_ext else ()
    return f(
        arrays.pl_gws,
        arrays.pl_st_eg, arrays.pl_st_cg, arrays.pl_st_doc,
        arrays.pl_st_co, scal,
        _pad_rows(arrays.pl_ws.reshape(negrp, GT), 8)
        if smem_blocked else arrays.pl_ws.reshape(negrp, GT),
        _pad_cols(arrays.pl_cd_wkL.reshape(rowsL, Ct_cells), 8 * GT)
        if smem_blocked else arrays.pl_cd_wkL.reshape(rowsL, Ct_cells),
        _pad_cols(arrays.pl_cd_wkR.reshape(rowsR, Ct_cells), 8 * GT)
        if smem_blocked else arrays.pl_cd_wkR.reshape(rowsR, Ct_cells),
        arrays.pl_fz_e8, arrays.pl_fz_ef,
        arrays.pl_fz_c8, arrays.pl_fz_cf,
        *dir_args,
        q2d, *qa_args, *geom_args, *ext_args,
        q2d,
    )


# ---------------------------------------------------- MUSCL (second order)

def _muscl_pre_kernel(ws_ref, supL_ref, supR_ref, m_ref, g_ref, gi_ref,
                      mi_ref, *rest, nsup, rrows=RROWS):
    """Gather qL/qR per edge slot and emit (qL, qR) in the L-layout plus
    dq = qR - qL in both layouts (for the LS gradient kernel)."""
    q_all = rest[: GT * nsup]
    oQ_ref, oDqL_ref, oDqR_ref = (
        rest[GT * nsup], rest[GT * nsup + 1], rest[GT * nsup + 2]
    )

    supL_all = supL_ref[:].astype(jnp.int32)
    supR_all = supR_ref[:].astype(jnp.int32)
    m_all = m_ref[:].astype(jnp.int32)
    g_all_i = g_ref[:].astype(jnp.int32)
    gi_all = gi_ref[:].astype(jnp.int32)
    mi_all = mi_ref[:].astype(jnp.int32)

    for gt in range(GT):
        r8 = slice(gt * 8, gt * 8 + 8)
        rA = slice(gt * rrows, gt * rrows + 8)
        rB = slice(gt * rrows + 8, gt * rrows + 16)
        q_refs = q_all[gt * nsup : (gt + 1) * nsup]
        supL = supL_all[r8, :]
        supR0 = supR_all[rA, :]
        mm0 = m_all[rA, :]
        gi0 = gi_all[rA, :]
        mi0 = mi_all[rA, :]
        if rrows == 16:
            supR1 = supR_all[rB, :]
            mm1 = m_all[rB, :]
            gi1 = gi_all[rB, :]
            mi1 = mi_all[rB, :]
        g = g_all_i[r8, :]

        for comp in range(3):
            qL = _window_gather(q_refs, supL, comp, nsup)
            z1a = _window_gather(q_refs, supR0, comp, nsup)
            z2a = jnp.take_along_axis(z1a, mm0, axis=1)
            ya = jnp.take_along_axis(z2a, jnp.clip(g, 0, 7), axis=0)
            if rrows == 16:
                z1b = _window_gather(q_refs, supR1, comp, nsup)
                z2b = jnp.take_along_axis(z1b, mm1, axis=1)
                yb = jnp.take_along_axis(
                    z2b, jnp.clip(g - 8, 0, 7), axis=0
                )
                qR = jnp.where(g < 8, ya, yb)
            else:
                qR = ya
            # garbage slots are inert downstream: the gradient plan has
            # coef 0 for them (no valid mask needed)
            dq = qR - qL
            oQ_ref[r8, comp, :] = qL
            oQ_ref[r8, 3 + comp, :] = qR
            oDqL_ref[r8, comp, :] = dq
            u0 = jnp.take_along_axis(dq, gi0, axis=0)
            oDqR_ref[rA, comp, :] = jnp.take_along_axis(u0, mi0, axis=1)
            if rrows == 16:
                u1 = jnp.take_along_axis(dq, gi1, axis=0)
                oDqR_ref[rB, comp, :] = jnp.take_along_axis(u1, mi1, axis=1)


def muscl_pre_slotted(arrays, q, nsup, interpret=False):
    """Returns (oQ [R8, 6, 128] = (qL, qR), dqL [R8, 3, 128],
    dqR [R16, 3, 128])."""
    supL = arrays.pl_supL
    ntiles = supL.shape[0] // 8
    rrows = arrays.pl_supR.shape[0] // ntiles
    C = q.shape[1]
    Crows = -(-C // 128)
    q32 = q[:3].astype(jnp.float32)
    if C % 128:
        q32 = jnp.pad(q32, ((0, 0), (0, Crows * 128 - C)))
    q2d = jnp.pad(
        q32.reshape(3, Crows, 128), ((0, 0), (0, nsup * 8 + 8), (0, 0))
    )
    nsteps = ntiles // GT
    in_specs = [
        pl.BlockSpec((GT * 8, 128), lambda t, ws: (t, 0)),      # supL i8
        pl.BlockSpec((GT * rrows, 128), lambda t, ws: (t, 0)),  # supR i8
        pl.BlockSpec((GT * rrows, 128), lambda t, ws: (t, 0)),  # m i8
        pl.BlockSpec((GT * 8, 128), lambda t, ws: (t, 0)),      # g i8
        pl.BlockSpec((GT * rrows, 128), lambda t, ws: (t, 0)),  # gi i8
        pl.BlockSpec((GT * rrows, 128), lambda t, ws: (t, 0)),  # mi i8
    ] + [
        pl.BlockSpec(
            (3, 8, 128),
            lambda t, ws, g=g, s=s: (0, ws[t * GT + g] + s, 0),
        )
        for g in range(GT)
        for s in range(nsup)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((GT * 8, 6, 128), lambda t, ws: (t, 0, 0)),
            pl.BlockSpec((GT * 8, 3, 128), lambda t, ws: (t, 0, 0)),
            pl.BlockSpec((GT * rrows, 3, 128), lambda t, ws: (t, 0, 0)),
        ],
    )
    f = pl.pallas_call(
        functools.partial(_muscl_pre_kernel, nsup=nsup, rrows=rrows),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ntiles * 8, 6, 128), jnp.float32),
            jax.ShapeDtypeStruct((ntiles * 8, 3, 128), jnp.float32),
            jax.ShapeDtypeStruct((ntiles * rrows, 3, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )
    return f(
        arrays.pl_ws, supL, arrays.pl_supR, arrays.pl_m, arrays.pl_g,
        arrays.pl_gi, arrays.pl_mi,
        *([q2d] * (GT * nsup)),
    )


def _grad_kernel(wsl_ref, wsr_ref, sL_ref, cxL_ref, cyL_ref, sR_ref,
                 cxR_ref, cyR_ref, *rest, nsupL, nsupR, KL, KR):
    """Least-squares cell gradients: grad[c] += coef * dq over incident
    edges (the reference scatter in gather form; muscl.py docstring)."""
    dL_all = rest[: GT * nsupL]
    dR_all = rest[GT * nsupL : GT * (nsupL + nsupR)]
    o_ref = rest[GT * (nsupL + nsupR)]

    sL_all = sL_ref[:].astype(jnp.int32)
    sR_all = sR_ref[:].astype(jnp.int32)

    for gt in range(GT):
        r8 = slice(gt * 8, gt * 8 + 8)
        gx = [jnp.zeros((8, 128), jnp.float32) for _ in range(3)]
        gy = [jnp.zeros((8, 128), jnp.float32) for _ in range(3)]

        def side(refs, s_all, cx_ref, cy_ref, K, nsup):
            for k in range(K):
                sup = s_all[k, r8]
                cx = cx_ref[k, r8]
                cy = cy_ref[k, r8]
                for comp in range(3):
                    gat = jnp.zeros((8, 128), jnp.float32)
                    for s in range(nsup):
                        src = refs[s][:, comp, :]
                        gg = jnp.take_along_axis(
                            src, jnp.clip(sup - s * 8, 0, 7), axis=0
                        )
                        gat = jnp.where((sup >> 3) == s, gg, gat)
                    gx[comp] = gx[comp] + gat * cx
                    gy[comp] = gy[comp] + gat * cy

        side(dL_all[gt * nsupL : (gt + 1) * nsupL], sL_all, cxL_ref,
             cyL_ref, KL, nsupL)
        side(dR_all[gt * nsupR : (gt + 1) * nsupR], sR_all, cxR_ref,
             cyR_ref, KR, nsupR)
        for comp in range(3):
            o_ref[r8, comp, :] = gx[comp]
            o_ref[r8, 3 + comp, :] = gy[comp]


def muscl_grad_slotted(arrays, dqL, dqR, nsupL, nsupR, interpret=False):
    """Returns cell gradients [Ct*8, 6, 128] = (gx_h..gx_hv, gy_h..gy_hv)."""
    supL = arrays.pl_cd_supL
    KL, RcL, _ = supL.shape
    KR = arrays.pl_cd_supR.shape[0]
    Ct = RcL // 8
    dqL = jnp.pad(dqL, ((0, nsupL * 8 + 8), (0, 0), (0, 0)))
    dqR = jnp.pad(dqR, ((0, nsupR * 8 + RROWS), (0, 0), (0, 0)))
    nsteps = Ct // GT
    in_specs = [
        pl.BlockSpec((KL, GT * 8, 128), lambda t, wl, wr: (0, t, 0)),
        pl.BlockSpec((KL, GT * 8, 128), lambda t, wl, wr: (0, t, 0)),
        pl.BlockSpec((KL, GT * 8, 128), lambda t, wl, wr: (0, t, 0)),
        pl.BlockSpec((KR, GT * 8, 128), lambda t, wl, wr: (0, t, 0)),
        pl.BlockSpec((KR, GT * 8, 128), lambda t, wl, wr: (0, t, 0)),
        pl.BlockSpec((KR, GT * 8, 128), lambda t, wl, wr: (0, t, 0)),
    ] + [
        pl.BlockSpec(
            (8, 3, 128),
            lambda t, wl, wr, g=g, s=s: (wl[t * GT + g] + s, 0, 0),
        )
        for g in range(GT)
        for s in range(nsupL)
    ] + [
        pl.BlockSpec(
            (8, 3, 128),
            lambda t, wl, wr, g=g, s=s: (wr[t * GT + g] + s, 0, 0),
        )
        for g in range(GT)
        for s in range(nsupR)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (GT * 8, 6, 128), lambda t, wl, wr: (t, 0, 0)
        ),
    )
    f = pl.pallas_call(
        functools.partial(
            _grad_kernel, nsupL=nsupL, nsupR=nsupR, KL=KL, KR=KR
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Ct * 8, 6, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )
    return f(
        arrays.pl_cd_wsL, arrays.pl_cd_wsR,
        arrays.pl_cd_supL, arrays.pl_cd_cxL, arrays.pl_cd_cyL,
        arrays.pl_cd_supR, arrays.pl_cd_cxR, arrays.pl_cd_cyR,
        *([dqL] * (GT * nsupL)), *([dqR] * (GT * nsupR)),
    )


def _limit(limiter, extrap, half_dq):
    if limiter == "none":
        return extrap
    prod = extrap * half_dq
    if limiter == "van_leer":
        ssum = extrap + half_dq
        s_safe = jnp.where(ssum != 0.0, ssum, 1.0)
        return jnp.where(prod > 0.0, 2.0 * prod / s_safe, 0.0)
    return jnp.where(
        prod <= 0.0,
        0.0,
        jnp.where(jnp.abs(extrap) < jnp.abs(half_dq), extrap, half_dq),
    )


def _muscl_flux_kernel(ws_ref, supL_ref, supR_ref, m_ref, g_ref, gi_ref,
                       mi_ref, cn_ref, sn_ref,
                       dxl_ref, dyl_ref, dxr_ref, dyr_ref, oq_ref, dql_ref,
                       *rest, nsup, limiter, tiny_h, h_anuga, rrows=RROWS,
                       bs=False):
    """Reconstruct limited face states from cell gradients and solve Roe."""
    if bs:
        etab_ref, etae_ref, zvb_ref, zve_ref = rest[:4]
        rest = rest[4:]
    g_all = rest[: GT * nsup]
    oL_ref, oA_ref, oR_ref = (
        rest[GT * nsup], rest[GT * nsup + 1], rest[GT * nsup + 2]
    )

    supL_all = supL_ref[:].astype(jnp.int32)
    supR_all = supR_ref[:].astype(jnp.int32)
    m_all = m_ref[:].astype(jnp.int32)
    g_all_i = g_ref[:].astype(jnp.int32)
    gi_all = gi_ref[:].astype(jnp.int32)
    mi_all = mi_ref[:].astype(jnp.int32)

    for gt in range(GT):
        r8 = slice(gt * 8, gt * 8 + 8)
        rA = slice(gt * rrows, gt * rrows + 8)
        rB = slice(gt * rrows + 8, gt * rrows + 16)
        g_refs = g_all[gt * nsup : (gt + 1) * nsup]
        supL = supL_all[r8, :]
        supR0 = supR_all[rA, :]
        mm0 = m_all[rA, :]
        if rrows == 16:
            supR1 = supR_all[rB, :]
            mm1 = m_all[rB, :]
        g = g_all_i[r8, :]

        def gatherLR(comp):
            gL = _window_gather(g_refs, supL, comp, nsup)
            z1a = _window_gather(g_refs, supR0, comp, nsup)
            z2a = jnp.take_along_axis(z1a, mm0, axis=1)
            ya = jnp.take_along_axis(z2a, jnp.clip(g, 0, 7), axis=0)
            if rrows == 16:
                z1b = _window_gather(g_refs, supR1, comp, nsup)
                z2b = jnp.take_along_axis(z1b, mm1, axis=1)
                yb = jnp.take_along_axis(
                    z2b, jnp.clip(g - 8, 0, 7), axis=0
                )
                return gL, jnp.where(g < 8, ya, yb)
            return gL, ya

        dxl = dxl_ref[r8, :]
        dyl = dyl_ref[r8, :]
        dxr = dxr_ref[r8, :]
        dyr = dyr_ref[r8, :]

        qf = []
        for comp in range(3):
            gxL, gxR = gatherLR(comp)
            gyL, gyR = gatherLR(3 + comp)
            qL = oq_ref[r8, comp, :]
            qR = oq_ref[r8, 3 + comp, :]
            dq = dql_ref[r8, comp, :]
            extrap_L = gxL * dxl + gyL * dyl
            extrap_R = gxR * dxr + gyR * dyr
            qfL = qL + _limit(limiter, extrap_L, 0.5 * dq)
            qfR = qR + _limit(limiter, extrap_R, -0.5 * dq)
            qf.append((qfL, qfR))

        (hl, hr), (hul, hur), (hvl, hvr) = qf
        hl = jnp.maximum(0.0, hl)
        hr = jnp.maximum(0.0, hr)
        ul, vl = regularized_velocity(hl, hul, hvl, tiny_h, h_anuga)
        ur, vr = regularized_velocity(hr, hur, hvr, tiny_h, h_anuga)
        cn = cn_ref[r8, :]
        sn = sn_ref[r8, :]
        f_h, f_hu, f_hv, amax = roe_flux(
            hl, ul, vl, hr, ur, vr, sn, cn, fast=True
        )
        if bs:
            # BS2002 momentum correction, same as the first-order kernel
            # (the reference applies eta_vertices + muscl_interior_flux
            # together, operator.c:159-176)
            from ...constants import GRAVITY

            hvb = jnp.maximum(etab_ref[r8, :] - zvb_ref[r8, :], 0.0)
            hve = jnp.maximum(etae_ref[r8, :] - zve_ref[r8, :], 0.0)
            dhv = hve - hvb
            corr = jnp.float32(GRAVITY / 24.0) * dhv * dhv
            f_hu = f_hu + corr * cn
            f_hv = f_hv + corr * sn
        dry = (hl < tiny_h) & (hr < tiny_h)
        mask = jnp.where(dry, 0.0, 1.0)
        fluxes = (f_h * mask, f_hu * mask, f_hv * mask)
        oL_ref[r8, 0, :] = fluxes[0]
        oL_ref[r8, 1, :] = fluxes[1]
        oL_ref[r8, 2, :] = fluxes[2]
        oA_ref[r8, :] = amax * mask

        gi0 = gi_all[rA, :]
        mi0 = mi_all[rA, :]
        if rrows == 16:
            gi1 = gi_all[rB, :]
            mi1 = mi_all[rB, :]
        for comp in range(3):
            fL = fluxes[comp]
            u0 = jnp.take_along_axis(fL, gi0, axis=0)
            oR_ref[rA, comp, :] = jnp.take_along_axis(u0, mi0, axis=1)
            if rrows == 16:
                u1 = jnp.take_along_axis(fL, gi1, axis=0)
                oR_ref[rB, comp, :] = jnp.take_along_axis(u1, mi1, axis=1)


def muscl_flux_slotted(arrays, grad, oQ, dqL, tiny_h, h_anuga, nsup,
                       limiter, interpret=False, bs=None):
    """grad: [Ct*8, 6, 128] from muscl_grad_slotted. bs=(etab, etae)
    applies the BS2002 momentum correction. Returns
    (fluxL [R8, 4, 128], fluxR [R16, 3, 128]) like edge_flux_slotted."""
    supL = arrays.pl_supL
    ntiles = supL.shape[0] // 8
    rrows = arrays.pl_supR.shape[0] // ntiles
    # cell-major -> comp-major (the edge gather machinery reads
    # [comp, cell_row, 128] blocks, same layout as q2d)
    g2d = jnp.pad(
        grad.transpose(1, 0, 2), ((0, 0), (0, nsup * 8 + 8), (0, 0))
    )
    nsteps = ntiles // GT
    in_specs = [
        pl.BlockSpec((GT * 8, 128), lambda t, ws: (t, 0)),      # supL i8
        pl.BlockSpec((GT * rrows, 128), lambda t, ws: (t, 0)),  # supR i8
        pl.BlockSpec((GT * rrows, 128), lambda t, ws: (t, 0)),  # m i8
        pl.BlockSpec((GT * 8, 128), lambda t, ws: (t, 0)),      # g i8
        pl.BlockSpec((GT * rrows, 128), lambda t, ws: (t, 0)),  # gi i8
        pl.BlockSpec((GT * rrows, 128), lambda t, ws: (t, 0)),  # mi i8
        pl.BlockSpec((GT * 8, 128), lambda t, ws: (t, 0)),      # cn
        pl.BlockSpec((GT * 8, 128), lambda t, ws: (t, 0)),      # sn
        pl.BlockSpec((GT * 8, 128), lambda t, ws: (t, 0)),      # dxl
        pl.BlockSpec((GT * 8, 128), lambda t, ws: (t, 0)),      # dyl
        pl.BlockSpec((GT * 8, 128), lambda t, ws: (t, 0)),      # dxr
        pl.BlockSpec((GT * 8, 128), lambda t, ws: (t, 0)),      # dyr
        pl.BlockSpec((GT * 8, 6, 128), lambda t, ws: (t, 0, 0)),  # oQ
        pl.BlockSpec((GT * 8, 3, 128), lambda t, ws: (t, 0, 0)),  # dqL
    ] + ([
        pl.BlockSpec((GT * 8, 128), lambda t, ws: (t, 0)),      # bs etab
        pl.BlockSpec((GT * 8, 128), lambda t, ws: (t, 0)),      # bs etae
        pl.BlockSpec((GT * 8, 128), lambda t, ws: (t, 0)),      # bs zvb
        pl.BlockSpec((GT * 8, 128), lambda t, ws: (t, 0)),      # bs zve
    ] if bs is not None else []) + [
        pl.BlockSpec(
            (6, 8, 128),
            lambda t, ws, g=g, s=s: (0, ws[t * GT + g] + s, 0),
        )
        for g in range(GT)
        for s in range(nsup)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((GT * 8, 3, 128), lambda t, ws: (t, 0, 0)),
            pl.BlockSpec((GT * 8, 128), lambda t, ws: (t, 0)),
            pl.BlockSpec((GT * rrows, 3, 128), lambda t, ws: (t, 0, 0)),
        ],
    )
    f = pl.pallas_call(
        functools.partial(
            _muscl_flux_kernel, nsup=nsup, limiter=limiter,
            tiny_h=float(tiny_h), h_anuga=float(h_anuga), rrows=rrows,
            bs=bs is not None,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ntiles * 8, 3, 128), jnp.float32),
            jax.ShapeDtypeStruct((ntiles * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((ntiles * rrows, 3, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )
    bs_args = (
        (bs[0], bs[1], arrays.pl_bs.zvb, arrays.pl_bs.zve)
        if bs is not None else ()
    )
    fluxL, amax, fluxR = f(
        arrays.pl_ws, supL, arrays.pl_supR, arrays.pl_m, arrays.pl_g,
        arrays.pl_gi, arrays.pl_mi,
        arrays.pl_cn, arrays.pl_sn,
        arrays.pl_dxl, arrays.pl_dyl, arrays.pl_dxr, arrays.pl_dyr,
        oQ, dqL, *bs_args, *([g2d] * (GT * nsup)),
    )
    return fluxL, fluxR, amax


def edge_flux_muscl_slotted(op, q, interpret=False, bs=None):
    """Full second-order interior flux: dq/qLR gather -> LS gradients ->
    limited reconstruction + Roe (+ BS2002 correction when bs=(etab,
    etae)). Returns (fluxL, fluxR)."""
    a = op.arrays
    oQ, dqL, dqR = muscl_pre_slotted(a, q, op.pallas_nsup, interpret)
    grad = muscl_grad_slotted(
        a, dqL, dqR, op.pallas_cd_nsup_l, op.pallas_cd_nsup_r, interpret
    )
    return muscl_flux_slotted(
        a, grad, oQ, dqL, op.tiny_h, op.h_anuga, op.pallas_nsup,
        op.limiter, interpret, bs=bs
    )


# --------------------------------------------------------- operator glue

def build_plan_arrays(il, ir, cn_h, sn_h, ccoef, ce, cec, num_cells, Ei,
                      max_sup: int = 4, max_sup_cd: int = 16, muscl=None,
                      cell_z=None, rcap="auto", bnd=None, ndof: int = 3,
                      layout: str = "auto"):
    """Host-level plan build over one edge set (all numpy in/out).

    il/ir: [Ei] cell ids; cn_h/sn_h: [Ei]; ccoef: [E] (interior first);
    ce/cec: [C, K] cell->edge gather maps (indices >= Ei are boundary or
    dummy); muscl: None, or a dict with cell_ls_cx/cell_ls_cy [C, K] and
    int_dxl/int_dyl/int_dxr/int_dyr [Ei] for the second-order kernels;
    cell_z: [C] bed elevations -- when given, the static per-edge
    hydrostatic-reconstruction drops zmax - zL / zmax - zR are slotted as
    pl_hr_dzl/pl_hr_dzr (swe_fluxes_hydro_recon_ceed.h: depths from
    eta - max(z), velocities from the raw states).

    bnd (unified mode): dict(left [Eb], cn, sn, btype) — fold boundary
    edges into the plan so the fused kernel's divergence is complete (the
    reference's per-boundary flux sub-operators become in-kernel ghost
    selects). Falls back to an interior-only plan when the unified packing
    fails or the fused schedule is infeasible — the non-fused kernels only
    handle interior slots.

    Returns None when the mesh exceeds the static window budgets, else
    (plan_np, reordered, meta):
      plan_np: {pl_*: numpy array} kernel plan fields
      reordered: host arrays rewritten to the plan's sorted edge order
      meta: {nsup, nsupL, nsupR}
    """
    assert bnd is None or muscl is None, "unified plans are first-order only"
    E_lim = Ei + (len(bnd["left"]) if bnd is not None else 0)
    plan = None
    kept_bnd = rem_bnd = None
    ident_l = False
    # the identity-aligned layout cuts the divergence chain 19 -> 6
    # iterations and matches the legacy layout bitwise through the
    # two-kernel and fused-RHS tiers (tier-B A/B: 1.29 s both at 2.88M),
    # but the full-STEP kernel's DMA pipeline inexplicably serializes
    # under it (skeleton floor 0.55 vs 0.20 s/500; BASELINE.md round 5)
    # — opt-in via RDYTPU_LAYOUT=aligned until that is root-caused
    env_layout = _os.environ.get("RDYTPU_LAYOUT", layout)
    if (
        env_layout == "aligned"
        and layout != "legacy"
        and muscl is None
        and cell_z is None
    ):
        res_al = build_slotted_plan_aligned(
            il, ir, cn_h, sn_h, ccoef, num_cells, max_sup=max_sup,
            bnd=dict(bnd, ccoef=ccoef[Ei:E_lim]) if bnd is not None
            else None,
            ndof=ndof,
        )
        if res_al is not None:
            plan, kept_bnd, rem_bnd = res_al
            ident_l = True
            _plan_debug(
                f"aligned layout: {plan.ntiles} tiles, "
                f"remainder boundary edges {len(rem_bnd)}"
            )
    if plan is None and bnd is not None:
        plan = build_slotted_plan(
            il, ir, cn_h, sn_h, ccoef[:Ei], num_cells, max_sup=max_sup,
            rcap=rcap, bnd=dict(bnd, ccoef=ccoef[Ei:E_lim]), ndof=ndof,
        )
        if plan is None:
            bnd = None
            E_lim = Ei
    if plan is None:
        plan = build_slotted_plan(
            il, ir, cn_h, sn_h, ccoef[:Ei], num_cells, max_sup=max_sup,
            rcap=rcap, ndof=ndof,
        )
    if plan is None:
        return None

    from ...mesh import native

    order = plan.order
    bl_np = np.asarray(bnd["left"], np.int64) if bnd is not None else None
    if bnd is not None:
        bt_np = np.asarray(bnd["btype"], np.int64)
        # btype in plan-sorted order (0 interior, type + 1 boundary)
        # without materialising the concatenated edge list
        bmask = order >= Ei
        btype_sorted = np.zeros(len(order), np.int64)
        btype_sorted[bmask] = bt_np[order[bmask] - Ei] + 1
        order_int = order[~bmask]
    else:
        btype_sorted = None
        order_int = order
    # remap of the operator's cell->edge map to plan order only needs
    # `order` — run it on a thread UNDER the cell-plan build (~20 s
    # overlapped at 46M cells, round 5 VERDICT #5)
    from concurrent.futures import ThreadPoolExecutor as _TPE

    _remap_ex = _TPE(1)
    _remap_fut = (
        None if ident_l else _remap_ex.submit(native.remap_ce, order, Ei, ce)
    )

    il_s = plan.il_s
    ir_s = plan.ir_s
    if il_s is None:  # plan from a path that didn't record the sorted cells
        il_all_ = (np.concatenate([np.asarray(il, np.int64), bl_np])
                   if bnd is not None else np.asarray(il, np.int64))
        ir_all_ = (np.concatenate([np.asarray(ir, np.int64), bl_np])
                   if bnd is not None else np.asarray(ir, np.int64))
        il_s = il_all_[order]
        ir_s = ir_all_[order]

    # per-edge signed len/area coefficients wrt the left and right cells,
    # extracted from the operator's gather maps (robust to conventions)
    C, K = ce.shape
    # the MUSCL LS-gradient extraction below reuses this path's masks, so
    # second-order plans keep the numpy extraction
    nat_coef = (native.coef_extract(ce, cec, il, bl_np, E_lim)
                if muscl is None else None)
    if nat_coef is not None:
        coefL, coefR = nat_coef
    else:
        il_all = (np.concatenate([np.asarray(il, np.int64), bl_np])
                  if bnd is not None else il)
        coefL = np.zeros(E_lim)
        coefR = np.zeros(E_lim)
        cells = np.repeat(np.arange(C), K)
        edges = ce.reshape(-1)
        cfs = cec.reshape(-1)
        interior = edges < E_lim
        e_i = edges[interior]
        c_i = cells[interior]
        f_i = cfs[interior]
        is_left = il_all[e_i] == c_i
        coefL[e_i[is_left]] = f_i[is_left]
        coefR[e_i[~is_left]] = f_i[~is_left]

    if bnd is not None:
        # boundary pseudo-edge fluxes land in BOTH rings (the edge kernel
        # routes every L slot into the R layout), so each boundary edge can
        # feed its cell's divergence from either side. Greedily assign it
        # to the cell's emptier side: cells with several boundary edges
        # otherwise push KL up (e.g. 2 -> 4 on quad corners), and the
        # divergence gather-chain count scales with KL * nsupL.
        nLc = np.bincount(il, minlength=num_cells)
        nRc = np.bincount(ir[ir >= 0], minlength=num_cells)
        for j in range(Ei, E_lim):
            c = int(bl_np[j - Ei])
            if nLc[c] > nRc[c]:
                coefR[j] = coefL[j]
                coefL[j] = 0.0
                nRc[c] += 1
            else:
                nLc[c] += 1

    cp_res = build_cell_plan(
        plan, il_s, ir_s, coefL[order], coefR[order], num_cells,
        max_supL=max_sup_cd, max_supR=max_sup_cd,
        btype_sorted=btype_sorted, ndof=ndof,
        allow_fused_only=bnd is not None or ident_l,
        cluster_k=ident_l and _os.environ.get("RDYTPU_CLUSTER_K", "1") != "0",
    )
    if cp_res is None:
        if bnd is not None:
            # retry interior-only (the unified KL can exceed the budget)
            return build_plan_arrays(
                il, ir, cn_h, sn_h, ccoef, ce, cec, num_cells, Ei,
                max_sup=max_sup, max_sup_cd=max_sup_cd, muscl=muscl,
                cell_z=cell_z, rcap=rcap, bnd=None, ndof=ndof,
            )
        return None
    cell_plan, slot_coefs = cp_res

    # streaming fused edge+cell schedule (first-order paths); None when a
    # VMEM flux ring would be too large -> two-kernel fallback
    fsched = build_fused_schedule(plan, cell_plan, ndof=ndof)
    if fsched is None and bnd is not None:
        # the non-fused kernels only handle interior slots; rebuild without
        # the boundary fold so the two-kernel fallback stays correct
        return build_plan_arrays(
            il, ir, cn_h, sn_h, ccoef, ce, cec, num_cells, Ei,
            max_sup=max_sup, max_sup_cd=max_sup_cd, muscl=muscl,
            cell_z=cell_z, rcap=rcap, bnd=None, ndof=ndof,
        )

    # merged single-stream layouts for the fused kernel: the round-2 floor
    # ablation (all compute removed) measured 74% of the fused step in the
    # DMA/pipeline skeleton -- 13 small per-step streams moving 248 MB at
    # an effective 129 GB/s. Interleaving the six i8 plan arrays into ONE
    # per-tile block, the f32 geometry (+ HR drops) into another, and the
    # cell plans pairwise cuts the per-step DMA issues from ~13 to ~4.
    fz_np = {}
    if fsched is not None:
        rr = plan.rrows
        ntl = plan.ntiles
        r3 = lambda a, per: a.reshape(ntl, per, 128)
        fz_e8 = np.concatenate(
            [
                r3(plan.supL, 8), r3(plan.g, 8), r3(plan.supR, rr),
                r3(plan.m, rr), r3(plan.gi, rr), r3(plan.mi, rr),
            ],
            axis=1,
        ).reshape(-1, 128)

    # slotted per-edge static values in the L-layout
    R_l = plan.ntiles * 8

    def slot_edge_vals(v):
        arr = np.zeros((R_l, 128), np.float32)
        arr.reshape(-1)[plan.eposL] = v[order].astype(np.float32)
        return arr

    hr_np = {}
    if cell_z is not None:
        # boundary pseudo-edges (unified mode) see the same cell on both
        # sides -> dz == 0 -> reconstruction is the identity there, matching
        # the twin (boundary edges are never HR-reconstructed); computed in
        # plan-sorted space (cell_z[il_s] == cell_z[il_all][order])
        cz = np.asarray(cell_z)
        zl_s = cz[il_s]
        zr_s = cz[ir_s]
        zmax_s = np.maximum(zl_s, zr_s)

        def _slot_sorted(v_s):
            arr = np.zeros((R_l, 128), np.float32)
            arr.reshape(-1)[plan.eposL] = v_s.astype(np.float32)
            return arr

        hr_np = dict(
            pl_hr_dzl=_slot_sorted(zmax_s - zl_s),
            pl_hr_dzr=_slot_sorted(zmax_s - zr_s),
        )

    muscl_np = {}
    if muscl is not None:
        # per-edge-side LS gradient coefficients (grad[c] += coef * dq[e])
        # extracted from the (cell, slot)-aligned cell_ls_cx/cy, exactly
        # like coefL/coefR above
        ls_cx = muscl["cell_ls_cx"].reshape(-1)[interior]
        ls_cy = muscl["cell_ls_cy"].reshape(-1)[interior]
        cxL = np.zeros(Ei); cyL = np.zeros(Ei)
        cxR = np.zeros(Ei); cyR = np.zeros(Ei)
        cxL[e_i[is_left]] = ls_cx[is_left]
        cyL[e_i[is_left]] = ls_cy[is_left]
        cxR[e_i[~is_left]] = ls_cx[~is_left]
        cyR[e_i[~is_left]] = ls_cy[~is_left]
        (g_cxL, g_cyL), (g_cxR, g_cyR) = slot_coefs(
            [cxL[order], cyL[order]], [cxR[order], cyR[order]]
        )
        # slotted centroid->edge-midpoint displacements (L-layout)
        muscl_np = dict(
            pl_dxl=slot_edge_vals(muscl["int_dxl"]),
            pl_dyl=slot_edge_vals(muscl["int_dyl"]),
            pl_dxr=slot_edge_vals(muscl["int_dxr"]),
            pl_dyr=slot_edge_vals(muscl["int_dyr"]),
            pl_cd_cxL=g_cxL, pl_cd_cyL=g_cyL,
            pl_cd_cxR=g_cxR, pl_cd_cyR=g_cyR,
        )

    if fsched is not None:
        ef_parts = [
            r3(plan.cn, 8), r3(plan.sn, 8), r3(plan.courant_coef, 8),
        ]
        if hr_np:
            ef_parts += [
                r3(hr_np["pl_hr_dzl"], 8), r3(hr_np["pl_hr_dzr"], 8),
            ]
        fz_np = dict(
            pl_fz_e8=fz_e8,
            pl_fz_ef=np.concatenate(ef_parts, axis=1).reshape(-1, 128),
            pl_fz_c8=np.concatenate(
                [cell_plan.supLk, cell_plan.supRk], 0
            ),
            pl_fz_cf=np.concatenate([cell_plan.cfL, cell_plan.cfR], 0),
        )

    # full-step schedule (unified plans only): the fused STEP kernel carries
    # the state in tile-row layout [ndof, NB*GT*8, 128] across the interval
    # loop and emits the UPDATED state, so per-step XLA work drops to
    # scalars. The q window may read wq supers past the cell rows, so the
    # state rows include that slack; npad trailing grid steps write zeros
    # there, keeping window reads into the slack dry (h == 0) forever.
    st_np = {}
    step_meta = ()
    if fsched is not None and bnd is not None and cell_z is None:
        Ct = cell_plan.ntiles
        ncgrp = Ct // GT
        NB = -(-(Ct * 8 + plan.wq * 8 + 8) // (GT * 8))
        npad = NB - ncgrp
        ns = fsched.nsteps + npad
        cgo = np.concatenate(
            [fsched.cg, ncgrp + np.arange(npad, dtype=np.int32)]
        ).astype(np.int32)
        st_np = dict(
            pl_st_eg=np.minimum(np.arange(ns), fsched.negrp - 1).astype(
                np.int32
            ),
            pl_st_cg=np.minimum(cgo, ncgrp - 1).astype(np.int32),
            pl_st_co=cgo,
            pl_st_doc=np.concatenate(
                [fsched.doc, np.ones(npad, np.int32)]
            ).astype(np.int32),
        )
        step_meta = (ns, fsched.negrp, fsched.nringL, fsched.nringR,
                     NB, ncgrp)

    # remap operator interior-edge order to plan (sorted) order; in unified
    # mode the stable min-cell sort preserves the interior edges' relative
    # order, so order_int is exactly the interior permutation
    # aligned plans carry a filtered `order` (remainder boundary edges
    # excluded) whose length differs from the native remap's expectation;
    # the numpy fallback derives order_int itself and is length-agnostic
    ce_new = None if _remap_fut is None else _remap_fut.result()
    _remap_ex.shutdown(wait=False)
    if ce_new is None:
        inv = np.empty(Ei, dtype=np.int64)
        inv[order_int] = np.arange(Ei)
        ce_new = np.where(ce < Ei, inv[np.clip(ce, 0, Ei - 1)], ce)

    reordered = dict(
        int_left=il[order_int], int_right=ir[order_int],
        int_cn=cn_h[order_int], int_sn=sn_h[order_int],
        cell_edges=ce_new,
        edge_courant_coef=np.concatenate(
            [ccoef[:Ei][order_int], ccoef[Ei:]]
        ),
    )
    plan_np = dict(
        pl_ws=plan.ws,
        pl_gws=plan.gws,
        pl_supL=plan.supL, pl_supR=plan.supR,
        pl_m=plan.m, pl_g=plan.g, pl_gi=plan.gi, pl_mi=plan.mi,
        pl_cn=plan.cn, pl_sn=plan.sn,
        pl_courant_coef=plan.courant_coef,
        pl_slot_edge=plan.slot_edge,
        pl_cd_wsL=cell_plan.wsL, pl_cd_wsR=cell_plan.wsR,
        pl_cd_wkL=cell_plan.wkL, pl_cd_wkR=cell_plan.wkR,
        pl_cd_gwsL=cell_plan.gwsL, pl_cd_gwsR=cell_plan.gwsR,
        pl_cd_supL=cell_plan.supL, pl_cd_cfL=cell_plan.cfL,
        pl_cd_supR=cell_plan.supR, pl_cd_cfR=cell_plan.cfR,
        **(
            dict(pl_fs_eg=fsched.eg, pl_fs_cg=fsched.cg,
                 pl_fs_doc=fsched.doc)
            if fsched is not None else {}
        ),
        **(
            dict(pl_bnd_pos=plan.bnd_pos) if plan.bnd_pos is not None
            else {}
        ),
        **st_np,
        **fz_np,
        **hr_np,
        **muscl_np,
    )
    meta = dict(
        nsup=plan.nsup, nsupL=cell_plan.nsupL, nsupR=cell_plan.nsupR,
        nsupL_ks=cell_plan.nsupL_ks, nsupR_ks=cell_plan.nsupR_ks,
        ident_l=ident_l,
        bnd_kept=kept_bnd, bnd_rem=rem_bnd,
        wq=plan.wq, wl=cell_plan.wl, wr=cell_plan.wr,
        order=order_int,  # original -> sorted interior edge permutation
        eposL=plan.eposL,  # sorted edge -> L-layout flat slot position
        ntiles=plan.ntiles,
        rrows=plan.rrows,
        unified=plan.bnd_pos is not None,  # boundary edges folded in-plan
        fused=(
            (fsched.nsteps, fsched.negrp, fsched.nringL, fsched.nringR)
            if fsched is not None else ()
        ),
        step=step_meta,
    )
    return plan_np, reordered, meta


# device dtypes per plan field: the per-slot index planes are int8 (window
# rows < 32, lanes < 128, row picks < 16), quartering their HBM traffic
_PLAN_DTYPES = {
    "pl_ws": np.int32,
    "pl_gws": np.int32,
    "pl_cd_gwsL": np.int32, "pl_cd_gwsR": np.int32,
    "pl_supL": np.int8, "pl_supR": np.int8,
    "pl_m": np.int8, "pl_g": np.int8, "pl_gi": np.int8, "pl_mi": np.int8,
    "pl_slot_edge": np.int32,
    "pl_cd_wsL": np.int32, "pl_cd_wsR": np.int32,
    "pl_cd_wkL": np.int32, "pl_cd_wkR": np.int32,
    "pl_cd_supL": np.int8, "pl_cd_supR": np.int8,
    "pl_fs_eg": np.int32, "pl_fs_cg": np.int32, "pl_fs_doc": np.int32,
    "pl_st_eg": np.int32, "pl_st_cg": np.int32, "pl_st_co": np.int32,
    "pl_st_doc": np.int32,
    "pl_fz_e8": np.int8, "pl_fz_c8": np.int8,
    "pl_bnd_pos": np.int32,
}
_PLAN_INT_FIELDS = frozenset(_PLAN_DTYPES)


def plan_field_dtype(name):
    """Device dtype for a pl_* plan field (float32 when not an index)."""
    return _PLAN_DTYPES.get(name, np.float32)


def to_pallas_backend(op, max_sup: int | None = None, max_sup_cd: int = 16,
                      interpret: bool = False, rcap="auto"):
    """Rebuild an SWEOperator with the slot-routed Pallas backend.

    Reorders interior edges into sorted (min-cell) order, builds the slot
    plans, and attaches the plan arrays. With max_sup=None (the default)
    the edge-window budget starts at 4 and auto-escalates to the mesh's
    actual bandwidth (capped at 15); an explicitly passed max_sup is a hard
    budget — the build fails (returns op unchanged) if the mesh exceeds it,
    preserving the documented "use cell_ordering: rcm" fallback contract.
    """
    escalate = max_sup is None
    if escalate:
        max_sup = 4
    if op.well_balancing_bs2002 and op.num_tracers:
        return op  # BS2002 tracer transport stays on the XLA twin
    # (MUSCL+HR and MUSCL+tracers are rejected by build_operator, like
    # the reference — no fallback needed here)
    a = op.arrays
    Ei = op.num_internal_edges
    if Ei == 0:
        return op
    # host numpy copies (build_operator keeps them): NEVER np.asarray a
    # device array here -- a device->host readback through the axon relay
    # has been observed to take minutes
    ha = op.host_arrays or {}
    asnp = lambda key, dev: ha[key] if key in ha else np.asarray(dev)
    il = asnp("int_left", a.int_left)
    ir = asnp("int_right", a.int_right)
    cn_h = asnp("int_cn", a.int_cn)
    sn_h = asnp("int_sn", a.int_sn)
    ccoef_h = asnp("edge_courant_coef", a.edge_courant_coef)

    muscl = None
    if op.second_order:
        muscl = dict(
            cell_ls_cx=asnp("cell_ls_cx", a.cell_ls_cx),
            cell_ls_cy=asnp("cell_ls_cy", a.cell_ls_cy),
            int_dxl=asnp("int_dxl", a.int_dxl),
            int_dyl=asnp("int_dyl", a.int_dyl),
            int_dxr=asnp("int_dxr", a.int_dxr),
            int_dyr=asnp("int_dyr", a.int_dyr),
        )

    # unified mode: fold the boundary edges into the plan so the fused
    # kernel's divergence is complete and the XLA boundary scatter-add
    # leaves the hot path (first-order SWE and coupled tracers;
    # MUSCL/BS2002 kernels handle interior slots exclusively)
    bnd = None
    if (
        op.num_boundary_edges > 0
        and not op.second_order
        and not op.well_balancing_bs2002
    ):
        btype = np.empty(op.num_boundary_edges, np.int64)
        for seg in op.segments:
            btype[seg.start : seg.start + seg.count] = seg.bc_type
        bnd = dict(
            left=asnp("bnd_left", a.bnd_left),
            cn=asnp("bnd_cn", a.bnd_cn),
            sn=asnp("bnd_sn", a.bnd_sn),
            btype=btype,
        )

    # auto-escalate the edge-window budget to the mesh's actual bandwidth
    # (only when the caller left max_sup at its default): the packer
    # hard-fails when a LONE edge's endpoints span more than max_sup*8
    # supers from the tile's aligned window start, so the exact per-edge
    # requirement is computable up front. Wide rasters (the 46M dam-break
    # is 8192 cells across -> vertical-edge span 64 supers) then get a
    # valid (usually fused-only) plan instead of falling back to XLA.
    # Cap at 15: the int8 slot planes store window supers < max_sup*8 <= 120.
    lo_e = np.minimum(il, ir)
    hi_e = np.maximum(il, ir)
    if escalate and len(lo_e):
        need_ms = int(((hi_e >> 7) - ((lo_e >> 10) << 3)).max()) // 8 + 1
        if need_ms > max_sup:
            ms = min(need_ms, 15)
            _plan_debug(
                f"escalating max_sup {max_sup} -> {ms} "
                f"(mesh needs {need_ms})"
            )
            max_sup = ms

    res = build_plan_arrays(
        il, ir, cn_h, sn_h, ccoef_h,
        asnp("cell_edges", a.cell_edges),
        asnp("cell_edge_coef", a.cell_edge_coef),
        op.num_cells, Ei, max_sup=max_sup, max_sup_cd=max_sup_cd,
        muscl=muscl,
        cell_z=(
            asnp("cell_z", a.cell_z) if op.well_balancing_hr else None
        ),
        rcap=rcap, bnd=bnd, ndof=op.ndof,
        # the XQ2018 closed form is nonlinear in the divergence, so the
        # remainder path's linearized stage correction doesn't apply;
        # keep the greedy layout there (remainder-free by construction)
        layout=("legacy" if op.source_method == 1 else "auto"),
    )
    if res is None:
        return op
    plan_np, reordered, meta = res
    bnd_kinds = ()
    bnd_rem = meta.get("bnd_rem")
    bnd_kept = meta.get("bnd_kept")
    if meta.get("unified"):
        # static set of folded BC codes (shifted by +1; 0 = interior);
        # aligned plans may leave a remainder boundary subset to the XLA
        # glue — only the KEPT kinds compile into the kernel
        bt_arr = np.asarray(bnd["btype"], np.int64)
        if bnd_kept is not None:
            bt_arr = bt_arr[bnd_kept]
        bnd_kinds = tuple(sorted(set(int(b) + 1 for b in bt_arr)))

    bs_fields = {}
    bs_meta = ()
    if op.well_balancing_bs2002:
        from ..swe.bs2002 import build_bs2002_plan

        bs_res = build_bs2002_plan(
            ha, meta["order"], meta["eposL"], meta["ntiles"], op.num_cells,
            max_sup=max_sup,
        )
        if bs_res is None:
            return op
        pl_bs, bs_meta, (bvb, bve) = bs_res
        # boundary endpoint ids remapped into the plan's vertex order (the
        # XLA boundary path indexes the routed eta_v vector directly)
        bs_fields = dict(
            pl_bs=pl_bs,
            bs2002=a.bs2002._replace(
                bnd_vbeg=jnp.asarray(bvb, jnp.int32),
                bnd_vend=jnp.asarray(bve, jnp.int32),
            ),
        )

    j = lambda x, dt: jnp.asarray(x, dt)
    f32 = lambda x: jnp.asarray(x, a.int_cn.dtype)
    host2 = dict(ha)
    host2.update(reordered)
    # NOTE: keep these as plain host->device transfers. Widening on device
    # (i8 transfer + device astype) looks attractive but each tiny cast is
    # its own XLA program: a dozen remote compiles cost ~45 s on the axon
    # relay, while the extra transfer bytes cost < 0.3 s.
    arrays = a._replace(
        int_left=j(reordered["int_left"], jnp.int32),
        int_right=j(reordered["int_right"], jnp.int32),
        int_cn=f32(reordered["int_cn"]),
        int_sn=f32(reordered["int_sn"]),
        cell_edges=j(reordered["cell_edges"], jnp.int32),
        edge_courant_coef=f32(reordered["edge_courant_coef"]),
        **{
            k: j(v, plan_field_dtype(k)) for k, v in plan_np.items()
        },
        **bs_fields,
    )
    return dataclasses.replace(
        op,
        arrays=arrays,
        host_arrays=host2,
        edge_flux_backend="pallas",
        pallas_nsup=meta["nsup"],
        pallas_wq=meta["wq"],
        pallas_cd_nsup_l=meta["nsupL"],
        pallas_cd_nsup_r=meta["nsupR"],
        pallas_cd_nsup_lk=meta["nsupL_ks"],
        pallas_cd_nsup_rk=meta["nsupR_ks"],
        pallas_cd_wl=meta["wl"],
        pallas_cd_wr=meta["wr"],
        pallas_fused_meta=meta["fused"],
        pallas_step_meta=meta["step"],
        pallas_bs_meta=bs_meta,
        pallas_bnd_kinds=bnd_kinds,
        pallas_ident_l=bool(meta.get("ident_l")),
        pallas_bnd_rem=(
            np.asarray(bnd_rem, np.int64)
            if bnd_rem is not None and len(bnd_rem) else None
        ),
        pallas_bnd_sel=(
            np.asarray(bnd_kept, np.int64)
            if bnd_rem is not None and len(bnd_rem) else None
        ),
        pallas_interpret=interpret,
    )
