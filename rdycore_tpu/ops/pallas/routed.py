"""Generalized slot-routed gather for two index spaces (Pallas TPU).

The slotted edge kernels (slotted.py) exploit lane alignment between edges
and their cells. Some reference device kernels gather across *different*
index spaces -- the BS2002 eta-vertex pre-operator (SWEEtaVertex,
swe_well_balancing.h:30-85 + the vertex averaging restriction,
operator_fluxes_ceed.c:798-826) needs

    cells --(vertex adjacency)--> vertices --(edge endpoints)--> edge slots

where source lanes (src % 128) never match destination lanes. This module
provides the general (src -> dst) machinery as two host-built plans and two
kernels:

- **route**: pairs (src, dst) are packed into 8x128 L-slots at lane
  src % 128 (sublane-only window gather of the source value), then routed
  through a per-tile 16-row R-layout to lane dst % 128 with a static
  shuffle -- the same L->R color routing as slotted.py, minus the R-side
  state gather.
- **accumulate**: per destination tile, K slots sublane-gather the routed
  values (lane already == dst % 128) and reduce with static weights.

Both plans fall back to None (XLA path) when a window budget is exceeded.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .slotted import GT  # tiles per grid step (shared: the BS2002
# accumulate output feeds the edge kernel, so both paddings must agree)

TE = 1024
RROWS = 16


class RoutePlan(NamedTuple):
    ntiles: int
    nsup: int  # src window supers
    ws: np.ndarray  # [ntiles] i32 src window starts (8-row units)
    sup: np.ndarray  # [ntiles*8, 128] i32 src window row per L slot
    gi: np.ndarray  # [ntiles*16, 128] i32 route L->R row pick
    mi: np.ndarray  # [ntiles*16, 128] i32 route L->R lane shuffle
    validR: np.ndarray  # [ntiles*16, 128] f32
    eposR: np.ndarray  # [n_pairs] flat R-layout position per (sorted) pair
    order: np.ndarray  # pair sort permutation


class AccumPlan(NamedTuple):
    ntiles: int  # dst tiles (1024 dst entries each)
    nsup: int  # routed-row window supers
    K: int
    ws: np.ndarray  # [ntiles] i32
    sup: np.ndarray  # [K, ntiles*8, 128] i32
    coef: np.ndarray  # [K, ntiles*8, 128] f32


def _route_pack_py(src, dst_lane, max_sup):
    """One-pass packing + coloring with the window constraint on the source
    rows only (destinations live in a different index space)."""
    E = len(src)
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
        s = int(src[e])
        a = s & 127
        b = int(dst_lane[e])
        attempt = 0
        while True:
            fresh = not ws_list or (count == 0 and attempt > 0)
            if not ws_list:
                open_tile(s)
            freemask = ~(usedS[b] | usedD[a]) & 0xFFFF
            fits = (
                count < TE and cntL[a] < 8 and freemask
                and ((s >> 7) - ws_row) < max_sup * 8
            )
            if fits:
                slot_row[e] = cntL[a]
                cntL[a] += 1
                k = (int(freemask) & -int(freemask)).bit_length() - 1
                color[e] = k
                usedS[b] |= 1 << k
                usedD[a] |= 1 << k
                tile_of[e] = len(ws_list) - 1
                need_sup = max(need_sup, ((s >> 7) - ws_row) // 8 + 1)
                count += 1
                break
            if fresh:
                raise ValueError("source window exceeds budget")
            open_tile(s)
            attempt += 1
    return (slot_row, color, tile_of,
            np.asarray(ws_list, np.int64), need_sup)


def build_route_plan(src, dst, max_sup: int = 4) -> Optional[RoutePlan]:
    """Pack (src, dst) pairs; sorts by src for window locality."""
    E = len(src)
    if E == 0:
        return None
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    order = np.argsort(src, kind="stable")
    s = src[order]
    d = dst[order]
    laneL = s & 127
    laneR = d & 127
    try:
        slot_row, color, tile_of, ws_tile, need_sup = _route_pack_py(
            s, laneR, max_sup
        )
    except ValueError:
        return None
    ws_rows = ws_tile[tile_of]
    # pad the tile count to a GT multiple (inert tiles: validR = 0)
    ntiles = -(-len(ws_tile) // GT) * GT
    ws_tile = np.concatenate(
        [ws_tile, np.zeros(ntiles - len(ws_tile), ws_tile.dtype)]
    )

    R_l, R_r = ntiles * 8, ntiles * RROWS
    sup = np.zeros((R_l, 128), np.int32)
    gi = np.zeros((R_r, 128), np.int32)
    mi = np.zeros((R_r, 128), np.int32)
    validR = np.zeros((R_r, 128), np.float32)

    rowsL = tile_of * 8 + slot_row
    rowsR = tile_of * RROWS + color
    sup[rowsL, laneL] = (s // 128 - ws_rows).astype(np.int32)
    gi[rowsR, laneL] = slot_row
    mi[rowsR, laneR] = laneL
    validR[rowsR, laneR] = 1.0
    eposR = rowsR * 128 + laneR

    return RoutePlan(
        ntiles=ntiles, nsup=need_sup, ws=(ws_tile // 8).astype(np.int32),
        sup=sup, gi=gi, mi=mi, validR=validR, eposR=eposR, order=order,
    )


def build_accum_plan(
    dst, eposR, coef, n_dst, max_sup: int = 8
) -> Optional[AccumPlan]:
    """Accumulation plan: dst[i] += coef[i] * routed[eposR[i]] reduced per
    destination. dst/eposR/coef are in the route plan's sorted pair order."""
    from .slotted import _cumcount

    dst = np.asarray(dst, np.int64)
    rowsR = np.asarray(eposR) // 128
    Dt = max(1, -(-int(n_dst) // TE))
    Dt = -(-Dt // GT) * GT  # pad to a GT multiple (inert: coef = 0)
    dtile = dst // TE
    lo = np.full(Dt, np.iinfo(np.int64).max)
    hi = np.zeros(Dt, np.int64)
    np.minimum.at(lo, dtile, rowsR)
    np.maximum.at(hi, dtile, rowsR)
    lo = np.minimum(lo, hi)
    ws = (lo >> 3) << 3
    nsup = int((hi - ws).max()) // 8 + 1
    if nsup > max_sup:
        return None
    K = int(np.bincount(dst, minlength=n_dst).max())
    sup = np.zeros((K, Dt * 8, 128), np.int32)
    cf = np.zeros((K, Dt * 8, 128), np.float32)
    k = _cumcount(dst)
    rows_d = dst // 128
    lanes_d = dst & 127
    sup[k, rows_d, lanes_d] = (rowsR - ws[dtile]).astype(np.int32)
    cf[k, rows_d, lanes_d] = np.asarray(coef, np.float32)
    return AccumPlan(
        ntiles=Dt, nsup=nsup, K=K, ws=(ws // 8).astype(np.int32),
        sup=sup, coef=cf,
    )


# ---------------------------------------------------------------- kernels

def _route_kernel(ws_ref, sup_ref, gi_ref, mi_ref, vR_ref, *rest, nsup):
    src_all = rest[: GT * nsup]
    o_ref = rest[GT * nsup]
    for gt in range(GT):
        r8 = slice(gt * 8, gt * 8 + 8)
        rA = slice(gt * RROWS, gt * RROWS + 8)
        rB = slice(gt * RROWS + 8, gt * RROWS + 16)
        src_refs = src_all[gt * nsup : (gt + 1) * nsup]
        sup = sup_ref[r8, :]
        val = jnp.zeros((8, 128), jnp.float32)
        for s in range(nsup):
            gat = jnp.take_along_axis(
                src_refs[s][:, :], jnp.clip(sup - s * 8, 0, 7), axis=0
            )
            val = jnp.where((sup >> 3) == s, gat, val)
        gi0, gi1 = gi_ref[rA, :], gi_ref[rB, :]
        mi0, mi1 = mi_ref[rA, :], mi_ref[rB, :]
        u0 = jnp.take_along_axis(val, gi0, axis=0)
        u1 = jnp.take_along_axis(val, gi1, axis=0)
        o_ref[rA, :] = jnp.take_along_axis(u0, mi0, axis=1) * vR_ref[rA, :]
        o_ref[rB, :] = jnp.take_along_axis(u1, mi1, axis=1) * vR_ref[rB, :]


def route_gather(plan_arrays, src_rows, nsup, interpret=False):
    """src_rows: [R_src, 128] f32 source values (row-major flat space).
    Returns routed values [ntiles*16, 128]."""
    ws, sup, gi, mi, vR = plan_arrays
    ntiles = sup.shape[0] // 8
    nsteps = ntiles // GT
    src = jnp.pad(src_rows, ((0, nsup * 8 + 8), (0, 0)))
    in_specs = [
        pl.BlockSpec((GT * 8, 128), lambda t, w: (t, 0)),       # sup
        pl.BlockSpec((GT * RROWS, 128), lambda t, w: (t, 0)),   # gi
        pl.BlockSpec((GT * RROWS, 128), lambda t, w: (t, 0)),   # mi
        pl.BlockSpec((GT * RROWS, 128), lambda t, w: (t, 0)),   # validR
    ] + [
        pl.BlockSpec(
            (8, 128), lambda t, w, g=g, s=s: (w[t * GT + g] + s, 0)
        )
        for g in range(GT)
        for s in range(nsup)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((GT * RROWS, 128), lambda t, w: (t, 0)),
    )
    f = pl.pallas_call(
        functools.partial(_route_kernel, nsup=nsup),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntiles * RROWS, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )
    return f(ws, sup, gi, mi, vR, *([src] * (GT * nsup)))


def _accum_kernel(ws_ref, sup_ref, cf_ref, *rest, nsup, K):
    r_all = rest[: GT * nsup]
    o_ref = rest[GT * nsup]
    for gt in range(GT):
        r8 = slice(gt * 8, gt * 8 + 8)
        r_refs = r_all[gt * nsup : (gt + 1) * nsup]
        acc = jnp.zeros((8, 128), jnp.float32)
        for k in range(K):
            sup = sup_ref[k, r8]
            cf = cf_ref[k, r8]
            gat = jnp.zeros((8, 128), jnp.float32)
            for s in range(nsup):
                gg = jnp.take_along_axis(
                    r_refs[s][:, :], jnp.clip(sup - s * 8, 0, 7), axis=0
                )
                gat = jnp.where((sup >> 3) == s, gg, gat)
            acc = acc + gat * cf
        o_ref[r8, :] = acc


def accumulate(plan_arrays, routed, nsup, K, interpret=False):
    """routed: [R_routed, 128] f32. Returns [ntiles*8, 128] dst sums."""
    ws, sup, cf = plan_arrays
    Dt = sup.shape[1] // 8
    nsteps = Dt // GT
    routed = jnp.pad(routed, ((0, nsup * 8 + RROWS), (0, 0)))
    in_specs = [
        pl.BlockSpec((K, GT * 8, 128), lambda t, w: (0, t, 0)),
        pl.BlockSpec((K, GT * 8, 128), lambda t, w: (0, t, 0)),
    ] + [
        pl.BlockSpec(
            (8, 128), lambda t, w, g=g, s=s: (w[t * GT + g] + s, 0)
        )
        for g in range(GT)
        for s in range(nsup)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((GT * 8, 128), lambda t, w: (t, 0)),
    )
    f = pl.pallas_call(
        functools.partial(_accum_kernel, nsup=nsup, K=K),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Dt * 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )
    return f(ws, sup, cf, *([routed] * (GT * nsup)))
