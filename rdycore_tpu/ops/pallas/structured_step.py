"""Pallas TPU kernel #3: fully-fused structured SWE euler step.

The structured (raster) fast path's XLA implementation materializes flux
and divergence arrays (~10 HBM passes per step). This kernel fuses the
ENTIRE step -- Roe fluxes in x and y, divergence, bed-slope + semi-implicit
Manning friction, and the euler update -- into one pass: read 3 state
planes (+1-row halo) + 3 static planes, write 3 planes. ~70 B/cell/step.

Layout: planes padded to [ny + 2*gr, nx + 128] (gr ghost rows / 64 ghost
columns each side for (8, 128) f32 tile alignment; physically only a
1-cell ghost frame is used). Ghost frame filled per step in XLA from the
wall BCs:
  - reflecting: mirror state with the normal momentum negated (exactly the
    reference's reflecting ghost, swe_petsc.c:434-461)
  - critical outflow: the critical-depth ghost (swe_petsc.c:465-503)

Grid over 8-row tiles; neighbor access by in-VMEM rolls. Roe flux math is
the shared `ops.swe.riemann.roe_flux` -- identical numerics to the XLA twin.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import GRAVITY
from ..swe import boundary as bc_mod
from ..swe.riemann import regularized_velocity, roe_flux

GR = 8  # default ghost rows each side (= row-tile height)
GC = 64  # ghost columns each side (total 128 keeps nxp a lane multiple)
TY = 8  # default rows per kernel tile (override via make_..., ty=)


class StructuredPlan(NamedTuple):
    nx: int
    ny: int
    dx: float
    dy: float
    tiny_h: float
    h_anuga: float
    bc_left: int
    bc_right: int
    bc_bottom: int
    bc_top: int
    gr: int = GR  # ghost rows each side (= row-tile height ty)


def pad_plane(x: np.ndarray, gr: int = GR) -> np.ndarray:
    """[ny, nx] -> [ny + 2*gr, nx + 2*GC]."""
    return np.pad(np.asarray(x, np.float32), ((gr, gr), (GC, GC)))


def _ghost(bc, h, hu, hv, sn, cn, tiny_h, h_anuga, dirichlet=None):
    """Wall ghost state for a 1-D strip of boundary cells."""
    if bc == bc_mod.BC_DIRICHLET:
        # prescribed (h, hu, hv) per wall cell (swe_fluxes_ceed.h:104-156:
        # ghost = the Dirichlet state, flux = roe(interior, ghost));
        # tracer rows (if prescribed too) are handled by _ghost_hc
        d = jnp.asarray(dirichlet)
        return d[0], d[1], d[2]
    u, v = regularized_velocity(h, hu, hv, tiny_h, h_anuga)
    if bc == bc_mod.BC_REFLECTING:
        hg, ug, vg = bc_mod.reflecting_ghost(h, u, v, sn, cn)
        return hg, hg * ug, hg * vg
    if bc == bc_mod.BC_CRITICAL_OUTFLOW:
        (hl, ul, vl), (hg, ug, vg) = bc_mod.critical_outflow_ghost(
            h, u, v, sn, cn
        )
        # NOTE: critical outflow also modifies the interior-side state when
        # flow enters the domain; the ghost-frame formulation cannot express
        # that, so the fused kernel approximates it with the dry-ghost only.
        return hg, hg * ug, hg * vg
    raise ValueError(f"unsupported wall BC {bc} for the fused kernel")


def fill_ghost_frame(plan: StructuredPlan, h, hu, hv, bc_vals=None,
                     hc=None):
    """Fill the 1-cell ghost frame of padded planes from the wall BCs.

    bc_vals: optional dict side -> (h, hu, hv[, hc_1..hc_nt]) 1-D arrays of
    prescribed Dirichlet values along that wall (sides "left"/"right"
    length ny, "bottom"/"top" length nx).

    hc ([nt, nyp, nxp] tracer planes): ghost tracer mass follows the
    coupled twin's conventions (operator._apply_tracers) — reflecting and
    critical-outflow ghosts keep the interior concentration (hc_g =
    h_g * c_int), Dirichlet ghosts take the prescribed hc rows. Returns
    (h, hu, hv[, hc])."""
    nx, ny = plan.nx, plan.ny
    th, ta = plan.tiny_h, plan.h_anuga
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    r0, r1 = plan.gr, plan.gr + ny  # interior row range
    c0, c1 = GC, GC + nx
    bc_vals = bc_vals or {}

    def _ghost_hc(bc, h_int, hc_int, hg, dirichlet):
        if bc == bc_mod.BC_DIRICHLET:
            d = jnp.asarray(dirichlet)
            if d.shape[0] > 3:
                return d[3:]
            # legacy 3-row (h, hu, hv) bc_vals: tracer rows not
            # prescribed — fall back to the interior-concentration ghost
        hden = jnp.where(jnp.abs(h_int) > 0.0, h_int, 1.0)
        c_int = jnp.where(h_int > th, hc_int / hden, 0.0)
        return hg * c_int

    # left wall: outward normal (-1, 0)
    hg, hug, hvg = _ghost(
        plan.bc_left, h[r0:r1, c0], hu[r0:r1, c0], hv[r0:r1, c0],
        zero, -one, th, ta, bc_vals.get("left"),
    )
    if hc is not None:
        hc = hc.at[:, r0:r1, c0 - 1].set(_ghost_hc(
            plan.bc_left, h[r0:r1, c0], hc[:, r0:r1, c0], hg,
            bc_vals.get("left"),
        ))
    h = h.at[r0:r1, c0 - 1].set(hg)
    hu = hu.at[r0:r1, c0 - 1].set(hug)
    hv = hv.at[r0:r1, c0 - 1].set(hvg)
    # right wall: (+1, 0)
    hg, hug, hvg = _ghost(
        plan.bc_right, h[r0:r1, c1 - 1], hu[r0:r1, c1 - 1], hv[r0:r1, c1 - 1],
        zero, one, th, ta, bc_vals.get("right"),
    )
    if hc is not None:
        hc = hc.at[:, r0:r1, c1].set(_ghost_hc(
            plan.bc_right, h[r0:r1, c1 - 1], hc[:, r0:r1, c1 - 1], hg,
            bc_vals.get("right"),
        ))
    h = h.at[r0:r1, c1].set(hg)
    hu = hu.at[r0:r1, c1].set(hug)
    hv = hv.at[r0:r1, c1].set(hvg)
    # bottom wall: (0, -1)
    hg, hug, hvg = _ghost(
        plan.bc_bottom, h[r0, c0:c1], hu[r0, c0:c1], hv[r0, c0:c1],
        -one, zero, th, ta, bc_vals.get("bottom"),
    )
    if hc is not None:
        hc = hc.at[:, r0 - 1, c0:c1].set(_ghost_hc(
            plan.bc_bottom, h[r0, c0:c1], hc[:, r0, c0:c1], hg,
            bc_vals.get("bottom"),
        ))
    h = h.at[r0 - 1, c0:c1].set(hg)
    hu = hu.at[r0 - 1, c0:c1].set(hug)
    hv = hv.at[r0 - 1, c0:c1].set(hvg)
    # top wall: (0, +1)
    hg, hug, hvg = _ghost(
        plan.bc_top, h[r1 - 1, c0:c1], hu[r1 - 1, c0:c1], hv[r1 - 1, c0:c1],
        one, zero, th, ta, bc_vals.get("top"),
    )
    if hc is not None:
        hc = hc.at[:, r1, c0:c1].set(_ghost_hc(
            plan.bc_top, h[r1 - 1, c0:c1], hc[:, r1 - 1, c0:c1], hg,
            bc_vals.get("top"),
        ))
    h = h.at[r1, c0:c1].set(hg)
    hu = hu.at[r1, c0:c1].set(hug)
    hv = hv.at[r1, c0:c1].set(hvg)
    if hc is not None:
        return h, hu, hv, hc
    return h, hu, hv


def _kernel(dt_ref, h_hbm, hu_hbm, hv_hbm, dzx_hbm, dzy_hbm, mann_hbm,
            *rest,
            nxp, ty, gr, tiny_h, h_anuga, inv_dx, inv_dy,
            with_src=False, emit_rhs=False, nt=0, num_sediment=0,
            sed_params=None, upwind=False,
            second_order=False, limiter="minmod", positivity=True,
            ny=None):
    if with_src:
        src_hbm = rest[0]
        rest = rest[1:]
    if nt:
        hc_hbm = rest[0]  # [nt, nyp, nxp] tracer planes, stacked
        rest = rest[1:]
    ho_ref, huo_ref, hvo_ref, cmax_ref = rest[:4]
    rest = rest[4:]
    if nt:
        hco_ref = rest[0]  # [nt, ty, nxp] output block
        rest = rest[1:]
    hw, huw, hvw, dzxw, dzyw, mw = rest[:6]
    rest = rest[6:]
    if with_src:
        srcw = rest[0]
        rest = rest[1:]
    if nt:
        hcw = rest[0]  # [2, nt, ty+16, nxp] tracer window
        rest = rest[1:]
    sem_state, sem_geom = rest

    t = pl.program_id(0)
    ntiles = pl.num_programs(0)

    # Double-buffered prefetch: at tile t, start tile t+1's window DMAs into
    # the other slot, so the copies overlap with tile t's flux compute.
    def _state_dma(slot, tt):
        # window rows [tt*ty + gr - 8, +ty+16): 8-row halo blocks around it
        rr = pl.multiple_of(tt * ty + (gr - 8), 8)
        copies = [
            pltpu.make_async_copy(
                src.at[pl.ds(rr, ty + 16), :], dst.at[slot],
                sem_state.at[slot],
            )
            for src, dst in ((h_hbm, hw), (hu_hbm, huw), (hv_hbm, hvw))
        ]
        if nt:
            copies.append(pltpu.make_async_copy(
                hc_hbm.at[:, pl.ds(rr, ty + 16), :], hcw.at[slot],
                sem_state.at[slot],
            ))
        return copies

    def _geom_dma(slot, tt):
        pairs = [(dzx_hbm, dzxw), (dzy_hbm, dzyw), (mann_hbm, mw)]
        if with_src:
            pairs.append((src_hbm, srcw))
        return [
            pltpu.make_async_copy(
                src.at[pl.ds(tt * ty + gr, ty), :], dst.at[slot],
                sem_geom.at[slot],
            )
            for src, dst in pairs
        ]

    slot = jax.lax.rem(t, jnp.int32(2))
    nslot = jax.lax.rem(t + jnp.int32(1), jnp.int32(2))

    @pl.when(t == 0)
    def _():
        for d in _state_dma(0, 0) + _geom_dma(0, 0):
            d.start()

    @pl.when(t + 1 < ntiles)
    def _():
        for d in _state_dma(nslot, t + 1) + _geom_dma(nslot, t + 1):
            d.start()

    for d in _state_dma(slot, t):
        d.wait()

    dt = dt_ref[0]
    # dt_ref[1] (present on the sharded stepper) = the strip's GLOBAL
    # first-row offset, so the MUSCL/positivity masks below see global
    # rows; dt_ref[2] = number of FILLED halo rows below/above the strip
    # (2*gr-frame walls see -1; interior strips exchange 3 rows)
    if dt_ref.shape[0] > 1:
        row0 = dt_ref[1].astype(jnp.int32)
        halo_lo = dt_ref[2].astype(jnp.int32)
        halo_hi = dt_ref[3].astype(jnp.int32)
    else:
        row0 = jnp.int32(0)
        halo_lo = halo_hi = jnp.int32(1)
    g = jnp.float32(GRAVITY)

    # Flux compute restricted to the rows actually consumed: the window
    # carries 8 halo rows each side (DMA row alignment), but only 1 is
    # physical. Interior rows are window rows [8, 8+ty); fluxes need state
    # rows [7, 9+ty) only -- computing Roe on the full window would double
    # the VPU work (sqrt/divide-heavy) at ty=16.
    hs = hw[slot, 7:9 + ty, :]
    hus = huw[slot, 7:9 + ty, :]
    hvs = hvw[slot, 7:9 + ty, :]
    us, vs = regularized_velocity(hs, hus, hvs, tiny_h, h_anuga)
    # one sqrt per cell feeds all four of its faces (the Roe average needs
    # sqrt(h) on both sides of every face; computing it per (face, side)
    # would cost 4x the transcendental work)
    sqs = jnp.sqrt(jnp.maximum(hs, 0.0))
    if nt:
        # concentrations per cell (safe_div twin: guarded by wet depth)
        hcs = hcw[slot, :, 7:9 + ty, :]
        hden = jnp.where(jnp.abs(hs) > 0.0, hs, 1.0)
        cts = jnp.where(hs > tiny_h, hcs / hden, 0.0)  # [nt, rows, nxp]

    def eshift(x):
        # x[..., c] -> x[..., c+1] (lane roll)
        return pltpu.roll(x, x.shape[-1] - 1, x.ndim - 1)

    def wshift(x):
        # x[..., c] -> x[..., c-1]
        return pltpu.roll(x, 1, x.ndim - 1)

    ci = slice(1, 1 + ty)  # interior rows within the [7, 9+ty) slice

    if not second_order:
        # ---- first-order face states ------------------------------------
        # east-face fluxes on interior rows (normal +x): roe(q[c], q[c+1])
        hc_f, uc_f, vc_f = hs[ci], us[ci], vs[ci]
        hE, uE, vE = (eshift(x)[ci] for x in (hs, us, vs))
        tx = dict(cil=cts[:, ci], cir=eshift(cts)[:, ci], upwind=upwind) \
            if nt else {}
        fx_all = roe_flux(
            hc_f, uc_f, vc_f, hE, uE, vE, 0.0, 1.0,
            sqrt_hl=sqs[ci], sqrt_hr=eshift(sqs)[ci], fast=True, **tx,
        )
        fxh, fxhu, fxhv, ax = fx_all[:4]
        if nt:
            # the coupled-system twin keeps either-wet fluxes with strict >
            # (operator._apply tracer mask); the pure-flow kernel's
            # both-dry zeroing is the complement up to h == tiny_h exactly
            mx = jnp.where((hc_f > tiny_h) | (hE > tiny_h), 1.0, 0.0)
        else:
            mx = jnp.where((hc_f < tiny_h) & (hE < tiny_h), 0.0, 1.0)
        fxh, fxhu, fxhv, ax = fxh * mx, fxhu * mx, fxhv * mx, ax * mx
        if nt:
            fxc = fx_all[4] * mx

        # north-face fluxes on rows [7, 8+ty) (normal +y): roe(q[r],
        # q[r+1]); local fy row i = north face of window row 7+i, so rows
        # 0..ty cover the south face of the first interior row through the
        # top-wall face
        cs = slice(0, 1 + ty)
        cn_ = slice(1, 2 + ty)
        ty_ = dict(cil=cts[:, cs], cir=cts[:, cn_], upwind=upwind) \
            if nt else {}
        fy_all = roe_flux(
            hs[cs], us[cs], vs[cs], hs[cn_], us[cn_], vs[cn_], 1.0, 0.0,
            sqrt_hl=sqs[cs], sqrt_hr=sqs[cn_], fast=True, **ty_,
        )
        fyh, fyhu, fyhv, ay = fy_all[:4]
        if nt:
            my = jnp.where(
                (hs[cs] > tiny_h) | (hs[cn_] > tiny_h), 1.0, 0.0
            )
        else:
            my = jnp.where(
                (hs[cs] < tiny_h) & (hs[cn_] < tiny_h), 0.0, 1.0
            )
        fyh, fyhu, fyhv, ay = fyh * my, fyhu * my, fyhv * my, ay * my
        if nt:
            fyc = fy_all[4] * my
    else:
        # ---- MUSCL second-order face states (round 4) --------------------
        # Twin: ops/swe/muscl.py reconstruct_interior_states — per-cell
        # weighted-LS gradients (on a uniform raster: masked central /
        # one-sided differences with the SAME coefficients the LS algebra
        # produces), limited linear extrapolation to face midpoints, h
        # clamped >= 0. Wall faces stay FIRST-order (they are boundary
        # edges in the twin: ghost states on the raw q), which the masks
        # below reproduce by zeroing wall-face extrapolations. The
        # positivity pass (Audusse donor-cell scaling,
        # operator._apply_positivity_limit) runs in-kernel over the tile:
        # the widened slabs below cover every donor's four faces.
        # global row of the tile's first interior row (t*ty local + the
        # strip offset; 0 on the single-device stepper)
        t_row0 = t * ty + row0
        # q slab rows [5, 11+ty) -> gradients rows [6, 10+ty) -> faces:
        #   x-faces rows [7, 9+ty), y-faces between rows [6, 9+ty)
        g0 = slice(1, 5 + ty)  # gradient rows within the q slab
        # The slab spans global rows [t_row0 - 3, t_row0 + ty + 3); rows
        # outside the 1-cell ghost frame ([-1, ny]) are UNWRITTEN pallas
        # pad rows from step 2 on. The zero cyS/cyN/v_face coefficients
        # alone don't neutralize them (0 * NaN = NaN feeds the minmod
        # where-chain), so zero the out-of-frame rows before differencing.
        srow = (
            jax.lax.broadcasted_iota(jnp.int32, (6 + ty, nxp), 0)
            + (t_row0 - 3)
        )
        # valid rows: within the global domain's ghost frame AND within
        # the strip's FILLED rows (row0 - halo_lo .. row0 + nyl + halo_hi
        # - 1); on a single device both bounds reduce to [-1, ny]
        nyl_rows = pl.num_programs(0) * ty
        lo_row = jnp.maximum(row0 - halo_lo, -1)
        hi_row = jnp.minimum(row0 + nyl_rows - 1 + halo_hi, ny)
        in_slab = (srow >= lo_row) & (srow <= hi_row)
        q3 = [jnp.where(in_slab, qq[slot, 5:11 + ty, :], 0.0)
              for qq in (hw, huw, hvw)]
        nx_ = nxp - 2 * GC
        col = jax.lax.broadcasted_iota(jnp.int32, (4 + ty, nxp), 1)
        in_x = (col >= GC) & (col < GC + nx_)
        has_E = in_x & (col < GC + nx_ - 1)
        has_W = in_x & (col > GC)
        half = jnp.float32(0.5)
        cxE = jnp.where(
            has_E, jnp.where(has_W, half * inv_dx, inv_dx), 0.0
        )
        cxW = jnp.where(
            has_W, jnp.where(has_E, half * inv_dx, inv_dx), 0.0
        )
        grow = (
            jax.lax.broadcasted_iota(jnp.int32, (4 + ty, nxp), 0)
            + (t_row0 - 2)
        )  # global row of each gradient row
        in_y = (grow >= 0) & (grow < ny)
        has_N = in_y & (grow < ny - 1)
        has_S = in_y & (grow > 0)
        cyN = jnp.where(
            has_N, jnp.where(has_S, half * inv_dy, inv_dy), 0.0
        )
        cyS = jnp.where(
            has_S, jnp.where(has_N, half * inv_dy, inv_dy), 0.0
        )
        gx = []
        gy = []
        for qq in q3:
            qg = qq[g0]
            dqE = eshift(qg) - qg
            dqW = qg - wshift(qg)
            gx.append(cxE * dqE + cxW * dqW)
            dqN = qq[2:6 + ty] - qg
            dqS = qg - qq[0:4 + ty]
            gy.append(cyN * dqN + cyS * dqS)

        def _lim(extrap, half_dq):
            if limiter == "none":
                return extrap
            prod = extrap * half_dq
            if limiter == "van_leer":
                ssum = extrap + half_dq
                s_safe = jnp.where(ssum != 0.0, ssum, 1.0)
                return jnp.where(prod > 0.0, 2.0 * prod / s_safe, 0.0)
            return jnp.where(
                prod <= 0.0, 0.0,
                jnp.where(
                    jnp.abs(extrap) < jnp.abs(half_dq), extrap, half_dq
                ),
            )

        # x-faces between (c, c+1) on gradient rows [1, 3+ty) (= window
        # rows [7, 9+ty)); reconstruction only where BOTH cells are
        # interior (has_E of the left cell).
        # MOSAIC CONSTRAINT (round 5): iota-derived masks must be built
        # at their consumption shape with fresh iotas — SLICING a mask
        # array (has_E[fxr].astype) crashes the TPU lowering
        # (array.h:480 "limits[i] <= dim(i)"; bisected on-chip, the
        # sliced lane/row-invariant mask keeps a dim-1 internal
        # representation that later window math trips over).
        fxr = slice(1, 3 + ty)
        hdx = jnp.float32(0.5) / jnp.float32(inv_dx)
        colf = jax.lax.broadcasted_iota(jnp.int32, (2 + ty, nxp), 1)
        vfx = (
            (colf >= GC) & (colf < GC + nx_ - 1)
        ).astype(jnp.float32)
        qLx, qRx = [], []
        for m, qq in enumerate(q3):
            qc_ = qq[g0][fxr]
            qe_ = eshift(qq[g0])[fxr]
            dq = qe_ - qc_
            eL = gx[m][fxr] * hdx * vfx
            eR = -eshift(gx[m])[fxr] * hdx * vfx
            qLx.append(qc_ + _lim(eL, 0.5 * dq))
            qRx.append(qe_ + _lim(eR, -0.5 * dq))
        hLx = jnp.maximum(0.0, qLx[0])
        hRx = jnp.maximum(0.0, qRx[0])
        uLx, vLx = regularized_velocity(hLx, qLx[1], qLx[2], tiny_h,
                                        h_anuga)
        uRx, vRx = regularized_velocity(hRx, qRx[1], qRx[2], tiny_h,
                                        h_anuga)
        fxh, fxhu, fxhv, ax = roe_flux(
            hLx, uLx, vLx, hRx, uRx, vRx, 0.0, 1.0, fast=True,
        )
        mx = jnp.where((hLx < tiny_h) & (hRx < tiny_h), 0.0, 1.0)
        fxh, fxhu, fxhv, ax = fxh * mx, fxhu * mx, fxhv * mx, ax * mx

        # y-faces between rows (w, w+1) for gradient rows w in [0, 3+ty);
        # face mask at consumption shape (fresh iota — see the Mosaic
        # constraint above): has_N[fys] == (grow >= 0) & (grow < ny - 1)
        hdy = jnp.float32(0.5) / jnp.float32(inv_dy)
        fys = slice(0, 3 + ty)
        fyn = slice(1, 4 + ty)
        growf = (
            jax.lax.broadcasted_iota(jnp.int32, (3 + ty, nxp), 0)
            + (t_row0 - 2)
        )
        vfy = ((growf >= 0) & (growf < ny - 1)).astype(jnp.float32)
        qLy, qRy = [], []
        for m, qq in enumerate(q3):
            qs_ = qq[g0][fys]
            qn_ = qq[g0][fyn]
            dq = qn_ - qs_
            eL = gy[m][fys] * hdy * vfy
            eR = -gy[m][fyn] * hdy * vfy
            qLy.append(qs_ + _lim(eL, 0.5 * dq))
            qRy.append(qn_ + _lim(eR, -0.5 * dq))
        hLy = jnp.maximum(0.0, qLy[0])
        hRy = jnp.maximum(0.0, qRy[0])
        uLy, vLy = regularized_velocity(hLy, qLy[1], qLy[2], tiny_h,
                                        h_anuga)
        uRy, vRy = regularized_velocity(hRy, qRy[1], qRy[2], tiny_h,
                                        h_anuga)
        fyh, fyhu, fyhv, ay = roe_flux(
            hLy, uLy, vLy, hRy, uRy, vRy, 1.0, 0.0, fast=True,
        )
        my = jnp.where((hLy < tiny_h) & (hRy < tiny_h), 0.0, 1.0)
        fyh, fyhu, fyhv, ay = fyh * my, fyhu * my, fyhv * my, ay * my

        if positivity:
            # Audusse donor-cell scaling (operator._apply_positivity_limit
            # twin): drain_c = sum of outgoing h-fluxes / cell size; every
            # component of a face's flux scales by the donor's
            # s = clip(h / (dt * drain), 0, 1); ghost donors keep s = 1
            # (the twin leaves inflowing boundary fluxes unscaled)
            relu = lambda x: jnp.maximum(x, 0.0)
            # cells on gradient rows [1, 3+ty): x-fluxes fxh rows align;
            # y-faces: S face of cell row w is fy row w-1, N face fy row w
            drain = (
                relu(fxh) + relu(-wshift(fxh))
            ) * inv_dx + (
                relu(fyh[1:3 + ty]) + relu(-fyh[0:2 + ty])
            ) * inv_dy
            h_cells = q3[0][g0][fxr]
            dsafe = jnp.where(drain > 0.0, drain, 1.0)
            # dt == 0 tail steps must stay NaN-free (the interval loop
            # freezes the state algebraically via dt * rhs == 0)
            dt_s = jnp.where(dt > 0.0, dt, 1.0)
            s_pos = jnp.where(
                drain > 0.0,
                jnp.clip(h_cells / (dt_s * dsafe), 0.0, 1.0),
                1.0,
            )
            # in-domain cell mask at consumption shape (fresh iotas —
            # slicing in_x/in_y trips the Mosaic lowering, see the
            # constraint note at the x-face masks)
            colc = jax.lax.broadcasted_iota(
                jnp.int32, (2 + ty, nxp), 1
            )
            growc = (
                jax.lax.broadcasted_iota(jnp.int32, (2 + ty, nxp), 0)
                + (t_row0 - 1)
            )
            in_cell = (
                (colc >= GC) & (colc < GC + nx_)
                & (growc >= 0) & (growc < ny)
            )
            s_pos = jnp.where(in_cell, s_pos, 1.0)
        else:
            s_pos = None

        # restrict to the divergence rows FIRST (x rows [8, 8+ty) = fx
        # rows [1, 1+ty); y faces [7, 8+ty] = fy rows [1, 2+ty)), then
        # apply the donor scaling with aligned s_pos slices — the donors
        # of every divergence face lie within s_pos's row coverage, so no
        # row padding is needed (Mosaic rejects single-row concats)
        fxh, fxhu, fxhv = fxh[1:1 + ty], fxhu[1:1 + ty], fxhv[1:1 + ty]
        ax = ax[1:1 + ty]
        fyh, fyhu, fyhv = (
            fyh[1:2 + ty], fyhu[1:2 + ty], fyhv[1:2 + ty]
        )
        ay = ay[1:2 + ty]
        if positivity:
            # x faces on gradient rows [2, 2+ty) = s_pos rows [1, 1+ty);
            # donor = left cell when fx > 0 else the east neighbor
            s_row = s_pos[1:1 + ty]
            s_x = jnp.where(fxh > 0.0, s_row, eshift(s_row))
            fxh, fxhu, fxhv = fxh * s_x, fxhu * s_x, fxhv * s_x
            # y faces i in [1, 2+ty): donors gradient rows i (s_pos[i-1])
            # and i+1 (s_pos[i])
            s_y = jnp.where(
                fyh > 0.0, s_pos[0:1 + ty], s_pos[1:2 + ty]
            )
            fyh, fyhu, fyhv = fyh * s_y, fyhu * s_y, fyhv * s_y

    def div(fx, fy):
        dwx = (fx - pltpu.roll(fx, 1, fx.ndim - 1)) * inv_dx  # east - west
        # north - south along the row axis
        dwy = (
            fy[..., 1:, :] - fy[..., :-1, :]
        ) * inv_dy
        return -(dwx + dwy)

    dh = div(fxh, fyh)
    dhu = div(fxhu, fyhu)
    dhv = div(fxhv, fyhv)
    if nt:
        dhc = div(fxc, fyc)  # [nt, ty, nxp]
    hc = hs[ci]  # raw interior depths feed the source terms below

    for d in _geom_dma(slot, t):
        d.wait()

    # semi-implicit sources on the interior rows
    huc = hus[ci]
    hvc = hvs[ci]
    bedx = dzxw[slot] * g * hc
    bedy = dzyw[slot] * g * hc
    wet = hc >= tiny_h
    h_safe = jnp.where(wet, hc, 1.0)
    inv_h = 1.0 / h_safe
    uu = huc * inv_h
    vv = hvc * inv_h
    mann = mw[slot]
    cd = g * mann * mann * jnp.power(h_safe, -1.0 / 3.0)
    speed = jnp.sqrt(uu * uu + vv * vv)
    tb = cd * speed * inv_h
    factor = tb / (1.0 + dt * tb)
    tbx = jnp.where(wet, (huc + dt * dhu - dt * bedx) * factor, 0.0)
    tby = jnp.where(wet, (hvc + dt * dhv - dt * bedy) * factor, 0.0)

    rh = dh + (srcw[slot] if with_src else 0.0)
    rhu = dhu - bedx - tbx
    rhv = dhv - bedy - tby

    if nt:
        # erosion/deposition sources for the sediment classes
        # (ops/tracer/sources.py twin; Hairsine-Rose,
        # tracer_sources_ceed.h:37-160); salinity/heat advect passively.
        # The coupled twin's wet condition is strict (h > tiny_h).
        hcc = hcw[slot, :, 8:8 + ty, :]  # [nt, ty, nxp] interior rows
        wet_t = hc > tiny_h
        cc = jnp.where(wet_t, hcc / jnp.where(wet_t, hc, 1.0), 0.0)
        rhc = dhc
        if num_sediment:
            kp, ws, tau_ce, tau_cd, rhow = sed_params
            tau_b = 0.5 * jnp.float32(rhow) * cd * (uu * uu + vv * vv)
            e = jnp.float32(kp) * (
                tau_b - jnp.float32(tau_ce)
            ) / jnp.float32(tau_ce)
            d = jnp.float32(ws) * cc * (
                1.0 - tau_b / jnp.float32(tau_cd)
            )
            ed = jnp.where(wet_t, e[None] - d, 0.0)
            if num_sediment < nt:
                smask = (
                    jax.lax.broadcasted_iota(jnp.int32, (nt, 1, 1), 0)
                    < num_sediment
                ).astype(jnp.float32)
                ed = ed * smask
            rhc = rhc + ed

    if emit_rhs:
        # rhs mode (multi-stage integrators compose stages in XLA); the
        # friction factor above still uses the true dt (semi-implicit)
        ho_ref[:] = rh
        huo_ref[:] = rhu
        hvo_ref[:] = rhv
        if nt:
            hco_ref[:] = rhc
    else:
        ho_ref[:] = hc + dt * rh
        huo_ref[:] = huc + dt * rhu
        hvo_ref[:] = hvc + dt * rhv
        if nt:
            hco_ref[:] = hcc + dt * rhc

    # Courant over physical faces only:
    # - x-faces: columns GC-1 .. GC+nx-1 (left wall .. right wall); ax rows
    #   are exactly the interior rows
    # - y-faces: ay rows 0..ty span the south wall face of the first
    #   interior row through the tile's top face, columns GC .. GC+nx
    cols = jax.lax.broadcasted_iota(jnp.int32, (ty, nxp), 1)
    colsy = jax.lax.broadcasted_iota(jnp.int32, (ty + 1, nxp), 1)
    x_face = (cols >= GC - 1) & (cols < GC - 1 + (nxp - 2 * GC) + 1)
    y_face = (colsy >= GC) & (colsy < nxp - GC)
    cm = jnp.maximum(
        jnp.where(x_face, ax * inv_dx, 0.0).max(),
        jnp.where(y_face, ay * inv_dy, 0.0).max(),
    )
    cmax_ref[0, :] = jnp.full((128,), cm, jnp.float32)


def make_fused_structured_stepper(plan: StructuredPlan, dzdx, dzdy, mannings,
                                  scheme: str = "euler",
                                  with_src: bool = False,
                                  accumulate: bool = False,
                                  bflux_fn=None,
                                  num_tracers: int = 0,
                                  num_sediment: int = 0,
                                  sed_params=None,
                                  riemann: str = "roe",
                                  second_order: bool = False,
                                  limiter: str = "minmod",
                                  positivity: bool = True,
                                  lin_op=None):
    """Returns advance(h, hu, hv [padded planes], t0, dt, n_steps, t_end,
    [dzx, dzy, mann, src, bc_vals]) -> (h, hu, hv, t, cmax). Planes stay
    padded (gr = plan.gr rows) across steps; larger gr (= taller row tiles)
    cuts the halo read amplification.

    scheme: euler | ssprk2 | ssprk3 (Shu-Osher convex combinations of fused
    euler substeps) | rk4 (classic RK from rhs-mode kernel calls).
    with_src=True threads an external water-source plane (rainfall, m/s)
    through the kernel as a 4th geometry DMA. bc_vals: Dirichlet wall
    values dict for fill_ghost_frame.

    accumulate=True adds dt-weighted output accounting to the interval
    carry (the TSMonitor accumulators of xdmf_output.c:179-241 /
    time_series.c:464-506): the advance returns four extra values
    (bfa [3, Eb], asol [3, ny*nx], aprim [3, ny*nx], atime). bflux_fn
    (q_flat [3, ny*nx], bv_edges) -> [3, Eb] supplies the per-boundary-edge
    Roe fluxes (the simulation passes the unstructured twin's
    SWEOperator.boundary_fluxes); advance then takes bv_edges as a
    keyword arg.

    num_tracers > 0 (round 4, VERDICT r3 #5): advance() threads one extra
    [nt, nyp, nxp] stacked tracer-mass plane (hc) through the kernel —
    tracer fluxes share the flow Roe eigensystem in-kernel (Roe advected
    waves, or upwind-Roe with riemann='upwind_roe';
    tracer_fluxes_ceed.h:80-206) and the sediment classes get Hairsine-
    Rose erosion/deposition sources (sed_params: ops/tracer/sources.py
    SedimentParams)."""
    nt = int(num_tracers)
    if nt and sed_params is None:
        from ..tracer.sources import SedimentParams

        sed_params = SedimentParams()
    if second_order and nt:
        raise ValueError(
            "fused raster MUSCL is flow-only (the twin rejects "
            "second_order + tracers too)"
        )
    nx, ny = plan.nx, plan.ny
    ty = plan.gr
    if ty < 8 or ty % 8:
        raise ValueError("plan.gr must be a multiple of 8 (row-tile height)")
    if nx % 128 or ny % ty:
        raise ValueError("fused structured kernel needs nx % 128 == 0 and ny % gr == 0")
    if scheme not in ("euler", "ssprk2", "ssprk3", "rk4", "beuler"):
        raise ValueError(f"fused_structured: unsupported scheme '{scheme}'")
    if scheme == "beuler":
        # backward Euler: kernel residuals (rhs mode) + Newton-GMRES with
        # JVPs through the differentiable XLA structured twin — the same
        # custom-linearization recipe that unfenced the pallas backend
        # (timestepping._beuler_step; reference TSBEULER + SNES,
        # rdysetup.c:1183-1196)
        if lin_op is None:
            raise ValueError(
                "scheme 'beuler' needs lin_op (the XLA StructuredSWEOperator"
                " twin for Newton-GMRES JVPs)"
            )
        if nt:
            raise ValueError("fused raster beuler is flow-only")
    nxp = nx + 2 * GC
    ntiles = ny // ty

    # None => caller passes padded geometry planes to advance() at run time
    dzx_p = None if dzdx is None else jnp.asarray(pad_plane(dzdx, ty))
    dzy_p = None if dzdy is None else jnp.asarray(pad_plane(dzdy, ty))
    mann_p = None if mannings is None else jnp.asarray(pad_plane(mannings, ty))

    def build_call(emit_rhs):
        kernel = functools.partial(
            _kernel, nxp=nxp, ty=ty, gr=ty,
            tiny_h=float(plan.tiny_h), h_anuga=float(plan.h_anuga),
            inv_dx=float(1.0 / plan.dx), inv_dy=float(1.0 / plan.dy),
            with_src=with_src, emit_rhs=emit_rhs,
            nt=nt, num_sediment=int(num_sediment),
            sed_params=tuple(sed_params) if nt else None,
            upwind=riemann == "upwind_roe",
            second_order=bool(second_order), limiter=limiter,
            positivity=bool(positivity), ny=ny,
        )
        nyp = ny + 2 * ty
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # dt (as a f32 array of length 1)
            grid=(ntiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
            * ((7 if with_src else 6) + (1 if nt else 0)),
            out_specs=[
                pl.BlockSpec((ty, nxp), lambda t, d: (t + 1, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ty, nxp), lambda t, d: (t + 1, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ty, nxp), lambda t, d: (t + 1, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128), lambda t, d: (0, t), memory_space=pltpu.VMEM),
            ] + ([
                pl.BlockSpec((nt, ty, nxp), lambda t, d: (0, t + 1, 0),
                             memory_space=pltpu.VMEM),
            ] if nt else []),
            scratch_shapes=[
                pltpu.VMEM((2, ty + 16, nxp), jnp.float32),
                pltpu.VMEM((2, ty + 16, nxp), jnp.float32),
                pltpu.VMEM((2, ty + 16, nxp), jnp.float32),
                pltpu.VMEM((2, ty, nxp), jnp.float32),
                pltpu.VMEM((2, ty, nxp), jnp.float32),
                pltpu.VMEM((2, ty, nxp), jnp.float32),
            ] + ([pltpu.VMEM((2, ty, nxp), jnp.float32)] if with_src else [])
            + ([pltpu.VMEM((2, nt, ty + 16, nxp), jnp.float32)]
               if nt else [])
            + [
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out_shape = [
            jax.ShapeDtypeStruct((nyp, nxp), jnp.float32),
            jax.ShapeDtypeStruct((nyp, nxp), jnp.float32),
            jax.ShapeDtypeStruct((nyp, nxp), jnp.float32),
            jax.ShapeDtypeStruct((1, ntiles * 128), jnp.float32),
        ] + (
            [jax.ShapeDtypeStruct((nt, nyp, nxp), jnp.float32)]
            if nt else []
        )
        return kernel, grid_spec, out_shape

    kern_upd = build_call(emit_rhs=False)
    kern_rhs = (
        build_call(emit_rhs=True) if scheme in ("rk4", "beuler") else None
    )

    def one_step(h, hu, hv, hc, dt_arr, dzx, dzy, mann, src, bc_vals,
                 interpret=False, emit_rhs=False):
        if nt:
            h, hu, hv, hc = fill_ghost_frame(plan, h, hu, hv, bc_vals, hc)
        else:
            h, hu, hv = fill_ghost_frame(plan, h, hu, hv, bc_vals)
        kernel, grid_spec, out_shape = kern_rhs if emit_rhs else kern_upd
        args = (dt_arr, h, hu, hv, dzx, dzy, mann)
        if with_src:
            args = args + (src,)
        if nt:
            args = args + (hc,)
        # raise Mosaic's scoped-VMEM cap (default 16MB) toward the chip's
        # physical VMEM: wide meshes (nx >= 8192 -> 8448-col blocks) need
        # ~20-32MB of stack for the flux temporaries at ty=8..16
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(*args)
        ho, huo, hvo, cm = out[:4]
        hco = out[4] if nt else None
        # the kernel writes the interior row blocks of full padded planes;
        # the ghost frame (unwritten garbage) is refreshed at the start of
        # the next step, so the outputs ARE the new state -- no re-splice
        return ho, huo, hvo, hco, cm.max()

    r0a, r1a = ty, ty + ny
    c0a, c1a = GC, GC + nx

    def _interior_flat(hh, huu, hvv):
        return jnp.stack([
            p[r0a:r1a, c0a:c1a].reshape(-1) for p in (hh, huu, hvv)
        ])

    def advance(h, hu, hv, t0, dt, n_steps, t_end,
                dzx=None, dzy=None, mann=None, src=None, bc_vals=None,
                bv_edges=None, hc=None, interpret=False):
        # geometry planes default to the factory-captured constants; VERY
        # large meshes should pass them as runtime args instead (constants
        # are inlined into the compiled program -- a 184M-cell mesh bakes
        # ~2.3 GB of MLIR, which remote-compile services may reject)
        dzx = dzx_p if dzx is None else dzx
        dzy = dzy_p if dzy is None else dzy
        mann = mann_p if mann is None else mann
        if nt and hc is None:
            raise ValueError("num_tracers > 0 needs an hc plane stack")

        # the state is a (h, hu, hv[, hc]) tuple; the scheme combinators
        # apply the same convex combinations / RK weights to every member
        st0 = (h, hu, hv) + ((hc,) if nt else ())

        def E(st, dt_arr, emit_rhs=False):
            hh, huu, hvv = st[:3]
            out = one_step(
                hh, huu, hvv, st[3] if nt else None, dt_arr, dzx, dzy,
                mann, src, bc_vals, interpret=interpret,
                emit_rhs=emit_rhs,
            )
            stn = out[:3] + ((out[3],) if nt else ())
            return stn, out[4]

        def lin(a, sa, b, sb):
            return tuple(a_i * sa + b_i * sb for a_i, b_i in zip(a, b))

        def body(i, carry):
            if accumulate:
                st, tt, cmax, bfa, asol, aprim, atime = carry
            else:
                st, tt, cmax = carry
            dt_i = jnp.maximum(jnp.minimum(dt, t_end - tt), 0.0)
            dt_arr = jnp.reshape(dt_i.astype(jnp.float32), (1,))
            if accumulate:
                # dt-weighted accounting of the PRE-STEP state, matching
                # the unstructured interval advancer (timestepping.py);
                # tracer rows accumulate hc and the concentration
                # primitive (ops/tracer/sources.py prim convention)
                q_flat = _interior_flat(*st[:3])
                th_f = jnp.float32(plan.tiny_h)
                u, v = regularized_velocity(
                    q_flat[0], q_flat[1], q_flat[2],
                    th_f, jnp.float32(plan.h_anuga),
                )
                prim_rows = [q_flat[0], u, v]
                if nt:
                    hc_flat = jnp.stack([
                        st[3][j, r0a:r1a, c0a:c1a].reshape(-1)
                        for j in range(nt)
                    ])
                    q_flat = jnp.concatenate([q_flat, hc_flat])
                    wet_t = q_flat[0] > th_f
                    h_safe = jnp.where(wet_t, q_flat[0], 1.0)
                    prim_rows += [
                        jnp.where(wet_t, hc_flat[j] / h_safe, 0.0)
                        for j in range(nt)
                    ]
                asol = (asol + dt_i * q_flat).astype(jnp.float32)
                aprim = (
                    aprim + dt_i * jnp.stack(prim_rows)
                ).astype(jnp.float32)
                atime = (atime + dt_i).astype(jnp.float32)
                if bflux_fn is not None:
                    # the twin operator may compute in f64 on CPU (x64);
                    # the carry stays f32. boundary_fluxes is flow-only —
                    # tracer rows of the accumulator stay zero
                    fb = bflux_fn(q_flat[:3], bv_edges)
                    bfa = bfa.at[: fb.shape[0]].add(
                        dt_i * fb.astype(jnp.float32)
                    )
            if scheme == "euler":
                stn, cm = E(st, dt_arr)
            elif scheme == "ssprk2":
                # Shu-Osher: u1 = E(u); u' = (u + E(u1)) / 2
                st1, cm = E(st, dt_arr)
                st2, _ = E(st1, dt_arr)
                stn = lin(st, 0.5, st2, 0.5)
            elif scheme == "ssprk3":
                st1, cm = E(st, dt_arr)
                st2, _ = E(st1, dt_arr)
                st2 = lin(st, 0.75, st2, 0.25)
                st3, _ = E(st2, dt_arr)
                third = jnp.float32(1.0 / 3.0)
                stn = lin(st, third, st3, 1.0 - third)
            elif scheme == "beuler":
                # backward Euler: R(u) = u - u^n - dt*F(u) driven to zero
                # by Newton-GMRES; residual F evaluates through the fused
                # kernel's rhs mode, JVPs through the XLA structured twin
                # (inexact Newton — lin_op's Dirichlet ghosts use zero
                # values, which only perturbs the JACOBIAN on wall edges,
                # never the residual)
                from ...timestepping import newton_beuler_solve

                nyp_t = ny + 2 * ty

                def to_planes(qf):
                    q3 = qf.reshape(3, ny, nx)
                    return tuple(
                        jnp.zeros((nyp_t, nxp), jnp.float32)
                        .at[ty:ty + ny, GC:GC + nx].set(q3[i])
                        for i in range(3)
                    )

                def F_k(qf):
                    rhs_pl, _ = E(to_planes(qf), dt_arr, emit_rhs=True)
                    return _interior_flat(*rhs_pl)

                if with_src and src is not None:
                    es3 = jnp.zeros((3, ny, nx), jnp.float32).at[0].set(
                        src[ty:ty + ny, GC:GC + nx]
                    )
                else:
                    es3 = jnp.zeros((3, ny, nx), jnp.float32)

                def F_l(qf):
                    rhs3, _ = lin_op.apply(
                        qf.reshape(3, ny, nx), dt_i, es3
                    )
                    return rhs3.reshape(3, -1).astype(jnp.float32)

                q_flat = _interior_flat(*st[:3])
                _, cm = E(st, dt_arr, emit_rhs=True)  # Courant diagnostic
                q_new = newton_beuler_solve(F_k, F_l, q_flat, dt_i)
                stn = to_planes(q_new)
            else:  # rk4 from rhs-mode kernel calls
                def R(s):
                    return E(s, dt_arr, emit_rhs=True)

                k1, cm = R(st)
                hdt = 0.5 * dt_i
                k2, _ = R(lin(st, 1.0, k1, hdt))
                k3, _ = R(lin(st, 1.0, k2, hdt))
                k4, _ = R(lin(st, 1.0, k3, dt_i))
                w = dt_i / 6.0
                stn = tuple(
                    s + w * (a + 2 * b + 2 * c + d)
                    for s, a, b, c, d in zip(st, k1, k2, k3, k4)
                )
            # dt_i == 0 leaves the state unchanged (q + 0 * rhs for euler;
            # convex combos of unchanged states for the SSP schemes)
            out = (stn, tt + dt_i, jnp.maximum(cmax, cm * dt_i))
            if accumulate:
                out = out + (bfa, asol, aprim, atime)
            return out

        init = (st0, jnp.float32(t0), jnp.float32(0.0))
        if accumulate:
            Eb = bv_edges.shape[1] if bv_edges is not None else 1
            init = init + (
                jnp.zeros((3 + nt, Eb), jnp.float32),
                jnp.zeros((3 + nt, ny * nx), jnp.float32),
                jnp.zeros((3 + nt, ny * nx), jnp.float32),
                jnp.float32(0.0),
            )
        res = jax.lax.fori_loop(
            0, jnp.asarray(n_steps, jnp.int32), body, init
        )
        st_f = res[0]
        # flatten back to the historical (h, hu, hv[, hc], t, cmax[, ...])
        return st_f + tuple(res[1:])

    return advance


# ----------------------------------------------- sharded (row-strip) variant

def pad_plane_sharded(x: np.ndarray, n_shards: int, gr: int = GR):
    """[ny, nx] -> [P, ny/P + 2*gr, nx + 2*GC] (per-strip padded planes)."""
    x = np.asarray(x, np.float32)
    ny = x.shape[0]
    assert ny % n_shards == 0
    nyl = ny // n_shards
    strips = x.reshape(n_shards, nyl, x.shape[1])
    return np.stack([pad_plane(s, gr) for s in strips])


def unshard_plane(xp: np.ndarray, gr: int = GR) -> np.ndarray:
    """Inverse of pad_plane_sharded: [P, nyl + 2*gr, nxp] -> [ny, nx]."""
    xp = np.asarray(xp)
    return xp[:, gr:-gr, GC:-GC].reshape(-1, xp.shape[2] - 2 * GC)


def make_sharded_fused_structured_stepper(
    plan: StructuredPlan, device_mesh, axis_name: str = "y",
    scheme: str = "euler", with_src: bool = False, interpret: bool = False,
    num_tracers: int = 0, num_sediment: int = 0, sed_params=None,
    riemann: str = "roe", accumulate: bool = False,
    second_order: bool = False, limiter: str = "minmod",
    positivity: bool = True,
):
    """Row-strip-sharded fused structured stepper.

    The reference runs its flagship dam-break case with the SAME device
    kernels across many nodes (docs/user/example-cases/dam-break/
    frontier.batch.base:44-59); here the fused structured kernel runs
    unchanged per shard over a 1-D `jax.sharding.Mesh`: each shard owns
    ny / P raster rows, the 1-row ghost frame fills from single-row
    `ppermute`s of the strip-boundary rows (ICI traffic = 6 rows/step),
    and the Courant max folds with `lax.pmax`. Shard boundaries land on
    row-tile boundaries, so per-shard tiling — and therefore the f32
    arithmetic — is IDENTICAL to the single-device kernel: results are
    bitwise-equal to make_fused_structured_stepper.

    State/geometry planes are [P, ny/P + 2*gr, nx + 2*GC] arrays sharded
    on axis 0 (pad_plane_sharded). Dirichlet walls are supported: pass
    `bc_vals` to advance() as a dict side -> [3, ny|nx] prescribed
    (h, hu, hv) wall values — left/right values are row-strip-sharded with
    the state, bottom/top are replicated (the fill on interior strips is
    overwritten by the ppermute halo rows, so only the first/last shard's
    fill survives, exactly matching the single-device ghost frame).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_shards = device_mesh.shape[axis_name]
    nx, ny = plan.nx, plan.ny
    ty = plan.gr
    if ny % (n_shards * ty):
        raise ValueError(
            f"sharded fused kernel needs ny % (n_shards * gr) == 0 "
            f"(ny={ny}, n_shards={n_shards}, gr={ty})"
        )
    if scheme not in ("euler", "ssprk2", "ssprk3", "rk4"):
        raise ValueError(f"sharded fused: unsupported scheme '{scheme}'")
    dir_sides = tuple(
        side for side, bc in (
            ("left", plan.bc_left), ("right", plan.bc_right),
            ("bottom", plan.bc_bottom), ("top", plan.bc_top),
        ) if bc == bc_mod.BC_DIRICHLET
    )
    nyl = ny // n_shards
    local_plan = plan._replace(ny=nyl)
    nxp = nx + 2 * GC
    ntiles = nyl // ty
    nt = int(num_tracers)
    if nt and sed_params is None:
        from ..tracer.sources import SedimentParams

        sed_params = SedimentParams()
    if second_order and nt:
        raise ValueError(
            "fused raster MUSCL is flow-only (the twin rejects "
            "second_order + tracers too)"
        )

    def _mk_kernel(emit_rhs):
        return functools.partial(
            _kernel, nxp=nxp, ty=ty, gr=ty,
            tiny_h=float(plan.tiny_h), h_anuga=float(plan.h_anuga),
            inv_dx=float(1.0 / plan.dx), inv_dy=float(1.0 / plan.dy),
            with_src=with_src, emit_rhs=emit_rhs,
            nt=nt, num_sediment=int(num_sediment),
            sed_params=tuple(sed_params) if nt else None,
            upwind=riemann == "upwind_roe",
            # MUSCL masks see GLOBAL rows: the strip offset/halo extents
            # ride in the prefetched dt array (rows [1:4])
            second_order=bool(second_order), limiter=limiter,
            positivity=bool(positivity), ny=ny,
        )

    kernel = _mk_kernel(False)
    kernel_rhs = _mk_kernel(True) if scheme == "rk4" else None
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
        * ((7 if with_src else 6) + (1 if nt else 0)),
        out_specs=[
            pl.BlockSpec((ty, nxp), lambda t, d: (t + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ty, nxp), lambda t, d: (t + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ty, nxp), lambda t, d: (t + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda t, d: (0, t),
                         memory_space=pltpu.VMEM),
        ] + ([
            pl.BlockSpec((nt, ty, nxp), lambda t, d: (0, t + 1, 0),
                         memory_space=pltpu.VMEM),
        ] if nt else []),
        scratch_shapes=[
            pltpu.VMEM((2, ty + 16, nxp), jnp.float32),
            pltpu.VMEM((2, ty + 16, nxp), jnp.float32),
            pltpu.VMEM((2, ty + 16, nxp), jnp.float32),
            pltpu.VMEM((2, ty, nxp), jnp.float32),
            pltpu.VMEM((2, ty, nxp), jnp.float32),
            pltpu.VMEM((2, ty, nxp), jnp.float32),
        ] + ([pltpu.VMEM((2, ty, nxp), jnp.float32)] if with_src else [])
        + ([pltpu.VMEM((2, nt, ty + 16, nxp), jnp.float32)] if nt else [])
        + [
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    nylp = nyl + 2 * ty
    out_shape = [
        jax.ShapeDtypeStruct((nylp, nxp), jnp.float32),
        jax.ShapeDtypeStruct((nylp, nxp), jnp.float32),
        jax.ShapeDtypeStruct((nylp, nxp), jnp.float32),
        jax.ShapeDtypeStruct((1, ntiles * 128), jnp.float32),
    ] + (
        [jax.ShapeDtypeStruct((nt, nylp, nxp), jnp.float32)] if nt else []
    )

    fwd = [(i, i + 1) for i in range(n_shards - 1)]
    bwd = [(i + 1, i) for i in range(n_shards - 1)]
    r0, r1 = ty, ty + nyl

    # halo depth: first order needs the 1-row ghost frame; MUSCL +
    # Audusse positivity need 3 real neighbor rows at interior strip
    # boundaries (gradient of the halo cell row0-1 reads row0-3 through
    # its S-face drain; BASELINE.md round 5)
    HR = 3 if second_order else 1

    def exchange_and_fill(h, hu, hv, hc=None, bc_local=None):
        """Wall ghosts from the local strip + strip-boundary rows from the
        neighbor shards (the DMGlobalToLocal halo exchange of the
        reference's RHS evaluation, rdysetup.c:1133-1134, as two HR-row
        ppermutes over ICI)."""
        if nt:
            h, hu, hv, hc = fill_ghost_frame(
                local_plan, h, hu, hv, bc_local, hc
            )
        else:
            h, hu, hv = fill_ghost_frame(local_plan, h, hu, hv, bc_local)
        if n_shards > 1:
            # rows are exchanged AFTER the wall fill so halo rows carry
            # the sender's CURRENT left/right ghost columns (the MUSCL
            # positivity donors at halo rows read their wall faces; the
            # interior columns are identical either way). The receiver's
            # r0-1 frame fill is then overwritten by the real neighbor
            # row, exactly matching the single-device ghost frame.
            parts = [h[r1 - HR:r1], hu[r1 - HR:r1], hv[r1 - HR:r1]]
            partsb = [h[r0:r0 + HR], hu[r0:r0 + HR], hv[r0:r0 + HR]]
            if nt:
                parts += [hc[j, r1 - HR:r1] for j in range(nt)]
                partsb += [hc[j, r0:r0 + HR] for j in range(nt)]
            top_int = jnp.stack(parts)
            bot_int = jnp.stack(partsb)
            up = jax.lax.ppermute(top_int, axis_name, fwd)
            down = jax.lax.ppermute(bot_int, axis_name, bwd)
        if n_shards > 1:
            idx = jax.lax.axis_index(axis_name)
            not_first = idx > 0
            not_last = idx < n_shards - 1
            lo = slice(r0 - HR, r0)
            hi = slice(r1, r1 + HR)
            h = h.at[lo].set(jnp.where(not_first, up[0], h[lo]))
            hu = hu.at[lo].set(jnp.where(not_first, up[1], hu[lo]))
            hv = hv.at[lo].set(jnp.where(not_first, up[2], hv[lo]))
            h = h.at[hi].set(jnp.where(not_last, down[0], h[hi]))
            hu = hu.at[hi].set(jnp.where(not_last, down[1], hu[hi]))
            hv = hv.at[hi].set(jnp.where(not_last, down[2], hv[hi]))
            if nt:
                hc = hc.at[:, lo].set(
                    jnp.where(not_first, up[3:], hc[:, lo])
                )
                hc = hc.at[:, hi].set(
                    jnp.where(not_last, down[3:], hc[:, hi])
                )
        if nt:
            return h, hu, hv, hc
        return h, hu, hv

    def one_step(h, hu, hv, hc, dt_arr, dzx, dzy, mann, src,
                 bc_local=None, emit_rhs=False):
        if nt:
            h, hu, hv, hc = exchange_and_fill(h, hu, hv, hc, bc_local)
        else:
            h, hu, hv = exchange_and_fill(h, hu, hv, None, bc_local)
        args = (dt_arr, h, hu, hv, dzx, dzy, mann)
        if with_src:
            args = args + (src,)
        if nt:
            args = args + (hc,)
        out = pl.pallas_call(
            kernel_rhs if emit_rhs else kernel,
            grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(*args)
        st = out[:3] + ((out[4],) if nt else ())
        return st, out[3].max()

    def shard_body(h, hu, hv, hc, dzx, dzy, mann, src, bcv, t0, dt,
                   n_steps, t_end):
        h, hu, hv = h[0], hu[0], hv[0]
        dzx, dzy, mann = dzx[0], dzy[0], mann[0]
        src = src[0] if with_src else None
        st0 = (h, hu, hv) + ((hc[0],) if nt else ())
        # Dirichlet wall values for the local strip: left/right arrive
        # row-strip-sharded ([1, ndof, nyl] blocks), bottom/top replicated
        bc_local = None
        if dir_sides:
            bc_local = {}
            for s in dir_sides:
                v = bcv[s]
                if s in ("left", "right"):
                    v = v[0]
                bc_local[s] = v

        def E(st, dt_arr, emit_rhs=False):
            return one_step(
                st[0], st[1], st[2], st[3] if nt else None, dt_arr,
                dzx, dzy, mann, src, bc_local, emit_rhs=emit_rhs,
            )

        def lin(a, sa, b, sb):
            return tuple(ai * sa + bi * sb for ai, bi in zip(a, b))

        def wall_fluxes(st):
            """Per-strip raster boundary-edge Roe fluxes, the exact twin
            of SWEOperator.boundary_fluxes (ghost_states + exact roe_flux
            + both-dry mask) evaluated on the strip's wall cells. Interior
            strips' bottom/top rows are NOT walls — masked by shard index.
            Returns (fL, fR [3, nyl], fB, fT [3, nx])."""
            h_, hu_, hv_ = st[0], st[1], st[2]
            th_f = jnp.float32(plan.tiny_h)
            ha_f = jnp.float32(plan.h_anuga)
            zero = jnp.float32(0.0)
            one = jnp.float32(1.0)

            def side_flux(side, bc, hs, hus, hvs, sn, cn):
                us, vs = regularized_velocity(hs, hus, hvs, th_f, ha_f)
                if bc_local is not None and side in bc_local:
                    bv = jnp.stack(
                        [jnp.asarray(r, jnp.float32)
                         for r in bc_local[side][:3]]
                    )
                else:
                    bv = jnp.zeros((3,) + hs.shape, jnp.float32)
                (hl, ul, vl), (hr, ur, vr) = bc_mod.ghost_states(
                    bc, hs, us, vs, sn, cn, bv, th_f, ha_f,
                )
                fh, fu, fv, _ = roe_flux(hl, ul, vl, hr, ur, vr, sn, cn)
                m = jnp.where((hl < th_f) & (hr < th_f), 0.0, 1.0)
                return jnp.stack([fh, fu, fv]) * m

            fL = side_flux(
                "left", plan.bc_left,
                h_[r0:r1, GC], hu_[r0:r1, GC], hv_[r0:r1, GC], zero, -one,
            )
            fR = side_flux(
                "right", plan.bc_right,
                h_[r0:r1, GC + nx - 1], hu_[r0:r1, GC + nx - 1],
                hv_[r0:r1, GC + nx - 1], zero, one,
            )
            fB = side_flux(
                "bottom", plan.bc_bottom,
                h_[r0, GC:GC + nx], hu_[r0, GC:GC + nx],
                hv_[r0, GC:GC + nx], -one, zero,
            )
            fT = side_flux(
                "top", plan.bc_top,
                h_[r1 - 1, GC:GC + nx], hu_[r1 - 1, GC:GC + nx],
                hv_[r1 - 1, GC:GC + nx], one, zero,
            )
            if n_shards > 1:
                idx = jax.lax.axis_index(axis_name)
                fB = fB * (idx == 0)
                fT = fT * (idx == n_shards - 1)
            return fL, fR, fB, fT

        def body(i, carry):
            if accumulate:
                st, tt, cmax, bfw, asol, aprim, atime = carry
            else:
                st, tt, cmax = carry
            dt_i = jnp.maximum(jnp.minimum(dt, t_end - tt), 0.0)
            if second_order:
                # global strip offset + filled-halo extents for the
                # kernel's MUSCL/positivity masks (dt_ref rows 1:4)
                idx_ = jax.lax.axis_index(axis_name)
                row0_f = (idx_ * nyl).astype(jnp.float32)
                lo_f = jnp.where(idx_ > 0, 3.0, 1.0).astype(jnp.float32)
                hi_f = jnp.where(
                    idx_ < n_shards - 1, 3.0, 1.0
                ).astype(jnp.float32)
                dt_arr = jnp.stack(
                    [dt_i.astype(jnp.float32), row0_f, lo_f, hi_f]
                )
            else:
                dt_arr = jnp.reshape(dt_i.astype(jnp.float32), (1,))
            if accumulate:
                # dt-weighted accounting of the PRE-STEP strip state
                # (xdmf_output.c:179-241 / time_series.c:464-506 at any
                # rank count); boundary fluxes from the raster wall twin
                q_flat = jnp.stack([
                    p[r0:r1, GC:GC + nx].reshape(-1) for p in st[:3]
                ])
                th_f = jnp.float32(plan.tiny_h)
                u, v = regularized_velocity(
                    q_flat[0], q_flat[1], q_flat[2],
                    th_f, jnp.float32(plan.h_anuga),
                )
                prim_rows = [q_flat[0], u, v]
                if nt:
                    hc_flat = jnp.stack([
                        st[3][j, r0:r1, GC:GC + nx].reshape(-1)
                        for j in range(nt)
                    ])
                    q_flat = jnp.concatenate([q_flat, hc_flat])
                    wet_t = q_flat[0] > th_f
                    h_safe = jnp.where(wet_t, q_flat[0], 1.0)
                    prim_rows += [
                        jnp.where(wet_t, hc_flat[j] / h_safe, 0.0)
                        for j in range(nt)
                    ]
                asol = (asol + dt_i * q_flat).astype(jnp.float32)
                aprim = (
                    aprim + dt_i * jnp.stack(prim_rows)
                ).astype(jnp.float32)
                atime = (atime + dt_i).astype(jnp.float32)
                fw = wall_fluxes(st)
                bfw = tuple(
                    (b + dt_i * f).astype(jnp.float32)
                    for b, f in zip(bfw, fw)
                )
            if scheme == "euler":
                stn, cm = E(st, dt_arr)
            elif scheme == "ssprk2":
                st1, cm = E(st, dt_arr)
                st2, _ = E(st1, dt_arr)
                stn = lin(st, 0.5, st2, 0.5)
            elif scheme == "ssprk3":
                st1, cm = E(st, dt_arr)
                st2, _ = E(st1, dt_arr)
                st2 = lin(st, 0.75, st2, 0.25)
                st3, _ = E(st2, dt_arr)
                third = jnp.float32(1.0 / 3.0)
                stn = lin(st, third, st3, 1.0 - third)
            else:  # rk4 from rhs-mode kernel calls (per-stage halo fill)
                def R(sst):
                    return E(sst, dt_arr, emit_rhs=True)

                k1, cm = R(st)
                hdt = 0.5 * dt_i
                k2, _ = R(lin(st, 1.0, k1, hdt))
                k3, _ = R(lin(st, 1.0, k2, hdt))
                k4, _ = R(lin(st, 1.0, k3, dt_i))
                w = dt_i / 6.0
                stn = tuple(
                    sc + w * (a + 2 * b + 2 * c + d)
                    for sc, a, b, c, d in zip(st, k1, k2, k3, k4)
                )
            out = (stn, tt + dt_i, jnp.maximum(cmax, cm * dt_i))
            if accumulate:
                out = out + (bfw, asol, aprim, atime)
            return out

        init = (st0, jnp.float32(t0), jnp.float32(0.0))
        if accumulate:
            init = init + (
                (jnp.zeros((3, nyl), jnp.float32),
                 jnp.zeros((3, nyl), jnp.float32),
                 jnp.zeros((3, nx), jnp.float32),
                 jnp.zeros((3, nx), jnp.float32)),
                jnp.zeros((3 + nt, nyl * nx), jnp.float32),
                jnp.zeros((3 + nt, nyl * nx), jnp.float32),
                jnp.float32(0.0),
            )
        res = jax.lax.fori_loop(
            0, jnp.asarray(n_steps, jnp.int32), body, init
        )
        st_f, t, cmax = res[0], res[1], res[2]
        if n_shards > 1:
            cmax = jax.lax.pmax(cmax, axis_name)
        hc_out = (st_f[3][None],) if nt else (jnp.zeros((1, 1, 1, 1)),)
        outs = (st_f[0][None], st_f[1][None], st_f[2][None]) + hc_out + (
            t, cmax,
        )
        if accumulate:
            bfw, asol, aprim, atime = res[3], res[4], res[5], res[6]
            if n_shards > 1:
                # bottom/top walls live on the end shards only (masked
                # zero elsewhere): a psum replicates the real rows
                bfB = jax.lax.psum(bfw[2], axis_name)
                bfT = jax.lax.psum(bfw[3], axis_name)
            else:
                bfB, bfT = bfw[2], bfw[3]
            outs = outs + (
                bfw[0][None], bfw[1][None], bfB, bfT,
                asol[None], aprim[None], atime,
            )
        return outs

    sharded = P(axis_name, None, None)
    sharded4 = P(axis_name, None, None, None)
    bc_specs = {
        s: (sharded if s in ("left", "right") else P())
        for s in dir_sides
    }
    in_specs = (sharded,) * 3 + (sharded4,) + (sharded,) * 4 + (
        bc_specs, P(), P(), P(), P(),
    )
    out_specs = (sharded, sharded, sharded, sharded4, P(), P())
    if accumulate:
        out_specs = out_specs + (
            sharded, sharded, P(), P(), sharded, sharded, P(),
        )
    mapped = jax.jit(
        jax.shard_map(
            shard_body, mesh=device_mesh,
            in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        ),
        donate_argnums=(0, 1, 2, 3),
    )

    def advance(h, hu, hv, t0, dt, n_steps, t_end, dzx, dzy, mann,
                src=None, bc_vals=None, hc=None):
        """h/hu/hv/dzx/dzy/mann: [P, ny/P + 2*gr, nxp] (pad_plane_sharded),
        sharded over the mesh axis. bc_vals (required iff the plan has
        Dirichlet walls): dict side -> [ndof, ny|nx] prescribed wall
        values. hc (num_tracers > 0): [P, nt, nyl + 2*gr, nxp] tracer-mass
        strips. Returns (h, hu, hv[, hc], t, max_courant)."""
        if src is None:
            src = jnp.zeros_like(h)
        if nt:
            if hc is None:
                raise ValueError("num_tracers > 0 needs an hc strip stack")
        else:
            hc = jnp.zeros((n_shards, 1, 1, 1), jnp.float32)
        bcv = {}
        if dir_sides:
            if bc_vals is None:
                raise ValueError(
                    "sharded fused kernel: Dirichlet walls need bc_vals"
                )
            for s in dir_sides:
                v = jnp.asarray(bc_vals[s], jnp.float32)
                nd = v.shape[0]
                if s in ("left", "right"):
                    # [ndof, ny] -> [P, ndof, nyl] row-strip blocks
                    v = jnp.moveaxis(
                        v.reshape(nd, n_shards, nyl), 1, 0
                    )
                bcv[s] = v
        out = mapped(h, hu, hv, hc, dzx, dzy, mann, src, bcv, t0, dt,
                     n_steps, t_end)
        if nt:
            return out
        return out[:3] + out[4:]

    advance.accumulate_outputs = accumulate  # noqa: attached metadata

    return advance
