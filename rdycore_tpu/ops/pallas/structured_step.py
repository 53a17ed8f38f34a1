"""Pallas TPU kernel #3: fully-fused structured SWE euler step.

The structured (raster) fast path's XLA implementation materializes flux
and divergence arrays (~10 HBM passes per step). This kernel fuses the
ENTIRE step -- Roe fluxes in x and y, divergence, bed-slope + semi-implicit
Manning friction, and the euler update -- into one pass: read 3 state
planes (+1-row halo) + 3 static planes, write 3 planes. ~70 B/cell/step.

Layout: planes padded to [ny + 16, nx + 256] (8 ghost rows / 128 ghost
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
GC = 128  # ghost columns each side (lane-aligned)
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


def _ghost(bc, h, hu, hv, sn, cn, tiny_h, h_anuga):
    """Wall ghost state for a 1-D strip of boundary cells."""
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


def fill_ghost_frame(plan: StructuredPlan, h, hu, hv):
    """Fill the 1-cell ghost frame of padded planes from the wall BCs."""
    nx, ny = plan.nx, plan.ny
    th, ta = plan.tiny_h, plan.h_anuga
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    r0, r1 = plan.gr, plan.gr + ny  # interior row range
    c0, c1 = GC, GC + nx

    # left wall: outward normal (-1, 0)
    hg, hug, hvg = _ghost(
        plan.bc_left, h[r0:r1, c0], hu[r0:r1, c0], hv[r0:r1, c0],
        zero, -one, th, ta,
    )
    h = h.at[r0:r1, c0 - 1].set(hg)
    hu = hu.at[r0:r1, c0 - 1].set(hug)
    hv = hv.at[r0:r1, c0 - 1].set(hvg)
    # right wall: (+1, 0)
    hg, hug, hvg = _ghost(
        plan.bc_right, h[r0:r1, c1 - 1], hu[r0:r1, c1 - 1], hv[r0:r1, c1 - 1],
        zero, one, th, ta,
    )
    h = h.at[r0:r1, c1].set(hg)
    hu = hu.at[r0:r1, c1].set(hug)
    hv = hv.at[r0:r1, c1].set(hvg)
    # bottom wall: (0, -1)
    hg, hug, hvg = _ghost(
        plan.bc_bottom, h[r0, c0:c1], hu[r0, c0:c1], hv[r0, c0:c1],
        -one, zero, th, ta,
    )
    h = h.at[r0 - 1, c0:c1].set(hg)
    hu = hu.at[r0 - 1, c0:c1].set(hug)
    hv = hv.at[r0 - 1, c0:c1].set(hvg)
    # top wall: (0, +1)
    hg, hug, hvg = _ghost(
        plan.bc_top, h[r1 - 1, c0:c1], hu[r1 - 1, c0:c1], hv[r1 - 1, c0:c1],
        one, zero, th, ta,
    )
    h = h.at[r1, c0:c1].set(hg)
    hu = hu.at[r1, c0:c1].set(hug)
    hv = hv.at[r1, c0:c1].set(hvg)
    return h, hu, hv


def _kernel(dt_ref, h_hbm, hu_hbm, hv_hbm, dzx_hbm, dzy_hbm, mann_hbm,
            ho_ref, huo_ref, hvo_ref, cmax_ref,
            hw, huw, hvw, dzxw, dzyw, mw, sem,
            *, nxp, ty, gr, tiny_h, h_anuga, inv_dx, inv_dy):
    t = pl.program_id(0)
    # window rows [t*ty + gr - 8, +ty+16): 8-row halo blocks around the tile
    r = pl.multiple_of(t * ty + (gr - 8), 8)

    for src, dst in ((h_hbm, hw), (hu_hbm, huw), (hv_hbm, hvw)):
        d = pltpu.make_async_copy(src.at[pl.ds(r, ty + 16), :], dst, sem)
        d.start()
        d.wait()
    for src, dst in ((dzx_hbm, dzxw), (dzy_hbm, dzyw), (mann_hbm, mw)):
        d = pltpu.make_async_copy(src.at[pl.ds(t * ty + gr, ty), :], dst, sem)
        d.start()
        d.wait()

    dt = dt_ref[0]
    g = jnp.float32(GRAVITY)

    h = hw[:]
    hu = huw[:]
    hv = hvw[:]
    u, v = regularized_velocity(h, hu, hv, tiny_h, h_anuga)

    def shift(x, d, axis):
        # pltpu.roll requires non-negative shifts; -d == size - d
        size = x.shape[axis]
        return pltpu.roll(x, (size - d) % size, axis)

    # east-face fluxes (normal +x): roe(q[c], q[c+1])
    hE, uE, vE = (shift(x, 1, 1) for x in (h, u, v))
    fxh, fxhu, fxhv, ax = roe_flux(h, u, v, hE, uE, vE, 0.0, 1.0)
    mx = jnp.where((h < tiny_h) & (hE < tiny_h), 0.0, 1.0)
    fxh, fxhu, fxhv, ax = fxh * mx, fxhu * mx, fxhv * mx, ax * mx

    # north-face fluxes (normal +y): roe(q[r], q[r+1])
    hN, uN, vN = (shift(x, 1, 0) for x in (h, u, v))
    fyh, fyhu, fyhv, ay = roe_flux(h, u, v, hN, uN, vN, 1.0, 0.0)
    my = jnp.where((h < tiny_h) & (hN < tiny_h), 0.0, 1.0)
    fyh, fyhu, fyhv, ay = fyh * my, fyhu * my, fyhv * my, ay * my

    # divergence for the interior rows (local rows 8..8+ty)
    sl = slice(8, 8 + ty)

    def div(fx, fy):
        dwx = (fx - pltpu.roll(fx, 1, 1)) * inv_dx  # east - west
        dwy = (fy - pltpu.roll(fy, 1, 0)) * inv_dy  # north - south
        return -(dwx[sl] + dwy[sl])

    dh = div(fxh, fyh)
    dhu = div(fxhu, fyhu)
    dhv = div(fxhv, fyhv)

    # semi-implicit sources on the interior rows
    hc = h[sl]
    huc = hu[sl]
    hvc = hv[sl]
    bedx = dzxw[:] * g * hc
    bedy = dzyw[:] * g * hc
    wet = hc >= tiny_h
    h_safe = jnp.where(wet, hc, 1.0)
    uu = huc / h_safe
    vv = hvc / h_safe
    cd = g * mw[:] * mw[:] * jnp.power(h_safe, -1.0 / 3.0)
    speed = jnp.sqrt(uu * uu + vv * vv)
    tb = cd * speed / h_safe
    factor = tb / (1.0 + dt * tb)
    tbx = jnp.where(wet, (huc + dt * dhu - dt * bedx) * factor, 0.0)
    tby = jnp.where(wet, (hvc + dt * dhv - dt * bedy) * factor, 0.0)

    rh = dh
    rhu = dhu - bedx - tbx
    rhv = dhv - bedy - tby

    ho_ref[:] = hc + dt * rh
    huo_ref[:] = huc + dt * rhu
    hvo_ref[:] = hvc + dt * rhv

    # Courant over physical faces only:
    # - x-faces: columns GC-1 .. GC+nx-1 (left wall .. right wall)
    # - y-faces: rows GR-1 .. GR+TY-1 locally (south wall face of the first
    #   interior row comes from the ghost row below), columns GC .. GC+nx
    cols = jax.lax.broadcasted_iota(jnp.int32, (ty, nxp), 1)
    x_face = (cols >= GC - 1) & (cols < GC - 1 + (nxp - 2 * GC) + 1)
    y_face = (cols >= GC) & (cols < nxp - GC)
    sly = slice(7, 7 + ty)
    cm = jnp.maximum(
        jnp.where(x_face, ax[sl] * inv_dx, 0.0).max(),
        jnp.maximum(
            jnp.where(y_face, ay[sl] * inv_dy, 0.0).max(),
            jnp.where(y_face, ay[sly] * inv_dy, 0.0).max(),
        ),
    )
    cmax_ref[0, :] = jnp.full((128,), cm, jnp.float32)


def make_fused_structured_stepper(plan: StructuredPlan, dzdx, dzdy, mannings):
    """Returns advance(h, hu, hv [padded planes], t0, dt, n_steps, t_end) ->
    (h, hu, hv, t, cmax). Planes stay padded (gr = plan.gr rows) across
    steps; larger gr (= taller row tiles) cuts the halo read amplification."""
    nx, ny = plan.nx, plan.ny
    ty = plan.gr
    if ty < 8 or ty % 8:
        raise ValueError("plan.gr must be a multiple of 8 (row-tile height)")
    if nx % 128 or ny % ty:
        raise ValueError("fused structured kernel needs nx % 128 == 0 and ny % gr == 0")
    nxp = nx + 2 * GC
    ntiles = ny // ty

    # None => caller passes padded geometry planes to advance() at run time
    dzx_p = None if dzdx is None else jnp.asarray(pad_plane(dzdx, ty))
    dzy_p = None if dzdy is None else jnp.asarray(pad_plane(dzdy, ty))
    mann_p = None if mannings is None else jnp.asarray(pad_plane(mannings, ty))

    kernel = functools.partial(
        _kernel, nxp=nxp, ty=ty, gr=ty,
        tiny_h=float(plan.tiny_h), h_anuga=float(plan.h_anuga),
        inv_dx=float(1.0 / plan.dx), inv_dy=float(1.0 / plan.dy),
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # dt (as a f32 array of length 1)
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 6,
        out_specs=[
            pl.BlockSpec((ty, nxp), lambda t, d: (t + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ty, nxp), lambda t, d: (t + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ty, nxp), lambda t, d: (t + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda t, d: (0, t), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((ty + 16, nxp), jnp.float32),
            pltpu.VMEM((ty + 16, nxp), jnp.float32),
            pltpu.VMEM((ty + 16, nxp), jnp.float32),
            pltpu.VMEM((ty, nxp), jnp.float32),
            pltpu.VMEM((ty, nxp), jnp.float32),
            pltpu.VMEM((ty, nxp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    nyp = ny + 2 * ty
    out_shape = [
        jax.ShapeDtypeStruct((nyp, nxp), jnp.float32),
        jax.ShapeDtypeStruct((nyp, nxp), jnp.float32),
        jax.ShapeDtypeStruct((nyp, nxp), jnp.float32),
        jax.ShapeDtypeStruct((1, ntiles * 128), jnp.float32),
    ]

    def one_step(h, hu, hv, dt_arr, dzx, dzy, mann, interpret=False):
        h, hu, hv = fill_ghost_frame(plan, h, hu, hv)
        # raise Mosaic's scoped-VMEM cap (default 16MB) toward the chip's
        # physical VMEM: wide meshes (nx >= 8192 -> 8448-col blocks) need
        # ~20-32MB of stack for the flux temporaries at ty=8..16
        ho, huo, hvo, cm = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(dt_arr, h, hu, hv, dzx, dzy, mann)
        # the kernel writes the interior row blocks of full padded planes;
        # the ghost frame (unwritten garbage) is refreshed at the start of
        # the next step, so the outputs ARE the new state -- no re-splice
        return ho, huo, hvo, cm.max()

    def advance(h, hu, hv, t0, dt, n_steps, t_end,
                dzx=None, dzy=None, mann=None, interpret=False):
        # geometry planes default to the factory-captured constants; VERY
        # large meshes should pass them as runtime args instead (constants
        # are inlined into the compiled program -- a 184M-cell mesh bakes
        # ~2.3 GB of MLIR, which remote-compile services may reject)
        dzx = dzx_p if dzx is None else dzx
        dzy = dzy_p if dzy is None else dzy
        mann = mann_p if mann is None else mann

        def body(i, carry):
            h, hu, hv, tt, cmax = carry
            dt_i = jnp.maximum(jnp.minimum(dt, t_end - tt), 0.0)
            hn, hun, hvn, cm = one_step(
                h, hu, hv, jnp.reshape(dt_i.astype(jnp.float32), (1,)),
                dzx, dzy, mann,
                interpret=interpret,
            )
            # dt_i == 0 leaves the state unchanged (q + 0 * rhs), so no
            # explicit guard is needed
            return (hn, hun, hvn, tt + dt_i, jnp.maximum(cmax, cm * dt_i))

        init = (h, hu, hv, jnp.float32(t0), jnp.float32(0.0))
        return jax.lax.fori_loop(0, jnp.asarray(n_steps, jnp.int32), body, init)

    return advance
