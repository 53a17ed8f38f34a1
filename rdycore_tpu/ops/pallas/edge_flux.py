"""Pallas TPU kernel for the unstructured interior edge flux.

The hot loop of the whole model (SURVEY §3.2): per interior edge, gather the
two adjacent cell states, solve the Roe problem, emit the flux + max wave
speed. The reference runs this as a libCEED JIT kernel over all edges
(swe_fluxes_ceed.h SWEFlux_Roe); the XLA twin uses jnp gathers.

Kernel design (TPU has no general vector-gather unit):
- cells are RCM-ordered (csrc rdy_rcm_order) and interior edges sorted by
  min(left, right), so each tile of TE consecutive edges references cells
  inside a bounded window [ws, ws + W) of the state array
- per tile: DMA the state window HBM -> VMEM (double-buffer-friendly
  contiguous slice), then gather via ONE-HOT MATMUL on the MXU:
  q_tile[TE, 3] = onehot[TE, W] @ window[W, 3], with the one-hot built
  in-register from broadcasted_iota == local index
- the Roe math runs on [TE]-vectors on the VPU; outputs are [TE] tiles

Window starts are precomputed on the host (scalar prefetch) and rounded to
128-lane multiples. Meshes whose RCM bandwidth exceeds the window budget
fall back to the XLA twin.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..swe.riemann import regularized_velocity, roe_flux


class EdgeFluxPlan(NamedTuple):
    """Host-precomputed tiling plan."""

    il: np.ndarray  # [E_pad] int32 (padded with 0)
    ir: np.ndarray
    cn: np.ndarray  # [E_pad] f32 (padding rows: cn=sn=0 -> flux ignored)
    sn: np.ndarray
    window_start: np.ndarray  # [ntiles] int32, 128-aligned
    valid: np.ndarray  # [E_pad] f32 mask (1 for real edges)
    tile: int
    window: int
    num_edges: int  # real edge count


def plan_edge_flux(
    int_left: np.ndarray,
    int_right: np.ndarray,
    int_cn: np.ndarray,
    int_sn: np.ndarray,
    num_cells: int,
    tile: int = 512,
    max_window: int = 4096,
) -> Optional[EdgeFluxPlan]:
    """Sort edges by min cell, tile them, and bound each tile's cell window.
    Returns None if any window exceeds max_window (fall back to XLA)."""
    E = len(int_left)
    if E == 0:
        return None
    order = np.argsort(np.minimum(int_left, int_right), kind="stable")
    il = int_left[order].astype(np.int32)
    ir = int_right[order].astype(np.int32)
    cn = int_cn[order].astype(np.float32)
    sn = int_sn[order].astype(np.float32)

    ntiles = -(-E // tile)
    E_pad = ntiles * tile
    # pad with the last real edge's cells so padded rows stay inside the
    # final tile's window
    il = np.concatenate([il, np.full(E_pad - E, il[-1], np.int32)])
    ir = np.concatenate([ir, np.full(E_pad - E, ir[-1], np.int32)])
    cn = np.concatenate([cn, np.zeros(E_pad - E, np.float32)])
    sn = np.concatenate([sn, np.zeros(E_pad - E, np.float32)])
    valid = np.concatenate(
        [np.ones(E, np.float32), np.zeros(E_pad - E, np.float32)]
    )

    window_start = np.zeros(ntiles, np.int32)
    need = 0
    for t in range(ntiles):
        sl = slice(t * tile, (t + 1) * tile)
        lo = min(il[sl].min(), ir[sl].min())
        hi = max(il[sl].max(), ir[sl].max())
        ws = (lo // 128) * 128
        if hi - ws + 1 > max_window:
            return None
        window_start[t] = ws
        need = max(need, hi - ws + 1)
    # shrink the window to the actual requirement (one-hot gather cost is
    # proportional to the window size), rounded up to the lane tiling
    window = min(max_window, -(-need // 128) * 128)
    return EdgeFluxPlan(
        il=il, ir=ir, cn=cn, sn=sn, window_start=window_start,
        valid=valid, tile=tile, window=window, num_edges=E,
    )


def _kernel(ws_ref, il_ref, ir_ref, cn_ref, sn_ref, valid_ref, q_hbm,
            out_ref, win_ref, sem,
            *, tile, window, tiny_h, h_anuga):
    t = pl.program_id(0)
    ws = pl.multiple_of(ws_ref[t], 128)  # window starts are 128-aligned

    # NOTE the state arrives padded to 8 rows ([8, C]): Mosaic requires the
    # sliced sublane dimension to be tiling-aligned, and f32 tiles are (8, 128)
    dma = pltpu.make_async_copy(
        q_hbm.at[:, pl.ds(ws, window)], win_ref, sem
    )
    dma.start()
    dma.wait()

    # per-edge inputs arrive as [1, TE] 2-D tiles (1-D i32 operands hit
    # XLA/Mosaic layout tiling mismatches)
    il = il_ref[0, :] - ws  # [TE]
    ir = ir_ref[0, :] - ws

    # one-hot gather on the MXU: [TE, W] @ [W, 8]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)
    onehot_l = (lanes == il[:, None]).astype(jnp.float32)
    onehot_r = (lanes == ir[:, None]).astype(jnp.float32)
    win_t = win_ref[:].T  # [W, 8]
    ql = jnp.dot(onehot_l, win_t, preferred_element_type=jnp.float32)  # [TE, 8]
    qr = jnp.dot(onehot_r, win_t, preferred_element_type=jnp.float32)

    hl, hul, hvl = ql[:, 0], ql[:, 1], ql[:, 2]
    hr, hur, hvr = qr[:, 0], qr[:, 1], qr[:, 2]
    ul, vl = regularized_velocity(hl, hul, hvl, tiny_h, h_anuga)
    ur, vr = regularized_velocity(hr, hur, hvr, tiny_h, h_anuga)

    f_h, f_hu, f_hv, amax = roe_flux(
        hl, ul, vl, hr, ur, vr, sn_ref[0, :], cn_ref[0, :]
    )
    dry = (hl < tiny_h) & (hr < tiny_h)
    mask = jnp.where(dry, 0.0, valid_ref[0, :])
    zero = jnp.zeros_like(f_h)
    # packed output [8, TE]: rows f_h, f_hu, f_hv, amax, 0*4 (consumed
    # directly by the cell-divergence kernel)
    out_ref[:] = jnp.stack(
        [f_h * mask, f_hu * mask, f_hv * mask, amax * mask,
         zero, zero, zero, zero]
    )


def edge_flux_plan_apply(
    arrays, q, tiny_h, h_anuga, tile, window, num_internal_edges,
    interpret=False,
):
    """Operator-facing wrapper: consume the plan arrays stored on
    OperatorArrays (pl_*) and return the PACKED interior flux array
    [8, E_pad] (rows f_h, f_hu, f_hv, amax) in the operator's interior edge
    order (plan order == operator order when built via to_pallas_backend)."""
    plan_arrays = _DevicePlan(
        il=arrays.pl_il, ir=arrays.pl_ir, cn=arrays.pl_cn, sn=arrays.pl_sn,
        valid=arrays.pl_valid, window_start=arrays.pl_ws,
    )
    return _call_kernel(
        plan_arrays, q, tiny_h, h_anuga, tile, window, interpret
    )


class _DevicePlan(NamedTuple):
    il: jnp.ndarray
    ir: jnp.ndarray
    cn: jnp.ndarray
    sn: jnp.ndarray
    valid: jnp.ndarray
    window_start: jnp.ndarray


def _call_kernel(plan, q, tiny_h, h_anuga, tile, window, interpret):
    E_pad = plan.il.shape[0]
    ntiles = E_pad // tile

    C = q.shape[1]
    # pad columns so every window slice is in-bounds, and rows 3 -> 8 for
    # Mosaic's (8, 128) f32 tiling of the DMA source
    pad = window  # safe upper bound: last window start < C
    q = jnp.pad(q.astype(jnp.float32), ((0, 8 - q.shape[0]), (0, pad)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, tile), lambda t, ws: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda t, ws: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda t, ws: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda t, ws: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda t, ws: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (8, tile), lambda t, ws: (0, t), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((8, window), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _kernel, tile=tile, window=window,
        tiny_h=float(tiny_h), h_anuga=float(h_anuga),
    )
    out_shape = jax.ShapeDtypeStruct((8, E_pad), jnp.float32)
    def two_d(x):
        return x.reshape(1, ntiles * tile)

    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret
    )(
        plan.window_start, two_d(plan.il), two_d(plan.ir), two_d(plan.cn),
        two_d(plan.sn), two_d(plan.valid), q,
    )


def edge_flux_pallas(
    plan: EdgeFluxPlan,
    q: jnp.ndarray,  # [3, C] float32
    tiny_h: float,
    h_anuga: float,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (f_h, f_hu, f_hv, amax) for the plan's edge order, length
    E_pad (slice [:plan.num_edges] for real edges)."""
    dev = _DevicePlan(
        il=jnp.asarray(plan.il),
        ir=jnp.asarray(plan.ir),
        cn=jnp.asarray(plan.cn),
        sn=jnp.asarray(plan.sn),
        valid=jnp.asarray(plan.valid),
        window_start=jnp.asarray(plan.window_start),
    )
    packed = _call_kernel(
        dev, q, tiny_h, h_anuga, plan.tile, plan.window, interpret
    )
    E = plan.num_edges
    return packed[0, :E], packed[1, :E], packed[2, :E], packed[3, :E]


def to_pallas_backend(op, tile: int = 1024, window: int = 4096,
                      interpret: bool = False):
    """Rebuild an SWEOperator with the Pallas interior-flux backend.

    Reorders interior edges into the kernel's tile order (so kernel outputs
    align with the operator's interior edge slots), attaches the plan
    arrays, and flips edge_flux_backend. Returns the original operator
    unchanged if no valid plan exists (bandwidth too large -- reorder the
    mesh with RCM first) or if an unsupported feature is enabled.
    """
    import dataclasses

    if op.num_tracers or op.second_order or op.well_balancing_hr \
            or op.well_balancing_bs2002:
        return op
    a = op.arrays
    il = np.asarray(a.int_left)
    ir = np.asarray(a.int_right)
    plan = plan_edge_flux(
        il, ir, np.asarray(a.int_cn), np.asarray(a.int_sn),
        op.num_cells, tile=tile, max_window=window,
    )
    if plan is None:
        return op

    Ei = op.num_internal_edges
    order = np.argsort(np.minimum(il, ir), kind="stable")
    inv = np.empty(Ei, dtype=np.int64)
    inv[order] = np.arange(Ei)

    # remap cell_edges: interior entries get their new position; boundary
    # and dummy entries are unchanged
    ce = np.asarray(a.cell_edges)
    ce_new = np.where(ce < Ei, inv[np.clip(ce, 0, Ei - 1)], ce)

    # cell-divergence kernel plan over the INTERIOR flux array [8, E_pad]:
    # boundary contributions are added by a small XLA scatter afterwards
    # (boundary slots would blow every tile's window to the array end)
    from .cell_div import plan_cell_div

    E_pad = len(plan.il)
    coef = np.asarray(a.cell_edge_coef)
    interior_slot = ce_new < Ei
    ce_cd = np.where(interior_slot, ce_new, 0)
    coef_cd = np.where(interior_slot, coef, 0.0)
    # a cell tile spans ~2x the edge range of an edge tile, so the
    # divergence kernel gets twice the window
    cd_plan = plan_cell_div(
        ce_cd,
        coef_cd,
        num_edge_slots=E_pad,
        tile=tile,
        max_window=2 * window,
        dummy_id=E_pad,
    )
    if cd_plan is None:
        return op

    f32 = lambda x: jnp.asarray(x, a.int_cn.dtype)
    arrays = a._replace(
        int_left=jnp.asarray(il[order], jnp.int32),
        int_right=jnp.asarray(ir[order], jnp.int32),
        int_cn=f32(np.asarray(a.int_cn)[order]),
        int_sn=f32(np.asarray(a.int_sn)[order]),
        cell_edges=jnp.asarray(ce_new, jnp.int32),
        edge_courant_coef=f32(
            np.concatenate(
                [
                    np.asarray(a.edge_courant_coef)[:Ei][order],
                    np.asarray(a.edge_courant_coef)[Ei:],
                ]
            )
        ),
        pl_il=jnp.asarray(plan.il),
        pl_ir=jnp.asarray(plan.ir),
        pl_cn=jnp.asarray(plan.cn),
        pl_sn=jnp.asarray(plan.sn),
        pl_valid=jnp.asarray(plan.valid),
        pl_ws=jnp.asarray(plan.window_start),
        pl_cd_ws=jnp.asarray(cd_plan.window_start),
        pl_cd_ce=jnp.asarray(cd_plan.ce),
        pl_cd_coef=jnp.asarray(cd_plan.coef),
    )
    return dataclasses.replace(
        op,
        arrays=arrays,
        edge_flux_backend="pallas",
        pallas_tile=plan.tile,
        pallas_window=plan.window,
        pallas_cd_window=cd_plan.window,
        pallas_interpret=interpret,
    )
