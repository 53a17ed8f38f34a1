"""Pallas TPU kernel #2: windowed cell-divergence gather.

Consumes the packed edge-flux array produced by the edge kernel
([8, E_pad]: rows f_h, f_hu, f_hv, courant, 0...) and computes each cell's
flux divergence by gathering its <= 4 incident edge fluxes with the
precomputed +-len/area coefficients -- the same pull form as the XLA twin,
so conservation stays exact (every edge flux is computed once and summed
identically on both sides).

Same windowed one-hot-matmul design as the edge kernel: after RCM ordering
and edge sorting, the edges of a tile of consecutive cells live in a
bounded window of the edge array.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class CellDivPlan(NamedTuple):
    # per-cell slot indices into the edge array (E_pad = dummy/no edge)
    ce: np.ndarray  # [K, C_pad] int32
    coef: np.ndarray  # [K, C_pad] f32 (0 on padding)
    window_start: np.ndarray  # [ntiles] int32 into the edge array
    tile: int
    window: int
    num_cells: int


def plan_cell_div(
    cell_edges: np.ndarray,  # [C, K] indices into the packed flux layout
    cell_edge_coef: np.ndarray,  # [C, K]
    num_edge_slots: int,  # total packed slots incl. the trailing dummy
    tile: int = 1024,
    max_window: int = 4096,
    dummy_id: Optional[int] = None,  # the dummy slot id (coef == 0 there)
) -> Optional[CellDivPlan]:
    C, K = cell_edges.shape
    ntiles = -(-C // tile)
    C_pad = ntiles * tile
    ce = np.full((K, C_pad), 0, np.int32)
    coef = np.zeros((K, C_pad), np.float32)
    # dummy slots point inside the window with coefficient 0
    E_dummy = num_edge_slots - 1 if dummy_id is None else dummy_id
    for k in range(K):
        col = cell_edges[:, k].astype(np.int64)
        cf = cell_edge_coef[:, k].astype(np.float32)
        dummy = col >= E_dummy
        ce[k, :C] = np.where(dummy, 0, col)
        coef[k, :C] = np.where(dummy, 0.0, cf)

    window_start = np.zeros(ntiles, np.int32)
    need = 0
    for t in range(ntiles):
        sl = slice(t * tile, min((t + 1) * tile, C))
        block = ce[:, sl]
        cf = coef[:, sl]
        live = cf != 0.0
        if not live.any():
            window_start[t] = 0
            continue
        lo = int(block[live].min())
        hi = int(block[live].max())
        ws = (lo // 128) * 128
        if hi - ws + 1 > max_window:
            return None
        window_start[t] = ws
        need = max(need, hi - ws + 1)
        # re-point dead slots inside the window so (idx - ws) stays valid
        ce[:, sl] = np.where(live, block, ws)
    window = min(max_window, -(-need // 128) * 128)
    return CellDivPlan(
        ce=ce, coef=coef, window_start=window_start,
        tile=tile, window=window, num_cells=C,
    )


def _kernel(ws_ref, ce_ref, coef_ref, flux_hbm, out_ref, win_ref, sem,
            *, tile, window, K):
    t = pl.program_id(0)
    ws = pl.multiple_of(ws_ref[t], 128)

    dma = pltpu.make_async_copy(flux_hbm.at[:, pl.ds(ws, window)], win_ref, sem)
    dma.start()
    dma.wait()

    win_t = win_ref[:].T  # [W, 8]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)
    acc = jnp.zeros((tile, 8), jnp.float32)
    for k in range(K):
        idx = ce_ref[k, :] - ws  # [TC]
        onehot = (lanes == idx[:, None]).astype(jnp.float32)
        gathered = jnp.dot(onehot, win_t, preferred_element_type=jnp.float32)
        acc = acc + gathered * coef_ref[k, :][:, None]
    out_ref[:] = acc.T  # [8, TC]


def cell_div_pallas(
    plan_arrays, flux_packed: jnp.ndarray, tile: int, window: int, K: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """flux_packed: [8, E_pad]. Returns [8, C_pad] flux divergence (rows
    0..2 meaningful)."""
    ws, ce, coef = plan_arrays
    C_pad = ce.shape[1]
    ntiles = C_pad // tile

    # pad the flux array so windows are in-bounds
    flux_packed = jnp.pad(flux_packed, ((0, 0), (0, window)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((K, tile), lambda t, w: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tile), lambda t, w: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (8, tile), lambda t, w: (0, t), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((8, window), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(_kernel, tile=tile, window=window, K=K)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, C_pad), jnp.float32),
        interpret=interpret,
    )(ws, ce, coef, flux_packed)
