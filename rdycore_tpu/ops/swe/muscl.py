"""MUSCL second-order reconstruction in gather form.

Mirrors the reference's weighted least-squares gradient + limited linear
extrapolation (operator_fluxes_ceed.c:860-1208):

- per-cell 2x2 LS normal matrix from centroid deltas with 1/d weights,
  inverted analytically; per-edge coefficients such that
    grad[cl] += c_LR * (q[cr] - q[cl]),  grad[cr] += c_RL * (q[cr] - q[cl])
- here the scatter becomes a *gather*: each cell sums coef * dq over its
  incident interior edges (same deterministic pull pattern as the flux)
- face values q_face = q_cell + limit(grad . dx, +-0.5 dq) with
  minmod / van Leer / none limiters (operator_fluxes_ceed.c:1109-1134),
  h clamped >= 0 (ReconstructFaceValues:1199-1201)
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Tuple

import jax.numpy as jnp
import numpy as np

if TYPE_CHECKING:
    from ...operator import SWEOperator


def precompute_ls_coefficients(mesh, edge_perm, Ei):
    """Per-(cell, slot) LS gradient coefficients aligned to mesh.cell_edges.

    Returns (cell_ls_cx, cell_ls_cy) of shape [C, K] (zero on non-interior
    slots) and per-interior-edge centroid->midpoint displacement arrays
    (dxl, dyl, dxr, dyr) in the operator's edge order.
    """
    C = mesh.num_cells
    K = mesh.cell_edges.shape[1]
    left = mesh.edge_cells[edge_perm, 0]
    right = mesh.edge_cells[edge_perm, 1]
    cent = mesh.cell_centroid

    il = left[:Ei]
    ir = right[:Ei]
    dx = cent[ir, 0] - cent[il, 0]
    dy = cent[ir, 1] - cent[il, 1]
    d = np.sqrt(dx * dx + dy * dy)
    w = np.where(d > 0.0, 1.0 / np.where(d > 0, d, 1.0), 0.0)

    # per-cell normal matrix M = [[m00, m01], [m01, m11]]
    m00 = np.zeros(C)
    m01 = np.zeros(C)
    m11 = np.zeros(C)
    np.add.at(m00, il, w * dx * dx)
    np.add.at(m01, il, w * dx * dy)
    np.add.at(m11, il, w * dy * dy)
    np.add.at(m00, ir, w * dx * dx)
    np.add.at(m01, ir, w * dx * dy)
    np.add.at(m11, ir, w * dy * dy)

    det = m00 * m11 - m01 * m01
    degen = np.abs(det) < 1e-15
    inv_det = np.where(degen, 0.0, 1.0 / np.where(degen, 1.0, det))
    i00 = m11 * inv_det
    i01 = -m01 * inv_det
    i11 = m00 * inv_det

    wdx = w * dx
    wdy = w * dy
    cx_LR = i00[il] * wdx + i01[il] * wdy
    cy_LR = i01[il] * wdx + i11[il] * wdy
    cx_RL = i00[ir] * wdx + i01[ir] * wdy
    cy_RL = i01[ir] * wdx + i11[ir] * wdy

    # align coefficients with the cell_edges slot layout: for cell c at slot
    # k referencing interior edge e (operator order), coefficient is c_LR if
    # c is the edge's left cell, c_RL if right
    inv_perm = np.empty(len(edge_perm) + 1, dtype=np.int64)
    inv_perm[edge_perm] = np.arange(len(edge_perm))
    inv_perm[len(edge_perm)] = len(edge_perm)
    ce_op = inv_perm[mesh.cell_edges]  # [C, K] in operator edge order

    cell_ls_cx = np.zeros((C, K))
    cell_ls_cy = np.zeros((C, K))
    cells_idx = np.repeat(np.arange(C), K).reshape(C, K)
    is_int = ce_op < Ei
    e_idx = np.where(is_int, ce_op, 0)
    is_left = is_int & (il[e_idx] == cells_idx)
    is_right = is_int & (ir[e_idx] == cells_idx)
    cell_ls_cx = np.where(is_left, cx_LR[e_idx], np.where(is_right, cx_RL[e_idx], 0.0))
    cell_ls_cy = np.where(is_left, cy_LR[e_idx], np.where(is_right, cy_RL[e_idx], 0.0))

    # centroid -> edge-midpoint displacements per interior edge
    ev = mesh.edge_vertices[edge_perm[:Ei]]
    xm = (mesh.points[ev[:, 0], 0] + mesh.points[ev[:, 1], 0]) / 2.0
    ym = (mesh.points[ev[:, 0], 1] + mesh.points[ev[:, 1], 1]) / 2.0
    dxl = xm - cent[il, 0]
    dyl = ym - cent[il, 1]
    dxr = xm - cent[ir, 0]
    dyr = ym - cent[ir, 1]

    return cell_ls_cx, cell_ls_cy, dxl, dyl, dxr, dyr


def limit_slope(limiter: str, extrap, half_dq):
    """minmod / van Leer / none (operator_fluxes_ceed.c:1109-1134)."""
    if limiter == "none":
        return extrap
    prod = extrap * half_dq
    if limiter == "van_leer":
        s = extrap + half_dq
        s_safe = jnp.where(s != 0.0, s, 1.0)
        return jnp.where(prod > 0.0, 2.0 * prod / s_safe, 0.0)
    # minmod (default)
    return jnp.where(
        prod <= 0.0,
        0.0,
        jnp.where(jnp.abs(extrap) < jnp.abs(half_dq), extrap, half_dq),
    )


def reconstruct_interior_states(
    op: "SWEOperator", q: jnp.ndarray
) -> Tuple[Tuple, Tuple]:
    """Second-order face states for interior edges: ((h, hu, hv)_L, (.)_R)."""
    a = op.arrays
    il, ir = a.int_left, a.int_right
    dtype = q.dtype

    dq = q[:, ir] - q[:, il]  # [3, Ei]
    # pad to full edge index space (boundary + dummy slots -> 0)
    E_total = op.num_edges + 1
    dq_pad = jnp.zeros((3, E_total), dtype).at[:, : op.num_internal_edges].set(dq)

    gathered = dq_pad[:, a.cell_edges]  # [3, C, K]
    grad_x = (gathered * a.cell_ls_cx).sum(axis=-1)  # [3, C]
    grad_y = (gathered * a.cell_ls_cy).sum(axis=-1)

    extrap_L = grad_x[:, il] * a.int_dxl + grad_y[:, il] * a.int_dyl
    extrap_R = grad_x[:, ir] * a.int_dxr + grad_y[:, ir] * a.int_dyr

    qL = q[:, il] + limit_slope(op.limiter, extrap_L, 0.5 * dq)
    qR = q[:, ir] + limit_slope(op.limiter, extrap_R, -0.5 * dq)

    hl = jnp.maximum(0.0, qL[0])
    hr = jnp.maximum(0.0, qR[0])
    return (hl, qL[1], qL[2]), (hr, qR[1], qR[2])
