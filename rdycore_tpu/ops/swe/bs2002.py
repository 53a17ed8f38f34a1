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


def build_bs2002_arrays(mesh, edge_perm, Ei, dtype) -> BS2002Arrays:
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


def eta_vertices(bs: BS2002Arrays, h, tiny_h):
    """eta at mesh vertices from cell depths (SWEEtaVertex)."""
    z1, z2, z3 = bs.z1, bs.z2, bs.z3
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

    eta_cell = jnp.where(
        h <= tiny_h,
        z1,
        jnp.where(
            h >= h3,
            all_sub,
            jnp.where((h > 0.0) & (h <= h2), one_sub, two_sub),
        ),
    )

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
