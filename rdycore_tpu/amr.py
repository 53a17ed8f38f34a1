"""Adaptive mesh refinement (src/rdyamr.c + driver/amr.c).

The reference marks owned cells (from time-stamped refinement rasters:
value > 0 and cell area above a threshold, amr.c:78-110), adapts the DMPlex
mesh with transition cells (DMAdaptLabel), interpolates state through
coarse->fine matrices, and rebuilds the operator/TS (rdyamr.c:482+).

TPU-native equivalent for triangle meshes: conforming RED-GREEN refinement
  - marked triangles split into 4 similar children (RED)
  - closure: a triangle with >= 2 refined edges is promoted to RED; with
    exactly 1 refined edge it is bisected into 2 (GREEN)
  - state transfer is piecewise-constant injection (children inherit the
    parent cell average -- conservative for FV)
After refinement the Simulation rebuilds its operator and recompiles the
step (a new mesh means new static shapes -- same cost structure as the
reference's operator/TS rebuild).
"""

from __future__ import annotations

from typing import Dict, Set, Tuple

import numpy as np

from .mesh.core import Mesh, build_mesh, named_boundary_sets


def refine_marked(mesh: Mesh, marked: np.ndarray) -> Tuple[Mesh, np.ndarray]:
    """Red-green refine the marked cells of a triangle mesh.

    Returns (new_mesh, parent): parent[i] = coarse cell id of fine cell i.
    """
    if (mesh.cell_num_vertices != 3).any():
        raise NotImplementedError(
            "adaptive refinement currently supports triangle meshes "
            "(the reference's AMR test case is triangles: amr_dx1.yaml)"
        )
    C = mesh.num_cells
    marked = np.asarray(marked, dtype=bool)
    if marked.shape != (C,):
        raise ValueError(f"marked must have shape ({C},)")
    if not marked.any():
        return mesh, np.arange(C)

    # --- closure iteration: decide RED cells -------------------------------
    red = marked.copy()
    # cell -> its 3 edges (mesh.cell_edges has dummy padding = num_edges)
    ce = mesh.cell_edges[:, :3]
    while True:
        edge_refined = np.zeros(mesh.num_edges + 1, dtype=bool)
        edge_refined[ce[red].ravel()] = True
        n_refined_edges = edge_refined[ce].sum(axis=1)
        promote = (~red) & (n_refined_edges >= 2)
        if not promote.any():
            break
        red |= promote
    green = (~red) & (edge_refined[ce].sum(axis=1) == 1)

    # --- new vertices: midpoints of refined edges --------------------------
    pts = mesh.points
    NV = len(pts)
    refined_edges = np.nonzero(edge_refined[: mesh.num_edges])[0]
    mid_id = {}
    new_pts = [pts]
    for i, e in enumerate(refined_edges):
        mid_id[int(e)] = NV + i
    if len(refined_edges):
        ev = mesh.edge_vertices[refined_edges]
        new_pts.append((pts[ev[:, 0]] + pts[ev[:, 1]]) / 2.0)
    points = np.concatenate(new_pts, axis=0)

    # edge lookup: cell slot k -> edge id (operator of mesh.cell_edges is in
    # mesh edge order; slots follow the CCW vertex order (v_k, v_{k+1}))
    def slot_edge(c, k):
        return int(ce[c, k])

    new_cells = []
    parent = []
    for c in range(C):
        v = mesh.cell_vertices[c, :3]
        e01, e12, e20 = (slot_edge(c, 0), slot_edge(c, 1), slot_edge(c, 2))
        if red[c]:
            m01 = mid_id[e01]
            m12 = mid_id[e12]
            m20 = mid_id[e20]
            new_cells += [
                [v[0], m01, m20],
                [v[1], m12, m01],
                [v[2], m20, m12],
                [m01, m12, m20],
            ]
            parent += [c] * 4
        elif green[c]:
            # bisect across the single refined edge
            for k, e in enumerate((e01, e12, e20)):
                if edge_refined[e]:
                    a, b = v[k], v[(k + 1) % 3]
                    opp = v[(k + 2) % 3]
                    m = mid_id[e]
                    new_cells += [[a, m, opp], [m, b, opp]]
                    parent += [c] * 2
                    break
        else:
            new_cells.append(v.tolist())
            parent.append(c)
    new_cells = np.asarray(new_cells, dtype=np.int64)
    parent = np.asarray(parent)

    # --- propagate regions -------------------------------------------------
    children: Dict[int, list] = {}
    for i, p in enumerate(parent):
        children.setdefault(int(p), []).append(i)
    regions = {}
    for name, cids in mesh.regions.items():
        kids = (
            np.concatenate([np.asarray(children[int(cc)]) for cc in cids])
            if len(cids)
            else np.zeros(0)
        )
        regions[name] = np.sort(kids).astype(np.int32)

    # --- propagate boundaries ----------------------------------------------
    boundary = {}
    for name, eids in named_boundary_sets(mesh).items():
        pairs = []
        for e in eids:
            va, vb = mesh.edge_vertices[e]
            if edge_refined[e]:
                m = mid_id[int(e)]
                pairs += [[va, m], [m, vb]]
            else:
                pairs.append([va, vb])
        boundary[name] = (
            np.asarray(pairs, dtype=np.int64) if pairs else np.zeros((0, 2), np.int64)
        )

    new_mesh = build_mesh(
        points, new_cells, regions=regions, boundary_edges=boundary
    )
    return new_mesh, parent


def mark_cells_from_raster(
    depth_values: np.ndarray, areas: np.ndarray, area_threshold: float = 1.0 / 8.0
) -> np.ndarray:
    """The AMR driver's marking rule (amr.c:93-103): refine where the
    dataset value is positive and the cell is still coarser than the
    threshold area."""
    return (depth_values > 0.0) & (areas > area_threshold)


def perform_amr(sim, marked: np.ndarray) -> None:
    """RDyPerformAMR (rdyamr.c:482+): refine, transfer state, rebuild."""
    new_mesh, parent = refine_marked(sim.mesh, marked)
    if new_mesh is sim.mesh:
        return
    q = sim.get_solution()[:, parent]  # piecewise-constant injection
    src = np.asarray(sim.ext_src)[:, parent]
    mannings = sim.mannings_n[parent]

    # compose the fine -> level-0 base map (the refine tree of rdyamr.c:95,
    # used to inject base-mesh datasets onto the current mesh)
    base_map = getattr(sim, "amr_base_map", None)
    if base_map is None:
        base_map = np.arange(sim.mesh.num_cells)
    new_base_map = base_map[parent]

    sim.rebuild_on_mesh(new_mesh, mannings)
    sim.amr_base_map = new_base_map
    sim.set_solution(q)
    import jax.numpy as jnp

    sim.ext_src = jnp.asarray(src, dtype=sim.dtype)
    sim.log.info(
        f"AMR: refined {int(np.asarray(marked).sum())} cells -> "
        f"{new_mesh.num_cells} total cells"
    )
