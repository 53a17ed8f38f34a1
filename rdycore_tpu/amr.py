"""Adaptive mesh refinement (src/rdyamr.c + driver/amr.c).

The reference marks owned cells (from time-stamped refinement rasters:
value > 0 and cell area above a threshold, amr.c:78-110), adapts the DMPlex
mesh with transition cells (DMAdaptLabel), interpolates state through
coarse->fine matrices, and rebuilds the operator/TS (rdyamr.c:482+).

TPU-native equivalent, conforming RED-GREEN refinement on tri / quad /
mixed meshes:
  - marked triangles split into 4 similar children (RED); marked quads
    split 1:4 through the edge midpoints and centroid (RED)
  - closure: any cell with >= 2 refined edges is promoted to RED; with
    exactly 1 refined edge a triangle is bisected (GREEN) and a quad is
    fan-triangulated about its centroid (5 transition triangles) — the
    DMAdaptLabel transition-cell analogue (rdyamr.c:161-223)
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
    """Red-green refine the marked cells of a tri / quad / mixed mesh.

    Returns (new_mesh, parent): parent[i] = coarse cell id of fine cell i.
    """
    C = mesh.num_cells
    marked = np.asarray(marked, dtype=bool)
    if marked.shape != (C,):
        raise ValueError(f"marked must have shape ({C},)")
    if not marked.any():
        return mesh, np.arange(C)
    nvs = mesh.cell_num_vertices

    # --- closure iteration: decide RED cells -------------------------------
    red = marked.copy()
    # cell -> its edges (mesh.cell_edges has dummy padding = num_edges;
    # the dummy entry is force-cleared after each scatter so triangle
    # padding slots never count as refined edges)
    ce = mesh.cell_edges[:, :4]
    E = mesh.num_edges
    while True:
        edge_refined = np.zeros(E + 1, dtype=bool)
        edge_refined[ce[red].ravel()] = True
        edge_refined[E] = False
        n_refined_edges = edge_refined[ce].sum(axis=1)
        promote = (~red) & (n_refined_edges >= 2)
        if not promote.any():
            break
        red |= promote
    n1 = (~red) & (edge_refined[ce].sum(axis=1) == 1)
    green_t = n1 & (nvs == 3)  # triangle bisection
    fan_q = n1 & (nvs == 4)  # quad centroid-fan transition

    # --- new vertices: refined-edge midpoints + split-quad centroids -------
    pts = mesh.points
    NV = len(pts)
    refined_edges = np.nonzero(edge_refined[:E])[0]
    mid_id = {}
    new_pts = [pts]
    for i, e in enumerate(refined_edges):
        mid_id[int(e)] = NV + i
    if len(refined_edges):
        ev = mesh.edge_vertices[refined_edges]
        new_pts.append((pts[ev[:, 0]] + pts[ev[:, 1]]) / 2.0)
    ctr_cells = np.nonzero((red | fan_q) & (nvs == 4))[0]
    ctr_id = {}
    base = NV + len(refined_edges)
    for i, c in enumerate(ctr_cells):
        ctr_id[int(c)] = base + i
    if len(ctr_cells):
        new_pts.append(mesh.cell_centroid[ctr_cells])
    points = np.concatenate(new_pts, axis=0)

    # edge lookup: cell slot k -> edge id (mesh.cell_edges is in mesh edge
    # order; slots follow the CCW vertex order (v_k, v_{k+1}))
    new_cells = []
    parent = []

    def emit(vlist, p):
        new_cells.append(list(vlist) + [-1] * (4 - len(vlist)))
        parent.append(p)

    for c in range(C):
        nv = int(nvs[c])
        v = mesh.cell_vertices[c, :nv]
        edges = [int(ce[c, k]) for k in range(nv)]
        if red[c] and nv == 3:
            m01 = mid_id[edges[0]]
            m12 = mid_id[edges[1]]
            m20 = mid_id[edges[2]]
            emit([v[0], m01, m20], c)
            emit([v[1], m12, m01], c)
            emit([v[2], m20, m12], c)
            emit([m01, m12, m20], c)
        elif red[c]:  # quad 1:4 through midpoints + centroid
            m = [mid_id[e] for e in edges]
            ctr = ctr_id[c]
            for k in range(4):
                emit([v[k], m[k], ctr, m[(k - 1) % 4]], c)
        elif green_t[c]:
            # bisect across the single refined edge
            for k, e in enumerate(edges):
                if edge_refined[e]:
                    a, b = v[k], v[(k + 1) % 3]
                    opp = v[(k + 2) % 3]
                    m = mid_id[e]
                    emit([a, m, opp], c)
                    emit([m, b, opp], c)
                    break
        elif fan_q[c]:
            # conforming quad transition: fan triangles about the centroid
            # (the refined edge contributes two, the others one each)
            ctr = ctr_id[c]
            for k in range(4):
                a, b = v[k], v[(k + 1) % 4]
                e = edges[k]
                if edge_refined[e]:
                    m = mid_id[e]
                    emit([a, m, ctr], c)
                    emit([m, b, ctr], c)
                else:
                    emit([a, b, ctr], c)
        else:
            emit(v.tolist(), c)
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
