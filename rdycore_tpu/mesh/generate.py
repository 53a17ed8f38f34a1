"""Programmatic structured mesh generation + uniform refinement.

The reference refines meshes at runtime through DMPlex (`-ref_dm_refine`,
rdydm.c:124-145) for MMS convergence studies and scaling ladders. Here we
generate quad/tri meshes directly and refine by regenerating at higher
resolution (for generated meshes) or by subdividing (for file meshes).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

from .core import Mesh, build_mesh


def structured_quad(
    nx: int,
    ny: int,
    xmin: float = 0.0,
    xmax: float = 1.0,
    ymin: float = 0.0,
    ymax: float = 1.0,
    z_fn: Optional[Callable[[np.ndarray, np.ndarray], np.ndarray]] = None,
    region_fn: Optional[Callable[[np.ndarray, np.ndarray], np.ndarray]] = None,
) -> Mesh:
    """A structured quad mesh on [xmin,xmax] x [ymin,ymax].

    Boundaries are named 'left', 'right', 'bottom', 'top'. ``z_fn(x, y)``
    gives vertex bed elevation; ``region_fn(cx, cy)`` maps cell centers to
    integer region ids exposed as regions {'region_<id>': cells}.
    """
    xs = np.linspace(xmin, xmax, nx + 1)
    ys = np.linspace(ymin, ymax, ny + 1)
    X, Y = np.meshgrid(xs, ys, indexing="xy")  # [ny+1, nx+1]
    pts = np.stack([X.ravel(), Y.ravel()], axis=1)
    if z_fn is not None:
        z = np.asarray(z_fn(pts[:, 0], pts[:, 1]))
    else:
        z = np.zeros(len(pts))
    points = np.concatenate([pts, z[:, None]], axis=1)

    def vid(i, j):  # i: x index, j: y index
        return j * (nx + 1) + i

    I, J = np.meshgrid(np.arange(nx), np.arange(ny), indexing="xy")
    i = I.ravel()
    j = J.ravel()
    # CCW: (i,j), (i+1,j), (i+1,j+1), (i,j+1)
    cells = np.stack(
        [vid(i, j), vid(i + 1, j), vid(i + 1, j + 1), vid(i, j + 1)], axis=1
    ).astype(np.int32)

    boundary = {
        "bottom": np.stack([vid(np.arange(nx), 0), vid(np.arange(1, nx + 1), 0)], axis=1),
        "top": np.stack(
            [vid(np.arange(nx), ny), vid(np.arange(1, nx + 1), ny)], axis=1
        ),
        "left": np.stack([vid(0, np.arange(ny)), vid(0, np.arange(1, ny + 1))], axis=1),
        "right": np.stack(
            [vid(nx, np.arange(ny)), vid(nx, np.arange(1, ny + 1))], axis=1
        ),
    }

    regions: Dict[str, np.ndarray] = {}
    if region_fn is not None:
        cx = (xs[i] + xs[i + 1]) / 2.0
        cy = (ys[j] + ys[j + 1]) / 2.0
        rid = np.asarray(region_fn(cx, cy)).astype(np.int64)
        for r in np.unique(rid):
            ids = np.nonzero(rid == r)[0].astype(np.int32)
            regions[f"region_{int(r)}"] = ids
            regions[f"__id_{int(r)}"] = ids  # grid_region_id lookup alias

    return build_mesh(points, cells, regions=regions, boundary_edges=boundary)


def structured_tri(
    nx: int,
    ny: int,
    xmin: float = 0.0,
    xmax: float = 1.0,
    ymin: float = 0.0,
    ymax: float = 1.0,
    z_fn: Optional[Callable[[np.ndarray, np.ndarray], np.ndarray]] = None,
) -> Mesh:
    """A structured triangle mesh (each quad split along its diagonal)."""
    xs = np.linspace(xmin, xmax, nx + 1)
    ys = np.linspace(ymin, ymax, ny + 1)
    X, Y = np.meshgrid(xs, ys, indexing="xy")
    pts = np.stack([X.ravel(), Y.ravel()], axis=1)
    z = np.asarray(z_fn(pts[:, 0], pts[:, 1])) if z_fn else np.zeros(len(pts))
    points = np.concatenate([pts, z[:, None]], axis=1)

    def vid(i, j):
        return j * (nx + 1) + i

    I, J = np.meshgrid(np.arange(nx), np.arange(ny), indexing="xy")
    i = I.ravel()
    j = J.ravel()
    t1 = np.stack([vid(i, j), vid(i + 1, j), vid(i + 1, j + 1)], axis=1)
    t2 = np.stack([vid(i, j), vid(i + 1, j + 1), vid(i, j + 1)], axis=1)
    cells = np.concatenate([t1, t2], axis=0).astype(np.int32)

    boundary = {
        "bottom": np.stack([vid(np.arange(nx), 0), vid(np.arange(1, nx + 1), 0)], axis=1),
        "top": np.stack([vid(np.arange(nx), ny), vid(np.arange(1, nx + 1), ny)], axis=1),
        "left": np.stack([vid(0, np.arange(ny)), vid(0, np.arange(1, ny + 1))], axis=1),
        "right": np.stack([vid(nx, np.arange(ny)), vid(nx, np.arange(1, ny + 1))], axis=1),
    }
    return build_mesh(points, cells, boundary_edges=boundary)


def refine_uniform(mesh: Mesh, times: int = 1) -> Mesh:
    """Uniform red refinement: quads -> 4 quads, triangles -> 4 triangles.

    The TPU-native analogue of DMPlex runtime refinement (rdydm.c:124-145).
    Region/boundary labels are propagated to children.
    """
    out = mesh
    for _ in range(times):
        out = _refine_once(out)
    return out


def _refine_once(mesh: Mesh) -> Mesh:
    pts = mesh.points
    NV = len(pts)
    C = mesh.num_cells

    # midpoint vertex for every edge (keyed by vertex pair)
    ev = mesh.edge_vertices
    lo = np.minimum(ev[:, 0], ev[:, 1]).astype(np.int64)
    hi = np.maximum(ev[:, 0], ev[:, 1]).astype(np.int64)
    mid_pts = (pts[ev[:, 0]] + pts[ev[:, 1]]) / 2.0
    mid_id = NV + np.arange(mesh.num_edges)
    key2mid = dict(zip((lo * NV + hi).tolist(), mid_id.tolist()))

    def midpoint(a, b):
        a64, b64 = int(a), int(b)
        return key2mid[min(a64, b64) * NV + max(a64, b64)]

    new_points = [pts, mid_pts]
    centroid_ids = {}
    centroid_pts = []
    next_id = NV + mesh.num_edges
    # cell centroid vertices for quads
    quad_cells = np.nonzero(mesh.cell_num_vertices == 4)[0]
    for c in quad_cells:
        centroid_ids[int(c)] = next_id
        next_id += 1
    if len(quad_cells):
        # use polygon centroid with z from vertex mean (planar assumption)
        cpts = mesh.cell_centroid[quad_cells].copy()
        centroid_pts.append(cpts)
        new_points.append(cpts)
    points = np.concatenate(new_points, axis=0)

    new_cells = []
    parent = []
    for c in range(C):
        nv = int(mesh.cell_num_vertices[c])
        v = mesh.cell_vertices[c, :nv]
        if nv == 3:
            m01 = midpoint(v[0], v[1])
            m12 = midpoint(v[1], v[2])
            m20 = midpoint(v[2], v[0])
            new_cells += [
                [v[0], m01, m20, -1],
                [v[1], m12, m01, -1],
                [v[2], m20, m12, -1],
                [m01, m12, m20, -1],
            ]
        else:
            cc = centroid_ids[int(c)]
            m01 = midpoint(v[0], v[1])
            m12 = midpoint(v[1], v[2])
            m23 = midpoint(v[2], v[3])
            m30 = midpoint(v[3], v[0])
            new_cells += [
                [v[0], m01, cc, m30],
                [v[1], m12, cc, m01],
                [v[2], m23, cc, m12],
                [v[3], m30, cc, m23],
            ]
        parent += [c] * 4
    new_cells = np.asarray(new_cells, dtype=np.int32)
    parent = np.asarray(parent)

    # propagate regions
    regions = {}
    child_of = {}
    for idx in range(len(parent)):
        child_of.setdefault(parent[idx], []).append(idx)
    for name, cids in mesh.regions.items():
        kids = np.concatenate([np.asarray(child_of[int(c)]) for c in cids]) if len(cids) else np.zeros(0)
        regions[name] = np.sort(kids).astype(np.int32)

    # propagate boundaries: each boundary edge (a, b) becomes (a, m) and (m, b)
    boundary = {}
    for name, eids in mesh.boundaries.items():
        pairs = []
        for e in eids:
            va, vb = mesh.edge_vertices[e]
            m = midpoint(va, vb)
            pairs.append([va, m])
            pairs.append([m, vb])
        boundary[name] = np.asarray(pairs, dtype=np.int64) if pairs else np.zeros((0, 2), np.int64)

    return build_mesh(points, new_cells, regions=regions, boundary_edges=boundary)
