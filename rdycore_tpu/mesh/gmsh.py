"""Gmsh 4.1 ASCII (.msh) reader.

The reference loads .msh files through DMPlex (`-dm_plex_filename`,
rdydm.c:82-110); physical surface groups become cell regions and physical
curve groups become boundary edge sets, which is exactly how the reference
maps grid_region_id / grid_boundary_id (rdysetup.c:201-503).

This is a from-scratch reader for the subset RDycore uses: 2-D meshes with
triangle/quad elements, physical names, format 4.1 ASCII.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .core import Mesh, build_mesh


def read_gmsh(path: str) -> Mesh:
    with open(path, "r") as f:
        text = f.read()
    sections = _split_sections(text)

    if "MeshFormat" not in sections:
        raise ValueError(f"{path}: not a Gmsh file")
    version = sections["MeshFormat"][0].split()[0]
    if not version.startswith("4"):
        raise ValueError(f"{path}: unsupported Gmsh format {version} (need 4.x)")

    # physical names: (dim, id) -> name
    phys_names: Dict[tuple, str] = {}
    if "PhysicalNames" in sections:
        lines = sections["PhysicalNames"]
        n = int(lines[0])
        for line in lines[1 : 1 + n]:
            parts = line.split(maxsplit=2)
            dim, tag = int(parts[0]), int(parts[1])
            name = parts[2].strip().strip('"')
            phys_names[(dim, tag)] = name

    # entities: (dim, entity_tag) -> [physical tags]
    entity_phys: Dict[tuple, list] = {}
    if "Entities" in sections:
        lines = sections["Entities"]
        counts = list(map(int, lines[0].split()))
        np_, nc, ns = counts[0], counts[1], counts[2]
        ln = 1
        for _ in range(np_):  # points: tag x y z numPhys phys...
            parts = lines[ln].split()
            ln += 1
            tag = int(parts[0])
            nphys = int(parts[4])
            entity_phys[(0, tag)] = [int(x) for x in parts[5 : 5 + nphys]]
        for dim, cnt in ((1, nc), (2, ns)):
            for _ in range(cnt):
                parts = lines[ln].split()
                ln += 1
                tag = int(parts[0])
                nphys = int(parts[7])
                entity_phys[(dim, tag)] = [int(x) for x in parts[8 : 8 + nphys]]

    # nodes
    lines = sections["Nodes"]
    nblocks, nnodes = int(lines[0].split()[0]), int(lines[0].split()[1])
    max_tag = int(lines[0].split()[3])
    coords = np.zeros((max_tag + 1, 3))
    seen = np.zeros(max_tag + 1, dtype=bool)
    ln = 1
    for _ in range(nblocks):
        nb = int(lines[ln].split()[3])
        ln += 1
        tags = [int(lines[ln + i]) for i in range(nb)]
        ln += nb
        for i in range(nb):
            xyz = list(map(float, lines[ln + i].split()[:3]))
            coords[tags[i]] = xyz
            seen[tags[i]] = True
        ln += nb
    tag_ids = np.nonzero(seen)[0]
    remap = -np.ones(max_tag + 1, dtype=np.int64)
    remap[tag_ids] = np.arange(len(tag_ids))
    points = coords[tag_ids]

    # elements
    lines = sections["Elements"]
    nblocks = int(lines[0].split()[0])
    ln = 1
    cells = []  # (entity_tag, [v...])
    cell_entity = []
    bnd_segments = []  # (entity_tag, v0, v1)
    for _ in range(nblocks):
        hdr = lines[ln].split()
        ln += 1
        edim, etag, etype, nb = int(hdr[0]), int(hdr[1]), int(hdr[2]), int(hdr[3])
        for i in range(nb):
            parts = list(map(int, lines[ln + i].split()))
            nodes = parts[1:]
            if etype == 1 and edim == 1:  # 2-node line
                bnd_segments.append((etag, nodes[0], nodes[1]))
            elif etype == 2 and edim == 2:  # 3-node triangle
                cells.append(nodes[:3] + [-1])
                cell_entity.append(etag)
            elif etype == 3 and edim == 2:  # 4-node quad
                cells.append(nodes[:4])
                cell_entity.append(etag)
            # ignore points / higher-order
        ln += nb

    cell_vertices = np.asarray(cells, dtype=np.int64)
    pad = cell_vertices < 0
    cell_vertices = np.where(pad, 0, remap[np.where(pad, 0, cell_vertices)])
    cell_vertices = np.where(pad, -1, cell_vertices).astype(np.int32)
    cell_entity = np.asarray(cell_entity)

    # map surface entities -> physical region ids -> named regions
    regions: Dict[str, np.ndarray] = {}
    ent_tags = np.unique(cell_entity)
    for ent in ent_tags:
        for phys in entity_phys.get((2, int(ent)), []):
            name = phys_names.get((2, phys), f"region_{phys}")
            ids = np.nonzero(cell_entity == ent)[0].astype(np.int32)
            regions.setdefault(name, []).append(ids)  # type: ignore[arg-type]
            regions.setdefault(f"__id_{phys}", []).append(ids)  # type: ignore[arg-type]
    regions = {k: np.sort(np.concatenate(v)) for k, v in regions.items()}

    # boundary curves -> physical boundary sets (vertex pairs)
    boundary: Dict[str, np.ndarray] = {}
    for etag, v0, v1 in bnd_segments:
        for phys in entity_phys.get((1, etag), []):
            name = phys_names.get((1, phys), f"boundary_{phys}")
            pair = (int(remap[v0]), int(remap[v1]))
            boundary.setdefault(name, []).append(pair)  # type: ignore[arg-type]
            boundary.setdefault(f"__id_{phys}", []).append(pair)  # type: ignore[arg-type]
    boundary = {k: np.asarray(v, dtype=np.int64) for k, v in boundary.items()}

    return build_mesh(points, cell_vertices, regions=regions, boundary_edges=boundary)


def _split_sections(text: str) -> Dict[str, list]:
    sections = {}
    lines = text.splitlines()
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if line.startswith("$") and not line.startswith("$End"):
            name = line[1:]
            j = i + 1
            body = []
            while j < len(lines) and lines[j].strip() != f"$End{name}":
                body.append(lines[j].strip())
                j += 1
            sections[name] = body
            i = j + 1
        else:
            i += 1
    return sections
