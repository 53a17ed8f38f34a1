from .core import MAX_CELL_EDGES, Mesh, build_mesh
from .generate import refine_uniform, structured_quad, structured_tri
from .gmsh import read_gmsh

__all__ = [
    "MAX_CELL_EDGES",
    "Mesh",
    "build_mesh",
    "read_gmsh",
    "refine_uniform",
    "structured_quad",
    "structured_tri",
]
