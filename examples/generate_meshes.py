"""Generate the standalone example meshes (native .npz format).

Run once: python examples/generate_meshes.py
"""

import os

import numpy as np

from rdycore_tpu.mesh import structured_quad, structured_tri
from rdycore_tpu.mesh.core import save_mesh_npz

HERE = os.path.dirname(os.path.abspath(__file__))


def dam_break(nx=200, ny=100):
    """Idealized dam break: water column on the left half of a flat basin
    (the reference's flagship scaling case at laboratory scale)."""
    Lx, Ly = 2.0, 1.0
    mesh = structured_quad(
        nx, ny, 0.0, Lx, 0.0, Ly,
        region_fn=lambda cx, cy: np.where(cx < Lx / 2, 1, 2),
    )
    save_mesh_npz(mesh, os.path.join(HERE, "dam_break.npz"))
    print(f"dam_break.npz: {mesh.num_cells} cells")


def parabolic_bowl(n=80):
    """Thacker parabolic bowl: wetting/drying oscillation with an analytic
    solution family."""
    L = 4.0
    h0, a = 0.1, 1.0

    def z_fn(x, y):
        r2 = (x - L / 2) ** 2 + (y - L / 2) ** 2
        return h0 * r2 / (a * a)

    mesh = structured_tri(n, n, 0.0, L, 0.0, L, z_fn=z_fn)
    save_mesh_npz(mesh, os.path.join(HERE, "parabolic_bowl.npz"))
    print(f"parabolic_bowl.npz: {mesh.num_cells} cells")


def mms_grid(n=20):
    """[0,5]^2 triangle grid matching the reference's MMS base mesh."""
    mesh = structured_tri(n, n, 0.0, 5.0, 0.0, 5.0)
    save_mesh_npz(mesh, os.path.join(HERE, "mms_triangles.npz"))
    print(f"mms_triangles.npz: {mesh.num_cells} cells")


if __name__ == "__main__":
    dam_break()
    parabolic_bowl()
    mms_grid()
