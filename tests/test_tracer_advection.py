"""Passive-tracer advection in uniform flow: the tracer's center of mass
must translate at exactly the flow velocity (conservative advection keeps
the first moment exact even while first-order upwinding smears the
blob), and tracer mass is conserved away from the boundaries."""

import jax.numpy as jnp
import numpy as np

from rdycore_tpu.mesh import structured_quad
from rdycore_tpu.operator import build_operator
from rdycore_tpu.ops.swe.boundary import BC_DIRICHLET
from rdycore_tpu.timestepping import make_interval_advancer

H = 2.0
U = 1.0


def test_tracer_blob_advects_at_flow_speed():
    nx, ny = 160, 24
    mesh = structured_quad(nx, ny, 0.0, 40.0, 0.0, 6.0)
    x = mesh.cell_centroid[:, 0]
    y = mesh.cell_centroid[:, 1]

    op = build_operator(
        mesh, mannings_n=np.zeros(mesh.num_cells),
        num_tracers=1, num_sediment=0,  # passive (salinity-like)
        bc_types={"left": BC_DIRICHLET, "right": BC_DIRICHLET},
    )
    c0 = np.exp(-((x - 8.0) ** 2 + (y - 3.0) ** 2) / 2.0)
    q0 = jnp.zeros((4, mesh.num_cells))
    q0 = q0.at[0].set(H).at[1].set(H * U).at[3].set(H * c0)

    bv = np.zeros((4, op.num_boundary_edges))
    bv[0] = H
    bv[1] = H * U  # steady uniform inflow/outflow, zero tracer inflow
    bv = jnp.asarray(bv)

    adv = make_interval_advancer(op, "euler")
    t_end = 16.0  # blob moves 8 -> 24, stays away from both ends
    dt = 0.02  # CFL ~ 0.43: c + u ~ 5.4, dx = 0.25
    n_steps = int(round(t_end / dt))
    res = adv(op.arrays, q0, 0.0, dt, n_steps, t_end, bv,
              jnp.zeros_like(q0))

    hc1 = np.asarray(res.q[3])
    area = mesh.cell_area
    assert np.isfinite(hc1).all()
    # tracer mass conserved (blob never reaches a boundary)
    m0 = float((H * c0 * area).sum())
    m1 = float((hc1 * area).sum())
    np.testing.assert_allclose(m1, m0, rtol=1e-10)
    # center of mass translated by exactly U * t
    x0 = float((H * c0 * area * x).sum()) / m0
    x1 = float((hc1 * area * x).sum()) / m1
    assert abs((x1 - x0) - U * t_end) < 0.05 * U * t_end, (x0, x1)
    # no transverse drift
    y0 = float((H * c0 * area * y).sum()) / m0
    y1 = float((hc1 * area * y).sum()) / m1
    assert abs(y1 - y0) < 0.05


def test_sediment_blob_deposits():
    """The same blob declared as a SEDIMENT class loses mass to
    deposition (Hairsine-Rose-style settling) — intended physics, in
    contrast with the passive tracer above."""
    nx, ny = 80, 12
    mesh = structured_quad(nx, ny, 0.0, 40.0, 0.0, 6.0)
    x = mesh.cell_centroid[:, 0]
    y = mesh.cell_centroid[:, 1]
    op = build_operator(
        mesh, mannings_n=np.zeros(mesh.num_cells),
        num_tracers=1, num_sediment=1,
        bc_types={"left": BC_DIRICHLET, "right": BC_DIRICHLET},
    )
    c0 = np.exp(-((x - 8.0) ** 2 + (y - 3.0) ** 2) / 2.0)
    q0 = jnp.zeros((4, mesh.num_cells))
    q0 = q0.at[0].set(H).at[1].set(H * U).at[3].set(H * c0)
    bv = np.zeros((4, op.num_boundary_edges))
    bv[0] = H
    bv[1] = H * U
    adv = make_interval_advancer(op, "euler")
    res = adv(op.arrays, q0, 0.0, 0.02, 200, 1e9, jnp.asarray(bv),
              jnp.zeros_like(q0))
    m0 = float((H * c0 * mesh.cell_area).sum())
    m1 = float((np.asarray(res.q[3]) * mesh.cell_area).sum())
    assert m1 < 0.995 * m0  # deposition sink active
    assert m1 > 0.5 * m0  # but bounded over 4 s
