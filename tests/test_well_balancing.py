"""Well-balancing tests: HR exactness + BS2002 eta/correction consistency."""

import jax.numpy as jnp
import numpy as np

from rdycore_tpu.mesh import structured_tri
from rdycore_tpu.operator import build_operator


def bumpy(x, y):
    return 0.3 * np.sin(x) * np.cos(y) + 0.02 * x


def test_hr_lake_at_rest_exact():
    """Hydrostatic reconstruction must keep still water exactly still on
    arbitrary bathymetry (the property behind levee.hr.yaml)."""
    mesh = structured_tri(12, 10, 0, 12, 0, 10, z_fn=bumpy)
    op = build_operator(
        mesh, mannings_n=np.zeros(mesh.num_cells), well_balancing_hr=True
    )
    h0 = np.maximum(2.0 - mesh.cell_z, 0.0)
    q0 = jnp.zeros((3, mesh.num_cells)).at[0].set(h0)
    res = op.apply(q0, 0.01, op.zero_boundary_values(), jnp.zeros_like(q0))
    assert float(jnp.abs(res.rhs).max()) < 1e-12


def test_hr_partially_wet_lake_at_rest():
    """HR well-balancing with wetting/drying: still water below a partially
    emerged bump stays still."""
    mesh = structured_tri(16, 12, 0, 16, 0, 12, z_fn=lambda x, y: bumpy(x, y) + 0.0)
    op = build_operator(
        mesh, mannings_n=np.zeros(mesh.num_cells), well_balancing_hr=True
    )
    eta0 = 0.15  # below the bump peaks -> some cells dry
    h0 = np.maximum(eta0 - mesh.cell_z, 0.0)
    assert (h0 == 0).any() and (h0 > 0).any()
    q0 = jnp.zeros((3, mesh.num_cells)).at[0].set(h0)
    res = op.apply(q0, 0.01, op.zero_boundary_values(), jnp.zeros_like(q0))
    assert float(jnp.abs(res.rhs).max()) < 1e-12


def test_bs2002_eta_submerged_lake_at_rest():
    """For a fully submerged lake at rest, the BS2002 vertex eta must equal
    the free-surface elevation exactly (all-vertices-submerged branch of
    SWEEtaVertex)."""
    from rdycore_tpu.ops.swe.bs2002 import eta_vertices

    mesh = structured_tri(10, 8, 0, 10, 0, 8, z_fn=bumpy)
    op = build_operator(
        mesh, mannings_n=np.zeros(mesh.num_cells), well_balancing_bs2002=True
    )
    eta0 = 3.0  # well above the bathymetry everywhere
    h0 = eta0 - mesh.cell_z
    eta_v = eta_vertices(op.arrays.bs2002, jnp.asarray(h0), 1e-7)
    np.testing.assert_allclose(np.asarray(eta_v), eta0, atol=1e-12)


def test_bs2002_correction_changes_momentum_flux_only():
    """BS2002 must leave the mass flux untouched and change momentum fluxes
    by exactly g*dhv^2/24*(cn, sn)."""
    mesh = structured_tri(8, 6, 0, 8, 0, 6, z_fn=bumpy)
    rng = np.random.default_rng(2)
    q0 = np.zeros((3, mesh.num_cells))
    q0[0] = 1.0 + rng.random(mesh.num_cells)
    q0 = jnp.asarray(q0)

    op0 = build_operator(mesh, mannings_n=np.zeros(mesh.num_cells))
    op1 = build_operator(
        mesh, mannings_n=np.zeros(mesh.num_cells), well_balancing_bs2002=True
    )
    r0 = op0.apply(q0, 0.01, op0.zero_boundary_values(), jnp.zeros_like(q0))
    r1 = op1.apply(q0, 0.01, op1.zero_boundary_values(), jnp.zeros_like(q0))
    # mass flux divergence identical
    np.testing.assert_allclose(
        np.asarray(r0.flux_div[0]), np.asarray(r1.flux_div[0]), atol=1e-13
    )
    # momentum divergence differs (on bumpy bathymetry dhv != 0)
    assert not np.allclose(
        np.asarray(r0.flux_div[1]), np.asarray(r1.flux_div[1])
    )


def test_bs2002_flat_bed_is_inactive():
    """On flat bathymetry with uniform h, dhv == 0 so BS2002 is a no-op."""
    mesh = structured_tri(8, 6)
    q0 = jnp.zeros((3, mesh.num_cells)).at[0].set(1.5)
    op0 = build_operator(mesh, mannings_n=np.zeros(mesh.num_cells))
    op1 = build_operator(
        mesh, mannings_n=np.zeros(mesh.num_cells), well_balancing_bs2002=True
    )
    r0 = op0.apply(q0, 0.01, op0.zero_boundary_values(), jnp.zeros_like(q0))
    r1 = op1.apply(q0, 0.01, op1.zero_boundary_values(), jnp.zeros_like(q0))
    np.testing.assert_allclose(
        np.asarray(r0.rhs), np.asarray(r1.rhs), atol=1e-13
    )
