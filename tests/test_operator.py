"""Operator-level physics tests (jnp twin backend, f64 on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rdycore_tpu.mesh import read_gmsh, structured_quad
from rdycore_tpu.operator import build_operator
from rdycore_tpu.ops.swe.boundary import (
    BC_CRITICAL_OUTFLOW,
    BC_DIRICHLET,
    BC_REFLECTING,
)
from rdycore_tpu.timestepping import make_interval_advancer

MESH = "/root/reference/share/meshes/planar_dam_10x5.msh"


def dam_break_setup():
    mesh = read_gmsh(MESH)
    op = build_operator(
        mesh,
        bc_types={
            "boundary": BC_REFLECTING,
            "top_wall": BC_REFLECTING,
            "bottom_wall": BC_CRITICAL_OUTFLOW,
        },
        mannings_n=np.full(mesh.num_cells, 0.015),
    )
    q0 = np.zeros((3, mesh.num_cells))
    q0[0, mesh.regions["upstream"]] = 10.0
    q0[0, mesh.regions["downstream"]] = 5.0
    return mesh, op, jnp.asarray(q0)


def test_rhs_no_nan_and_antisymmetry():
    mesh, op, q0 = dam_break_setup()
    res = op.apply(q0, 0.01, op.zero_boundary_values(), jnp.zeros_like(q0))
    assert np.isfinite(np.asarray(res.rhs)).all()
    # with all-reflecting walls replaced: mass change = boundary fluxes only.
    # interior fluxes must cancel in the area-weighted sum (conservation).
    area = np.asarray(op.arrays.area)
    dmass = float((np.asarray(res.flux_div[0]) * area).sum())
    # boundary flux contribution: sum over boundary edges of f_h * len
    bl = np.asarray(op.arrays.bnd_len)
    bf = np.asarray(res.boundary_fluxes[0])
    assert dmass == pytest.approx(-float((bf * bl).sum()), rel=1e-10, abs=1e-10)


def test_lake_at_rest_flat_bed():
    """Still water on a flat bed must stay exactly still."""
    mesh = structured_quad(8, 6, 0, 8, 0, 6)
    op = build_operator(mesh, mannings_n=np.full(mesh.num_cells, 0.02))
    q0 = jnp.zeros((3, mesh.num_cells)).at[0].set(2.0)
    res = op.apply(q0, 0.01, op.zero_boundary_values(), jnp.zeros_like(q0))
    assert np.abs(np.asarray(res.rhs)).max() < 1e-12


def test_dam_break_euler_steps():
    mesh, op, q0 = dam_break_setup()
    adv = make_interval_advancer(op, "euler")
    bnd = op.zero_boundary_values()
    src = jnp.zeros_like(q0)
    res = adv(op.arrays, q0, 0.0, 0.01, 50, 0.5, bnd, src)
    q = np.asarray(res.q)
    assert np.isfinite(q).all()
    assert float(res.t) == pytest.approx(0.5)
    # water must flow from upstream (h=10) to downstream (h=5)
    up = mesh.regions["upstream"]
    down = mesh.regions["downstream"]
    assert q[0, up].mean() < 10.0
    # ... surging somewhere downstream above the initial 5.0 level (the
    # downstream *mean* can drop: the bottom wall is critical outflow)
    assert q[0, down].max() > 5.0
    # depth stays positive
    assert q[0].min() > 0.0
    # Courant diagnostics populated
    assert float(res.max_courant) > 0.0


def test_rk4_more_accurate_than_euler():
    mesh, op, q0 = dam_break_setup()
    bnd = op.zero_boundary_values()
    src = jnp.zeros_like(q0)
    adv_e = make_interval_advancer(op, "euler")
    adv_r = make_interval_advancer(op, "rk4")
    # reference solution: tiny-dt euler
    ref = adv_e(op.arrays, q0, 0.0, 0.0005, 400, 0.2, bnd, src).q
    qe = adv_e(op.arrays, q0, 0.0, 0.01, 20, 0.2, bnd, src).q
    qr = adv_r(op.arrays, q0, 0.0, 0.01, 20, 0.2, bnd, src).q
    err_e = float(jnp.abs(qe[0] - ref[0]).max())
    err_r = float(jnp.abs(qr[0] - ref[0]).max())
    assert err_r < err_e


def test_mass_conservation_reflecting_box():
    """All-reflecting box: total water volume is conserved exactly."""
    mesh = structured_quad(10, 10)
    op = build_operator(mesh, mannings_n=np.zeros(mesh.num_cells))
    rng = np.random.default_rng(0)
    q0 = np.zeros((3, mesh.num_cells))
    q0[0] = 1.0 + 0.5 * rng.random(mesh.num_cells)
    q0 = jnp.asarray(q0)
    area = np.asarray(op.arrays.area)
    m0 = float((np.asarray(q0[0]) * area).sum())
    adv = make_interval_advancer(op, "euler")
    res = adv(op.arrays, q0, 0.0, 1e-3, 100, 0.1, op.zero_boundary_values(), jnp.zeros_like(q0))
    m1 = float((np.asarray(res.q[0]) * area).sum())
    assert m1 == pytest.approx(m0, rel=1e-12)


def test_dirichlet_inflow():
    mesh = structured_quad(10, 4, 0, 10, 0, 4)
    bnd_types = {"left": BC_DIRICHLET, "right": BC_CRITICAL_OUTFLOW}
    op = build_operator(mesh, bc_types=bnd_types, mannings_n=np.zeros(mesh.num_cells))
    q0 = jnp.zeros((3, mesh.num_cells)).at[0].set(0.5)
    # find the left segment slice
    seg = {s.name: s for s in op.segments}["left"]
    bnd = np.zeros((3, op.num_boundary_edges))
    bnd[0, seg.start : seg.start + seg.count] = 1.0  # h = 1
    bnd[1, seg.start : seg.start + seg.count] = 1.0  # hu = 1 (inflow, +x)
    adv = make_interval_advancer(op, "euler")
    res = adv(op.arrays, q0, 0.0, 0.01, 100, 1.0, jnp.asarray(bnd), jnp.zeros_like(q0))
    q = np.asarray(res.q)
    assert np.isfinite(q).all()
    # momentum enters the domain
    assert q[1].sum() > 0.0
