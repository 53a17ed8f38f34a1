"""The structured fast path must match the unstructured operator exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from rdycore_tpu.mesh import structured_quad
from rdycore_tpu.operator import build_operator
from rdycore_tpu.ops.structured import (
    build_structured_operator,
    make_structured_stepper,
)
from rdycore_tpu.ops.swe.boundary import BC_CRITICAL_OUTFLOW, BC_REFLECTING
from rdycore_tpu.timestepping import make_interval_advancer


@pytest.mark.parametrize("bc_right", [BC_REFLECTING, BC_CRITICAL_OUTFLOW])
def test_structured_matches_unstructured(bc_right):
    nx, ny = 24, 16
    dx = dy = 0.5
    mesh = structured_quad(nx, ny, 0, nx * dx, 0, ny * dy)
    mann = np.full(mesh.num_cells, 0.02)
    rng = np.random.default_rng(7)
    q0 = np.zeros((3, mesh.num_cells))
    q0[0] = 1.0 + rng.random(mesh.num_cells)
    q0[1] = 0.2 * rng.standard_normal(mesh.num_cells)
    q0[2] = 0.2 * rng.standard_normal(mesh.num_cells)

    op_u = build_operator(
        mesh, bc_types={"right": bc_right}, mannings_n=mann, dtype=jnp.float64
    )
    adv_u = make_interval_advancer(op_u, "euler")
    res_u = adv_u(
        op_u.arrays, jnp.asarray(q0), 0.0, 1e-3, 30, 0.03,
        op_u.zero_boundary_values(), jnp.zeros_like(jnp.asarray(q0)),
    )

    op_s = build_structured_operator(
        nx, ny, dx, dy, mannings_n=np.full((ny, nx), 0.02),
        bc_right=bc_right, dtype=jnp.float64,
    )
    adv_s = make_structured_stepper(op_s, "euler")
    q0_s = jnp.asarray(q0.reshape(3, ny, nx))
    q_s, t_s, cmax_s = adv_s(
        op_s.arrays, q0_s, 0.0, 1e-3, 30, 0.03, jnp.zeros_like(q0_s)
    )

    q_u = np.asarray(res_u.q).reshape(3, ny, nx)
    np.testing.assert_allclose(np.asarray(q_s), q_u, rtol=0, atol=1e-13)
    assert float(cmax_s) == pytest.approx(float(res_u.max_courant), rel=1e-12)


def test_structured_bed_slope_lake_at_rest_is_not_exact_but_stable():
    """With a sloped bed, the plain (non-well-balanced) scheme drifts but
    must stay stable; with a FLAT bed it must be exactly still."""
    op = build_structured_operator(16, 16, 1.0, 1.0, dtype=jnp.float64)
    q0 = jnp.zeros((3, 16, 16)).at[0].set(2.0)
    rhs, cmax = op.apply(q0, 0.01, jnp.zeros_like(q0))
    assert float(jnp.abs(rhs).max()) < 1e-12
