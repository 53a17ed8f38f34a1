"""Temporal convergence orders of the time integrators on a fixed mesh:
Richardson estimation against a tiny-dt reference on a smooth, fully-wet
state (no limiters, no dry cells). euler must be ~1st order, ssprk2/
ssprk3 ~2nd/3rd, rk4 >= 4th (to roundoff)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rdycore_tpu.mesh import structured_quad
from rdycore_tpu.operator import build_operator
from rdycore_tpu.timestepping import make_interval_advancer


def _setup():
    mesh = structured_quad(24, 20, 0.0, 6.0, 0.0, 5.0)
    x = mesh.cell_centroid[:, 0]
    y = mesh.cell_centroid[:, 1]
    h0 = 2.0 + 0.1 * np.sin(np.pi * x / 3.0) * np.cos(np.pi * y / 5.0)
    q0 = jnp.zeros((3, mesh.num_cells)).at[0].set(h0)
    # zero friction: the semi-implicit Manning treatment evaluates
    # tb/(1 + dt*tb) INSIDE the RHS (reference-faithful,
    # swe_sources_ceed.h:37-63), which makes the RHS dt-dependent and
    # caps the formal temporal order of any multi-stage scheme
    op = build_operator(mesh, mannings_n=np.zeros(mesh.num_cells))
    return op, q0


def _run(op, q0, scheme, dt, t_end):
    adv = make_interval_advancer(op, scheme)
    n = int(round(t_end / dt))
    res = adv(op.arrays, q0, 0.0, dt, n, t_end,
              op.zero_boundary_values(), jnp.zeros_like(q0))
    return np.asarray(res.q)


@pytest.mark.parametrize("scheme,expected", [
    ("euler", 1.0), ("ssprk2", 2.0), ("ssprk3", 3.0), ("rk4", 4.0),
])
def test_temporal_order(scheme, expected):
    op, q0 = _setup()
    t_end = 0.08
    ref = _run(op, q0, scheme, t_end / 512, t_end)
    errs = []
    dts = [t_end / 8, t_end / 16, t_end / 32]
    for dt in dts:
        q = _run(op, q0, scheme, dt, t_end)
        errs.append(np.abs(q - ref).max())
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    # allow the usual pre-asymptotic slack; rk4 may touch f64 roundoff
    assert min(rates) > expected - 0.4, (scheme, errs, rates)
