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


def test_temporal_order_ark_imex():
    """ARS(2,2,2) ARK-IMEX must be 2nd order WITH friction active: the
    Manning term is solved implicitly per stage (closed form), so unlike
    the semi-implicit treatment it does not cap the formal order
    (VERDICT r1 #4; reference: TSARKIMEX, rdysetup.c:1183-1196)."""
    mesh = structured_quad(24, 20, 0.0, 6.0, 0.0, 5.0)
    x = mesh.cell_centroid[:, 0]
    y = mesh.cell_centroid[:, 1]
    h0 = 2.0 + 0.1 * np.sin(np.pi * x / 3.0) * np.cos(np.pi * y / 5.0)
    q0 = jnp.zeros((3, mesh.num_cells)).at[0].set(h0).at[1].set(0.3 * h0)
    op = build_operator(mesh, mannings_n=np.full(mesh.num_cells, 0.05))

    t_end = 0.08
    ref = _run(op, q0, "ark_imex", t_end / 512, t_end)
    errs = []
    for dt in [t_end / 8, t_end / 16, t_end / 32]:
        errs.append(np.abs(_run(op, q0, "ark_imex", dt, t_end) - ref).max())
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    assert min(rates) > 1.6, (errs, rates)


def test_temporal_order_beuler():
    """Backward Euler (matrix-free Newton-GMRES) is 1st order."""
    mesh = structured_quad(16, 12, 0.0, 4.0, 0.0, 3.0)
    x = mesh.cell_centroid[:, 0]
    h0 = 2.0 + 0.1 * np.sin(np.pi * x / 2.0)
    q0 = jnp.zeros((3, mesh.num_cells)).at[0].set(h0)
    op = build_operator(mesh, mannings_n=np.full(mesh.num_cells, 0.03))

    t_end = 0.06
    ref = _run(op, q0, "beuler", t_end / 128, t_end)
    errs = []
    for dt in [t_end / 8, t_end / 16, t_end / 32]:
        errs.append(np.abs(_run(op, q0, "beuler", dt, t_end) - ref).max())
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    assert min(rates) > 0.7, (errs, rates)


@pytest.mark.slow
def test_beuler_stable_above_courant_one():
    """beuler runs the parabolic bowl at Courant > 1 where euler blows up
    (VERDICT r1 #4 done-criterion). Wave speed ~ sqrt(g*h0)."""
    from rdycore_tpu.constants import GRAVITY

    H0, A_R, ETA0 = 0.1, 1.0, 0.02

    def bowl(x, y):
        return -H0 * (1.0 - (x * x + y * y) / (A_R * A_R))

    n, L = 40, 2.2
    mesh = structured_quad(n, n, -L, L, -L, L, z_fn=bowl)
    cx = mesh.cell_centroid[:, 0]
    cy = mesh.cell_centroid[:, 1]
    r2 = cx * cx + cy * cy
    z = mesh.cell_z
    w = np.sqrt(8.0 * GRAVITY * H0) / A_R
    A = ((H0 + ETA0) ** 2 - H0**2) / ((H0 + ETA0) ** 2 + H0**2)
    s = np.sqrt(1.0 - A * A)
    eta0 = H0 * (s / (1.0 - A) - 1.0 - (r2 / (A_R * A_R)) * ((1.0 - A * A) / (1.0 - A) ** 2 - 1.0))
    h0 = np.maximum(eta0 - z, 0.0)
    q0 = jnp.zeros((3, mesh.num_cells)).at[0].set(h0)
    op = build_operator(mesh, mannings_n=np.full(mesh.num_cells, 0.02))

    dx = 2 * L / n
    c = np.sqrt(GRAVITY * (H0 + ETA0))
    dt = 2.5 * dx / c  # Courant ~ 2.5
    t_end = 2.0 * (2.0 * np.pi / w)  # two full periods (18 steps)
    n_steps = int(np.ceil(t_end / dt))

    q_be = _run(op, q0, "beuler", dt, t_end)
    assert np.isfinite(q_be).all()
    assert q_be[0].min() > -1e-6  # depths stay essentially non-negative
    assert q_be[0].max() < 10 * (H0 + ETA0)  # bounded (no blow-up)

    adv = make_interval_advancer(op, "euler")
    res = adv(op.arrays, q0, 0.0, dt, n_steps, t_end,
              op.zero_boundary_values(), jnp.zeros_like(q0))
    q_eu = np.asarray(res.q)
    eu_blown = (~np.isfinite(q_eu).all()) or q_eu[0].max() > 10 * (H0 + ETA0)
    assert eu_blown  # the same dt is unstable explicitly


def test_ark_imex_with_tracers_second_order():
    """ark_imex now accepts tracers (VERDICT r2 #4): the friction DIRK
    stages act on the flow momentum and tracer rows advance explicitly.
    The difference to ssprk2 (also 2nd order) must shrink ~4x per dt
    halving — both methods converge to the same solution at order 2."""
    import jax.numpy as jnp

    from rdycore_tpu.mesh import structured_quad
    from rdycore_tpu.operator import build_operator
    from rdycore_tpu.timestepping import make_interval_advancer

    mesh = structured_quad(24, 16)
    C = mesh.num_cells
    op = build_operator(
        mesh, mannings_n=np.full(C, 0.03), num_tracers=2, num_sediment=1
    )
    rng = np.random.default_rng(0)
    q0 = np.zeros((5, C))
    q0[0] = 1.0 + rng.random(C)
    q0[1] = 0.3 * rng.standard_normal(C)
    q0[2] = 0.3 * rng.standard_normal(C)
    q0[3] = 0.01 * q0[0]
    q0[4] = 0.005 * q0[0]
    q0 = jnp.asarray(q0)
    bv = op.zero_boundary_values()
    src = jnp.zeros((5, C))
    advA = make_interval_advancer(op, "ark_imex", accumulate=False)
    advE = make_interval_advancer(op, "ssprk2", accumulate=False)
    T = 0.02
    diffs = []
    for n in (10, 20, 40):
        dt = T / n
        rA = advA(op.arrays, q0, 0.0, dt, n, T, bv, src)
        rE = advE(op.arrays, q0, 0.0, dt, n, T, bv, src)
        assert np.isfinite(np.asarray(rA.q)).all()
        diffs.append(np.abs(np.asarray(rA.q) - np.asarray(rE.q)).max())
    assert diffs[0] / diffs[1] > 3.0, diffs
    assert diffs[1] / diffs[2] > 3.0, diffs


def test_beuler_pallas_matches_xla():
    """beuler on the pallas backend (VERDICT r3 weak #3): residuals run
    through the slotted kernels, Newton-GMRES JVPs through the XLA twin —
    the fence in simulation.py is gone and results match the pure-XLA
    integrator to f32 rounding."""
    from rdycore_tpu.ops.pallas.slotted import to_pallas_backend

    mesh = structured_quad(16, 12, 0.0, 4.0, 0.0, 3.0)
    x = mesh.cell_centroid[:, 0]
    h0 = 2.0 + 0.1 * np.sin(np.pi * x / 2.0)
    q0 = jnp.zeros((3, mesh.num_cells), jnp.float32).at[0].set(h0)
    op = build_operator(
        mesh, mannings_n=np.full(mesh.num_cells, 0.03), dtype=jnp.float32
    )
    op_p = to_pallas_backend(op, interpret=True)
    assert op_p.edge_flux_backend == "pallas"

    q_x = _run(op, q0, "beuler", 0.01, 0.05)
    q_p = _run(op_p, q0, "beuler", 0.01, 0.05)
    rel = np.abs(q_p - q_x) / (1.0 + np.abs(q_x))
    assert rel.max() < 2e-5
