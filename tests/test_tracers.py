"""Tracer transport tests (sediment/salinity/heat)."""

import shutil

import numpy as np
import pytest

from rdycore_tpu.config.yaml_input import load_config
from rdycore_tpu.simulation import Simulation


def test_sediment_case_end_to_end(tmp_path):
    shutil.copy(
        "/root/reference/driver/tests/sediment/sediment.yaml", tmp_path / "s.yaml"
    )
    cfg = load_config(str(tmp_path / "s.yaml"))
    cfg.logging.level = "none"
    cfg.output.format = "none"
    sim = Simulation(cfg)
    assert sim.ndof == 5  # h, hu, hv + 2 sediment classes
    q0 = sim.get_solution()
    assert q0.shape[0] == 5
    # ICs: c0 = 0.1, c1 = 0.2 as direct state values
    assert np.allclose(q0[3], 0.1)
    assert np.allclose(q0[4], 0.2)
    sim.run()
    q = sim.get_solution()
    assert np.isfinite(q).all()
    assert q[0].min() >= 0.0


def test_tracer_flux_consistency_with_swe():
    """With zero tracer concentration, the coupled flux must reduce to the
    pure SWE Roe flux on the flow components."""
    import jax.numpy as jnp

    from rdycore_tpu.ops.swe.riemann import roe_flux
    from rdycore_tpu.ops.tracer.flux import tracer_roe_flux

    rng = np.random.default_rng(1)
    n = 64
    hl = 1.0 + rng.random(n)
    hr = 1.0 + rng.random(n)
    ul, vl, ur, vr = (rng.standard_normal(n) * 0.3 for _ in range(4))
    ang = rng.random(n) * 2 * np.pi
    cn, sn = np.cos(ang), np.sin(ang)
    args = [jnp.asarray(a) for a in (hl, ul, vl, hr, ur, vr, sn, cn)]

    f_h, f_hu, f_hv, amax = roe_flux(*[args[i] for i in (0, 1, 2, 3, 4, 5)], args[6], args[7])
    zeros = jnp.zeros((2, n))
    f_flow, f_tr, amax2 = tracer_roe_flux(
        args[0], args[1], args[2], zeros, args[3], args[4], args[5], zeros,
        args[6], args[7], upwind=False,
    )
    np.testing.assert_allclose(np.asarray(f_flow[0]), np.asarray(f_h), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f_flow[1]), np.asarray(f_hu), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f_flow[2]), np.asarray(f_hv), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(amax2), np.asarray(amax), rtol=1e-12)
    assert np.abs(np.asarray(f_tr)).max() == 0.0


def test_tracer_mass_conservation():
    """In a closed (all-reflecting) box with no erosion/deposition sources,
    total tracer mass (h*c integrated) is conserved."""
    import jax.numpy as jnp

    from rdycore_tpu.mesh import structured_quad
    from rdycore_tpu.operator import build_operator
    from rdycore_tpu.timestepping import make_interval_advancer

    mesh = structured_quad(12, 10)
    rng = np.random.default_rng(5)
    op = build_operator(
        mesh, mannings_n=np.zeros(mesh.num_cells), num_tracers=1,
        num_sediment=0,  # passive tracer: no erosion/deposition
    )
    q0 = np.zeros((4, mesh.num_cells))
    q0[0] = 1.0 + 0.3 * rng.random(mesh.num_cells)
    q0[3] = q0[0] * rng.random(mesh.num_cells)  # h*c
    area = mesh.cell_area
    m0 = float((q0[3] * area).sum())
    adv = make_interval_advancer(op, "euler")
    res = adv(
        op.arrays, jnp.asarray(q0), 0.0, 1e-3, 100, 0.1,
        op.zero_boundary_values(), jnp.zeros((4, mesh.num_cells)),
    )
    m1 = float((np.asarray(res.q[3]) * area).sum())
    assert abs(m1 - m0) < 1e-10 * abs(m0)


def test_salinity_and_heat_tracers():
    """Salinity + heat advect as passive tracers (ndof = 3 + sed + 2)."""
    import jax.numpy as jnp

    from rdycore_tpu.config.schema import Config
    from rdycore_tpu.mesh import structured_quad

    cfg = Config()
    cfg.physics.salinity = True
    cfg.physics.heat = True
    cfg.time.stop = 0.1
    cfg.time.time_step = 0.001
    cfg.logging.level = "none"
    cfg.validate()
    mesh = structured_quad(10, 8)
    sim = Simulation(cfg, mesh=mesh)
    assert sim.ndof == 5
    q0 = np.zeros((5, mesh.num_cells))
    q0[0] = 1.0
    q0[1] = 0.3  # uniform flow
    q0[3] = 1.0 * 35.0  # h * salinity
    q0[4] = 1.0 * 290.0  # h * temperature
    sim.set_solution(q0)
    sim.run()
    q = sim.get_solution()
    assert np.isfinite(q).all()
    # passive tracers in a closed box: total h*c conserved
    area = mesh.cell_area
    assert float((q[3] * area).sum()) == pytest.approx(
        float((q0[3] * area).sum()), rel=1e-10
    )
    assert float((q[4] * area).sum()) == pytest.approx(
        float((q0[4] * area).sum()), rel=1e-10
    )


def test_tracer_hr_lake_at_rest():
    """HR well-balancing with tracers: still water + uniform concentration
    over bumpy bathymetry stays exactly still (flow AND tracer rows)."""
    import jax.numpy as jnp

    from rdycore_tpu.mesh import structured_tri
    from rdycore_tpu.operator import build_operator

    mesh = structured_tri(
        10, 8, 0, 10, 0, 8, z_fn=lambda x, y: 0.3 * np.sin(x) * np.cos(y)
    )
    op = build_operator(
        mesh, mannings_n=np.zeros(mesh.num_cells), num_tracers=1,
        num_sediment=0, well_balancing_hr=True,
    )
    h0 = np.maximum(2.0 - mesh.cell_z, 0.0)
    q0 = np.zeros((4, mesh.num_cells))
    q0[0] = h0
    q0[3] = h0 * 0.4  # uniform concentration
    q0 = jnp.asarray(q0)
    res = op.apply(q0, 0.01, op.zero_boundary_values(), jnp.zeros_like(q0))
    assert float(jnp.abs(res.rhs).max()) < 1e-12


def test_tracer_hr_conservation():
    """HR + tracer advection over a sloped bed in a closed box conserves
    water volume and tracer mass."""
    import jax.numpy as jnp

    from rdycore_tpu.mesh import structured_tri
    from rdycore_tpu.operator import build_operator
    from rdycore_tpu.timestepping import make_interval_advancer

    mesh = structured_tri(
        10, 8, 0, 10, 0, 8, z_fn=lambda x, y: 0.05 * x
    )
    op = build_operator(
        mesh, mannings_n=np.zeros(mesh.num_cells), num_tracers=1,
        num_sediment=0, well_balancing_hr=True,
    )
    rng = np.random.default_rng(9)
    q0 = np.zeros((4, mesh.num_cells))
    q0[0] = np.maximum(1.0 - mesh.cell_z + 0.3 * rng.random(mesh.num_cells), 0.0)
    q0[3] = q0[0] * rng.random(mesh.num_cells)
    area = mesh.cell_area
    m_w = float((q0[0] * area).sum())
    m_c = float((q0[3] * area).sum())
    adv = make_interval_advancer(op, "euler")
    res = adv(op.arrays, jnp.asarray(q0), 0.0, 1e-3, 100, 0.1,
              op.zero_boundary_values(), jnp.zeros((4, mesh.num_cells)))
    q = np.asarray(res.q)
    assert np.isfinite(q).all()
    assert float((q[0] * area).sum()) == pytest.approx(m_w, rel=1e-12)
    assert float((q[3] * area).sum()) == pytest.approx(m_c, rel=1e-12)
