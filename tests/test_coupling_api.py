"""Coupling API surface tests (the F90 test_coupling.F90 analogue:
exercise every get/set of the E3SM coupling surface, src/rdydata.c)."""

import shutil

import numpy as np
import pytest

from rdycore_tpu.config.yaml_input import load_config
from rdycore_tpu.simulation import Simulation


@pytest.fixture
def sim(tmp_path):
    shutil.copy(
        "/root/reference/driver/tests/sediment/sediment.yaml", tmp_path / "s.yaml"
    )
    cfg = load_config(str(tmp_path / "s.yaml"))
    cfg.time.stop_n = 10
    cfg.time.stop = None
    cfg.validate()
    cfg.logging.level = "none"
    cfg.output.format = "none"
    return Simulation(cfg)


def test_time_accessors(sim):
    assert sim.get_time() == 0.0
    assert sim.get_time_step("seconds") == pytest.approx(0.01)
    assert sim.get_step() == 0
    ci = sim.get_coupling_interval()
    sim.set_coupling_interval(ci / 2)
    assert sim.get_coupling_interval() == pytest.approx(ci / 2)


def test_cell_getters(sim):
    C = sim.num_cells
    assert sim.get_height().shape == (C,)
    assert sim.get_x_momentum().shape == (C,)
    assert sim.get_cell_centroids().shape == (C, 3)
    assert sim.get_cell_areas().shape == (C,)
    assert sim.get_natural_ids().shape == (C,)
    assert sim.get_manning_n().shape == (C,)


def test_boundary_metadata(sim):
    names = sim.boundary_names
    assert names
    b = names[0]
    n = sim.get_num_boundary_edges(b)
    assert n > 0
    assert sim.get_boundary_edge_centroids(b).shape == (n, 3)
    assert sim.get_boundary_cell_centroids(b).shape == (n, 3)
    assert sim.get_boundary_cell_natural_ids(b).shape == (n,)
    assert isinstance(sim.get_boundary_condition_flow_type(b), int)


def test_source_setters_affect_run(sim):
    sim.set_regional_momentum_source("domain", 0, 0.1)
    sim.set_regional_sediment_source("domain", 0, 1e-4)
    src = np.asarray(sim.ext_src)
    assert (src[1] == 0.1).all()
    assert (src[3] == 1e-4).all()
    sim.run()
    assert np.isfinite(sim.get_solution()).all()


def test_tracer_dirichlet_setters(sim):
    b = sim.boundary_names[0]
    n = sim.get_num_boundary_edges(b)
    sim.set_sediment_dirichlet_boundary_values(b, np.ones((2, n)) * 0.3)
    bv = np.asarray(sim.boundary_values)
    seg = sim._segment(b)
    assert (bv[3, seg.start : seg.start + seg.count] == 0.3).all()
    assert (bv[4, seg.start : seg.start + seg.count] == 0.3).all()


def test_manning_setters(sim):
    sim.set_regional_manning_n("domain", 0.05)
    assert (sim.get_manning_n() == 0.05).all()


def test_checkpoint_roundtrip(sim, tmp_path):
    sim.run()
    p = str(tmp_path / "c.h5")
    sim.write_checkpoint(p)
    q = sim.get_solution().copy()
    sim.set_solution(np.zeros_like(q))
    sim.read_checkpoint(p)
    np.testing.assert_array_equal(sim.get_solution(), q)


def test_courant_number_diagnostics(sim):
    """Diagnostics locate the max-Courant edge/cell (rdyoperatorimpl.h:21-26)."""
    assert sim.get_courant_number_diagnostics() == (0.0, -1, -1)
    sim.advance()
    cmax, eid, cid = sim.get_courant_number_diagnostics()
    assert cmax == sim.prev_max_courant > 0
    assert 0 <= eid < sim.operator.num_edges
    assert 0 <= cid < sim.mesh.num_cells
    # the reported cell must be incident to the reported edge
    a = sim.operator.arrays
    Ei = sim.operator.num_internal_edges
    if eid < Ei:
        assert cid == int(np.asarray(a.int_left)[eid])
    else:
        assert cid == int(np.asarray(a.bnd_left)[eid - Ei])


def test_misc_api_parity(sim, tmp_path):
    """RDyConvertTime / RDyGetTimeUnit / RDyGetVersion / RDyGetNumGlobalCells
    / RDyGetNumBoundaryConditions / RDyGetBoundaryID / prognostic + one-DOF
    vec helpers (rdydata.c:541-633, rdyadvance.c:427)."""
    assert Simulation.convert_time(2.0, "minutes", "seconds") == pytest.approx(120.0)
    assert Simulation.convert_time(3600.0, "seconds", "hours") == pytest.approx(1.0)
    assert sim.get_time_unit() == sim.time_unit
    assert sim.get_version()

    assert sim.get_num_global_cells() == sim.num_cells
    assert sim.get_num_boundary_conditions() == len(sim.boundary_names)
    for b in sim.boundary_names:
        assert isinstance(sim.get_boundary_id(b), int)
    with pytest.raises(KeyError):
        sim.get_boundary_id("no_such_boundary")

    prog = sim.create_prognostic_array()
    assert prog.shape == sim.get_solution().shape
    prog[:] = sim.get_solution()
    sim.set_initial_conditions(prog)  # round-trips through set_solution
    np.testing.assert_allclose(sim.get_height(), prog[0], rtol=1e-6)

    # one-DOF binary round trip in natural order: write from the sim's cell
    # order, read back, and check the file itself is naturally ordered
    vals = np.asarray(sim.get_cell_centroids()[:, 0], dtype=np.float64)
    path = str(tmp_path / "onedof.bin")
    sim.write_one_dof_vec_to_binary(path, vals)
    back = sim.read_one_dof_vec_from_binary(path)
    np.testing.assert_array_equal(back, vals)
    from rdycore_tpu.io.petsc_binary import read_petsc_vec

    raw = read_petsc_vec(path)
    np.testing.assert_array_equal(raw[sim.mesh.natural_ids], vals)
    assert sim.create_one_dof_array().shape == (sim.num_cells,)
