"""Adaptive mesh refinement tests (reference: src/rdyamr.c + driver/amr.c,
amr_dx1.yaml on the triangle MMS mesh)."""

import numpy as np
import pytest

from rdycore_tpu.amr import mark_cells_from_raster, perform_amr, refine_marked
from rdycore_tpu.mesh import structured_tri
from rdycore_tpu.mesh.exodus import read_exodus


def test_refine_marked_conforming():
    mesh = structured_tri(6, 4)
    marked = np.zeros(mesh.num_cells, dtype=bool)
    marked[:5] = True
    fine, parent = refine_marked(mesh, marked)
    # area conserved
    assert np.isclose(fine.cell_area.sum(), mesh.cell_area.sum())
    # conforming: every internal edge shared by exactly 2 cells (guaranteed
    # by build_mesh succeeding) and each parent's children cover its area
    for c in np.nonzero(marked)[0]:
        kids = np.nonzero(parent == c)[0]
        assert len(kids) == 4  # red
        assert np.isclose(
            fine.cell_area[kids].sum(), mesh.cell_area[c]
        )
    # unmarked cells are either kept (1 child), green (2), or promoted (4)
    counts = np.bincount(parent)
    assert set(counts.tolist()) <= {1, 2, 4}
    # boundaries propagate
    assert len(fine.boundaries["left"]) >= len(mesh.boundaries["left"])


def test_refine_nothing_is_identity():
    mesh = structured_tri(4, 4)
    out, parent = refine_marked(mesh, np.zeros(mesh.num_cells, bool))
    assert out is mesh
    assert np.array_equal(parent, np.arange(mesh.num_cells))


def test_mark_rule():
    depths = np.array([0.0, 0.5, 2.0, 1.0])
    areas = np.array([1.0, 1.0, 0.05, 1.0])
    marked = mark_cells_from_raster(depths, areas, area_threshold=0.125)
    assert marked.tolist() == [False, True, False, True]


def test_amr_mid_simulation():
    """Run, refine where water is deep, continue: mass must be preserved
    through the piecewise-constant transfer and the run stays stable."""
    from rdycore_tpu.config.schema import Config
    from rdycore_tpu.simulation import Simulation

    cfg = Config()
    cfg.time.stop = 0.4
    cfg.time.time_step = 0.002
    cfg.time.coupling_interval = 0.2
    cfg.logging.level = "none"
    cfg.validate()
    mesh = structured_tri(10, 8, 0, 10, 0, 8)
    sim = Simulation(cfg, mesh=mesh)
    q0 = np.zeros((3, mesh.num_cells))
    q0[0] = np.where(mesh.cell_centroid[:, 0] < 5.0, 2.0, 1.0)
    sim.set_solution(q0)

    v_before = float((sim.get_height() * sim.mesh.cell_area).sum())
    sim.advance()

    marked = mark_cells_from_raster(
        sim.get_height() - 1.4, sim.mesh.cell_area, area_threshold=0.1
    )
    assert marked.any()
    v_mid = float((sim.get_height() * sim.mesh.cell_area).sum())
    perform_amr(sim, marked)
    v_after = float((sim.get_height() * sim.mesh.cell_area).sum())
    assert v_after == pytest.approx(v_mid, rel=1e-12)  # conservative transfer
    assert sim.mesh.num_cells > mesh.num_cells

    sim.advance()
    assert sim.finished
    assert np.isfinite(sim.get_solution()).all()
    # closed box: volume conserved across the whole run incl. refinement
    v_end = float((sim.get_height() * sim.mesh.cell_area).sum())
    assert v_end == pytest.approx(v_before, rel=1e-10)


def test_amr_on_reference_mesh():
    mesh = read_exodus("/root/reference/share/meshes/mms_triangles_dx1.exo")
    marked = np.zeros(mesh.num_cells, bool)
    marked[mesh.cell_centroid[:, 0] < 2.0] = True
    fine, parent = refine_marked(mesh, marked)
    assert np.isclose(fine.cell_area.sum(), mesh.cell_area.sum())
    assert fine.num_cells > mesh.num_cells


def test_rdy_style_mark_then_perform():
    """The reference driver's two-call workflow (driver/amr.c):
    RDyMarkOwnedCellsForAMR -> RDyPerformAMR, via Simulation methods."""
    from rdycore_tpu.config.schema import Config
    from rdycore_tpu.simulation import Simulation

    cfg = Config()
    cfg.time.stop = 0.2
    cfg.time.time_step = 0.002
    cfg.time.coupling_interval = 0.1
    cfg.logging.level = "none"
    cfg.validate()
    mesh = structured_tri(10, 8, 0, 10, 0, 8)
    sim = Simulation(cfg, mesh=mesh)
    q = np.zeros((3, mesh.num_cells))
    q[0] = 1.0
    q[0, mesh.cell_centroid[:, 0] < 5.0] = 2.0
    sim.set_solution(q)

    import pytest as _pt

    with _pt.raises(RuntimeError):
        sim.perform_amr()
    with _pt.raises(ValueError):
        sim.mark_cells_for_amr(np.ones(3, bool))

    sim.advance()
    v0 = float((sim.get_height() * sim.mesh.cell_area).sum())
    sim.mark_cells_for_amr(sim.get_height() > 1.5)
    sim.perform_amr()
    assert sim.mesh.num_cells > mesh.num_cells
    v1 = float((sim.get_height() * sim.mesh.cell_area).sum())
    assert v1 == pytest.approx(v0, rel=1e-12)
    sim.advance()
    assert sim.finished and np.isfinite(sim.get_solution()).all()
    assert not sim.restarted
    assert "rdycore_tpu" in sim.get_build_configuration()


def test_refine_marked_quads():
    """Quad 1:4 red refinement + centroid-fan transition cells (round-2
    verdict item 7: the realistic Houston/dam-break meshes are quads;
    reference adapts any DMPlex, rdyamr.c:161-223)."""
    from rdycore_tpu.mesh import structured_quad

    mesh = structured_quad(6, 4)
    marked = np.zeros(mesh.num_cells, dtype=bool)
    marked[[0, 7, 15]] = True
    fine, parent = refine_marked(mesh, marked)
    assert np.isclose(fine.cell_area.sum(), mesh.cell_area.sum())
    for c in np.nonzero(marked)[0]:
        kids = np.nonzero(parent == c)[0]
        assert len(kids) == 4  # red quad -> 4 child quads
        assert (fine.cell_num_vertices[kids] == 4).all()
        assert np.isclose(fine.cell_area[kids].sum(), mesh.cell_area[c])
    # per-parent conservation for every cell, incl. fan transitions
    for c in range(mesh.num_cells):
        kids = np.nonzero(parent == c)[0]
        assert np.isclose(fine.cell_area[kids].sum(), mesh.cell_area[c])
    # transition quads became 5 fan triangles; untouched quads kept
    counts = np.bincount(parent, minlength=mesh.num_cells)
    assert set(counts.tolist()) <= {1, 2, 4, 5, 6}
    assert len(fine.boundaries["left"]) >= len(mesh.boundaries["left"])


def test_amr_mid_simulation_quads():
    """Mid-run AMR on a QUAD mesh with conservative state transfer (the
    round-2 guard amr.py:34 is gone)."""
    import jax.numpy as jnp

    from rdycore_tpu.config.schema import Config
    from rdycore_tpu.mesh import structured_quad
    from rdycore_tpu.simulation import Simulation

    cfg = Config()
    cfg.time.stop = 0.4
    cfg.time.time_step = 0.002
    cfg.time.coupling_interval = 0.2
    cfg.logging.level = "none"
    cfg.validate()
    mesh = structured_quad(10, 8, 0, 10, 0, 8)
    sim = Simulation(cfg, mesh=mesh)
    q0 = np.zeros((3, mesh.num_cells))
    q0[0] = np.where(mesh.cell_centroid[:, 0] < 5.0, 2.0, 1.0)
    sim.set_solution(q0)
    mass0 = float((q0[0] * mesh.cell_area).sum())

    sim.advance()
    depth = sim.get_height()
    marked = mark_cells_from_raster(
        depth - 1.2, sim.mesh.cell_area, area_threshold=0.5
    )
    perform_amr(sim, marked)
    assert sim.mesh.num_cells > mesh.num_cells
    mass1 = float((sim.get_height() * sim.mesh.cell_area).sum())
    assert np.isclose(mass0, mass1, rtol=1e-10)  # all-reflecting box
    sim.advance()
    h = sim.get_height()
    assert np.isfinite(h).all() and (h >= 0).all()
    mass2 = float((h * sim.mesh.cell_area).sum())
    assert np.isclose(mass1, mass2, rtol=1e-8)
