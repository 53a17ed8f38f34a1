"""CGNS output: the reference's OUTPUT_CGNS path (rdyadvance.c:143-146,
195-197, via PETSc's CGNS viewer) writes batched '<prefix>-<step>.cgns'
files; here the CGNS/HDF5 node tree is emitted directly (io/cgns.py).
Validates the ADF-on-HDF5 structure and the solution values with h5py."""

import shutil

import numpy as np
import pytest

from rdycore_tpu.config.yaml_input import load_config
from rdycore_tpu.io.writers import attach_output_monitors
from rdycore_tpu.simulation import Simulation

EX2B = "/root/reference/driver/tests/swe_roe/ex2b.yaml"


@pytest.fixture
def ex2b_dir(tmp_path):
    shutil.copy(EX2B, tmp_path / "ex2b.yaml")
    return tmp_path


def _label(g):
    return bytes(g.attrs["label"]).rstrip(b"\x00").decode()


def _data(g):
    return np.asarray(g[" data"])


def test_cgns_output(ex2b_dir):
    h5py = pytest.importorskip("h5py")
    cfg = load_config(str(ex2b_dir / "ex2b.yaml"))
    cfg.time.stop_n = 20
    cfg.time.stop = None
    cfg.time.time_step = 5e-6
    cfg.logging.level = "none"
    cfg.output.format = "cgns"
    cfg.output.output_interval = 10
    cfg.output.batch_size = 2
    cfg.checkpoint.interval = 0
    cfg.validate()
    sim = Simulation(cfg)
    attach_output_monitors(sim)
    sim.run()

    # snapshots at steps 0, 10, 20 with batch_size 2 -> files at 0 and 20
    f0 = ex2b_dir / "output" / "ex2b-0.cgns"
    f1 = ex2b_dir / "output" / "ex2b-20.cgns"
    assert f0.exists() and f1.exists()

    mesh = sim.mesh
    with h5py.File(f0, "r") as f:
        assert _label(f["CGNSLibraryVersion"]) == "CGNSLibraryVersion_t"
        base = f["Base"]
        assert _label(base) == "CGNSBase_t"
        assert list(_data(base)) == [2, 3]  # cellDim, physDim
        zone = base["Zone"]
        assert _label(zone) == "Zone_t"
        nvert, ncell, _ = _data(zone).ravel()
        assert (nvert, ncell) == (mesh.num_vertices, mesh.num_cells)
        assert bytes(_data(zone["ZoneType"])).decode() == "Unstructured"
        x = _data(zone["GridCoordinates/CoordinateX"])
        assert np.allclose(x, np.asarray(mesh.points)[:, 0])
        el = zone["Elements"]
        etype, _ = _data(el)
        conn = _data(el["ElementConnectivity"])
        assert conn.min() >= 1 and conn.max() <= mesh.num_vertices
        if etype == 20:  # MIXED carries per-cell offsets
            off = _data(el["ElementStartOffset"])
            assert len(off) == mesh.num_cells + 1 and off[-1] == len(conn)
        assert list(_data(base["BaseIterativeData"])) == [2]
        times = _data(base["BaseIterativeData/TimeValues"])
        assert len(times) == 2 and times[0] == 0.0
        # two snapshots in this batch: steps 0 and 10
        for s in (0, 10):
            fs = zone[f"FlowSolution{s}"]
            assert _label(fs) == "FlowSolution_t"
            assert bytes(_data(fs["GridLocation"])).decode() == "CellCenter"
            h = _data(fs["Height"])
            assert h.shape == (mesh.num_cells,) and np.isfinite(h).all()
        ptrs = _data(zone["ZoneIterativeData/FlowSolutionPointers"])
        assert ptrs.shape == (2, 32)
        assert bytes(ptrs[1]).decode().rstrip() == "FlowSolution10"

    with h5py.File(f1, "r") as f:
        fs = f["Base/Zone/FlowSolution20"]
        # final snapshot matches the live state exactly
        assert np.array_equal(
            _data(fs["Height"]), np.asarray(sim.get_solution()[0], np.float64)
        )
