"""End-to-end Simulation tests: config -> mesh -> run -> outputs, plus the
checkpoint/restart equivalence oracle (the reference's strongest regression
test, driver/tests/swe_roe/CMakeLists.txt:37-71)."""

import os
import shutil

import numpy as np
import pytest

from rdycore_tpu.config.yaml_input import load_config
from rdycore_tpu.io.checkpoint import restore_from_checkpoint, write_checkpoint
from rdycore_tpu.io.writers import attach_output_monitors
from rdycore_tpu.simulation import Simulation

EX2B = "/root/reference/driver/tests/swe_roe/ex2b.yaml"


@pytest.fixture
def ex2b_dir(tmp_path):
    shutil.copy(EX2B, tmp_path / "ex2b.yaml")
    return tmp_path


def short_config(path, **kw):
    cfg = load_config(str(path))
    cfg.time.stop_n = kw.get("stop_n", 100)
    cfg.time.stop = None
    cfg.time.time_step = 5e-6  # hours (matches derived ex2b dt)
    cfg.logging.level = "none"
    return cfg.validate()


def test_ex2b_end_to_end(ex2b_dir):
    cfg = short_config(ex2b_dir / "ex2b.yaml")
    sim = Simulation(cfg)
    attach_output_monitors(sim)
    sim.run()
    assert sim.step == 100
    q = sim.get_solution()
    assert np.isfinite(q).all()
    assert q[0].min() > 0.0
    # outputs exist
    out = ex2b_dir / "output"
    assert (out / "ex2b.grid.h5").exists()
    assert (out / "ex2b.000.h5").exists()
    assert (out / "ex2b.xmf").exists()
    assert (out / "boundary_fluxes.dat").exists()
    assert (out / "observations.dat").exists()
    # ex2b's checkpoint.format is 'binary' (ex2b.yaml:23)
    assert (out / "ex2b.rdycore.r.0100.bin").exists()


def test_checkpoint_restart_equivalence(ex2b_dir):
    """Run 100 steps writing a mid-run checkpoint at step 50; restart a fresh
    simulation from it and run to completion. Final states must match
    *bitwise* (the h5diff analogue; reference swe_roe/CMakeLists.txt:37-71).

    NOTE the checkpoint must be written mid-run (like the reference's
    TSMonitor does): a 50-step run-to-completion clamps its last step onto
    its own final time and is NOT the same state as step 50 of a longer run.
    """
    ckpt = str(ex2b_dir / "mid.h5")

    cfg = short_config(ex2b_dir / "ex2b.yaml", stop_n=100)
    sim_a = Simulation(cfg)

    def mid_ckpt(sim):
        if sim.step == 50:
            write_checkpoint(sim, ckpt)

    sim_a.monitor_stride = 50
    sim_a.add_monitor(mid_ckpt)
    sim_a.run()

    cfg_c = short_config(ex2b_dir / "ex2b.yaml", stop_n=100)
    sim_c = Simulation(cfg_c)
    restore_from_checkpoint(sim_c, ckpt)
    assert sim_c.step == 50
    sim_c.run()

    qa = sim_a.get_solution()
    qc = sim_c.get_solution()
    np.testing.assert_array_equal(qa, qc)


def test_restart_via_config(ex2b_dir):
    cfg = short_config(ex2b_dir / "ex2b.yaml", stop_n=40)
    sim = Simulation(cfg)
    sim.run()
    ckpt = str(ex2b_dir / "r.h5")
    write_checkpoint(sim, ckpt)

    cfg2 = short_config(ex2b_dir / "ex2b.yaml", stop_n=100)
    cfg2.restart.file = ckpt
    sim2 = Simulation(cfg2)
    assert sim2.step == 40
    assert sim2.t == pytest.approx(sim.t)
    sim2.run()
    assert sim2.step == 100


def test_adaptive_timestep(tmp_path):
    shutil.copy(
        "/root/reference/driver/tests/swe_roe/parabolic_bowl.yaml",
        tmp_path / "pb.yaml",
    )
    cfg = load_config(str(tmp_path / "pb.yaml"))
    # the reference config's 5 s initial dt gives Courant >> 1 on the first
    # interval (its CI test only checks exit status); start small instead and
    # verify the controller grows dt toward the target Courant number
    cfg.time.stop = 2.0
    cfg.time.stop_n = None  # recompute (was derived at load time)
    cfg.time.coupling_interval = 0.25
    cfg.time.adaptive.initial_time_step = 0.01
    cfg.time.time_step = None
    cfg.logging.level = "none"
    cfg.output.format = "none"
    cfg.validate()
    sim = Simulation(cfg)
    dts = []
    courants = []
    while not sim.finished:
        sim.advance()
        dts.append(sim.dt)
        courants.append(sim.prev_max_courant)
    assert sim.finished
    assert np.isfinite(sim.get_solution()).all()
    # the controller grew dt from the conservative initial value
    assert dts[-1] > dts[0]
    # and kept the Courant number at or below ~target
    assert courants[-1] < 1.0
    # wetting/drying case stays physical
    assert sim.get_height().min() > -1e-8


def test_dirichlet_bc_case(tmp_path):
    shutil.copy(
        "/root/reference/driver/tests/swe_roe/ex2b_dirichlet_bc.yaml",
        tmp_path / "c.yaml",
    )
    cfg = load_config(str(tmp_path / "c.yaml"))
    cfg.time.stop_n = 50
    cfg.time.stop = None
    cfg.time.time_step = 5e-6
    cfg.logging.level = "none"
    cfg.output.format = "none"
    cfg.validate()
    sim = Simulation(cfg)
    sim.run()
    assert np.isfinite(sim.get_solution()).all()


def test_ic_from_file(tmp_path):
    shutil.copy(
        "/root/reference/driver/tests/swe_roe/ex2b_ic_file.yaml",
        tmp_path / "c.yaml",
    )
    cfg = load_config(str(tmp_path / "c.yaml"))
    cfg.time.stop_n = 20
    cfg.time.stop = None
    cfg.logging.level = "none"
    cfg.output.format = "none"
    cfg.validate()
    sim = Simulation(cfg)
    # the IC file seeds a wet-downstream dam break
    h0 = sim.get_height()
    assert h0.max() > 0
    sim.run()
    assert np.isfinite(sim.get_solution()).all()


def test_binary_output_and_time_cadence(ex2b_dir):
    from rdycore_tpu.io.petsc_binary import read_petsc_vec
    from rdycore_tpu.io.writers import attach_output_monitors

    cfg = short_config(ex2b_dir / "ex2b.yaml", stop_n=20)
    cfg.output.format = "binary"
    cfg.output.output_interval = 10
    cfg.checkpoint.interval = 0
    sim = Simulation(cfg)
    attach_output_monitors(sim)
    sim.run()
    # zero-padded to the digits of time.stop_n (GenerateIndexedFilename,
    # rdyadvance.c:69-79)
    v = read_petsc_vec(str(ex2b_dir / "output" / "ex2b-20.bin"))
    assert len(v) == 3 * sim.num_cells
    assert np.isfinite(v).all()


def test_timestamped_output_filenames(ex2b_dir):
    """time.date set -> '<prefix>.YYYY-MM-DD.hh.mm.ss.<suffix>' filenames
    (GenerateTimestampedFilename, rdyadvance.c:82-89)."""
    from rdycore_tpu.io.writers import attach_output_monitors

    cfg = short_config(ex2b_dir / "ex2b.yaml", stop_n=10)
    cfg.time.date = "2017-08-26-00:00:00"
    cfg.output.format = "binary"
    cfg.output.output_interval = 10
    cfg.checkpoint.interval = 0
    sim = Simulation(cfg)
    attach_output_monitors(sim)
    sim.run()
    names = sorted(p.name for p in (ex2b_dir / "output").iterdir())
    assert "ex2b.2017-08-26.00.00.00.bin" in names  # initial snapshot
    bins = [n for n in names if n.endswith(".bin")]
    assert bins and all(n.startswith("ex2b.2017-08-26.") for n in bins)


def test_preload_and_step_timer(ex2b_dir):
    from rdycore_tpu.profiling import StepTimer, preload

    cfg = short_config(ex2b_dir / "ex2b.yaml", stop_n=40)
    cfg.time.coupling_interval = cfg.time.stop / 4
    cfg.validate()
    sim = Simulation(cfg)
    q_before = sim.get_solution().copy()
    compile_s = preload(sim)
    assert compile_s > 0
    np.testing.assert_array_equal(sim.get_solution(), q_before)
    assert sim.step == 0

    timer = StepTimer(sim)
    sim.add_monitor(timer)
    sim.run()
    s = timer.summary()
    assert s["steady_steps"] > 0
    assert s["cell_updates_per_s"] > 0


def test_binary_checkpoint_restart_equivalence(ex2b_dir):
    """ex2b's checkpoint.format is 'binary': the binary checkpoint must
    round-trip to a bitwise-identical continuation (same oracle as HDF5)."""
    ckpt = str(ex2b_dir / "mid.bin")

    cfg = short_config(ex2b_dir / "ex2b.yaml", stop_n=100)
    sim_a = Simulation(cfg)

    def mid_ckpt(sim):
        if sim.step == 50:
            write_checkpoint(sim, ckpt)

    sim_a.monitor_stride = 50
    sim_a.add_monitor(mid_ckpt)
    sim_a.run()

    sim_c = Simulation(short_config(ex2b_dir / "ex2b.yaml", stop_n=100))
    restore_from_checkpoint(sim_c, ckpt)
    assert sim_c.step == 50
    sim_c.run()
    np.testing.assert_array_equal(sim_a.get_solution(), sim_c.get_solution())
