"""Regression matrix over the reference's driver test cases: every case
must set up from its real YAML + fixtures and run a short stable stretch
(the analogue of driver/tests/*/CMakeLists.txt exit-status tests)."""

import shutil

import numpy as np
import pytest

from rdycore_tpu.config.yaml_input import load_config
from rdycore_tpu.simulation import Simulation

SWE = "/root/reference/driver/tests/swe_roe"
SED = "/root/reference/driver/tests/sediment"

CASES = [
    ("ex2b.yaml", SWE),
    ("ex2b_dirichlet_bc.yaml", SWE),
    ("ex2b_ic_file.yaml", SWE),
    ("four_mounds_60x24.yaml", SWE),
    ("parabolic_bowl.yaml", SWE),
    ("levee.hr.yaml", SWE),
    ("flume_flood.yaml", SWE),
    ("flume_flood_0.yaml", SWE),  # lake-at-rest well-balancing variant
    ("mixed_elements.yaml", SWE),
    ("mixed_elements_ic_file.yaml", SWE),
    ("quad_tri_mesh.yaml", SWE),
    ("Houston1km.DirichletBC.yaml", SWE),
    ("Houston1km.DirichletBC.adaptive_timestep.yaml", SWE),
    ("sediment.yaml", SED),
    ("sediment_ic_file.yaml", SED),
]


@pytest.mark.parametrize("case,directory", CASES, ids=[c for c, _ in CASES])
def test_reference_case_runs(case, directory, tmp_path):
    shutil.copy(f"{directory}/{case}", tmp_path / case)
    cfg = load_config(str(tmp_path / case))
    # shorten: ~20 steps, outputs off, keep physics exactly as configured
    cfg.time.stop_n = 20
    cfg.time.stop = None
    if cfg.time.time_step is None or cfg.time.adaptive.enable:
        cfg.time.adaptive.enable = False
        cfg.time.time_step = cfg.time.adaptive.initial_time_step or 1e-3
    # conservative dt: some reference configs use a single large trivial
    # step (e.g. mixed_elements: dt = 1 s for one step of a uniform state)
    cfg.time.time_step = min(cfg.time.time_step, 1e-2)
    cfg.time.coupling_interval = None
    cfg.validate()
    cfg.logging.level = "none"
    cfg.output.format = "none"
    cfg.checkpoint.interval = 0

    sim = Simulation(cfg)
    sim.run()
    q = sim.get_solution()
    assert np.isfinite(q).all(), f"{case}: non-finite state"
    assert sim.step == 20


def test_bad_input_fails_cleanly(tmp_path):
    """driver/tests/bad_input/nonexistent_boundary.yaml must fail with a
    clean error at setup."""
    shutil.copy(
        "/root/reference/driver/tests/bad_input/nonexistent_boundary.yaml",
        tmp_path / "bad.yaml",
    )
    from rdycore_tpu.config.schema import ConfigError

    cfg = load_config(str(tmp_path / "bad.yaml"))
    cfg.logging.level = "none"
    with pytest.raises(ConfigError):
        Simulation(cfg)


def test_cli_output_dir_override(tmp_path, monkeypatch):
    """--output-dir redirects every writer (XDMF + checkpoint + time
    series) away from the config's directory, so read-only reference
    configs can be driven in place (driver/main.c runs from a writable
    build tree; our configs may live on a read-only mount)."""
    import rdycore_tpu.__main__ as cli

    case_dir = tmp_path / "cfg"
    case_dir.mkdir()
    out_dir = tmp_path / "out"
    src = f"{SWE}/ex2b.yaml"
    text = open(src).read()
    text = text.replace("stop_n: 1000", "stop_n: 20")
    text = text.replace("interval: 100", "interval: 10")
    text = text.replace("output_interval: 100", "output_interval: 10")
    (case_dir / "ex2b.yaml").write_text(text)
    rc = cli.main([
        str(case_dir / "ex2b.yaml"), "--cpu",
        "--output-dir", str(out_dir),
    ])
    assert not rc
    produced = {p.name for p in out_dir.iterdir()}
    assert any(n.endswith(".h5") for n in produced), produced
    assert any(".rdycore.r." in n for n in produced), produced
    # nothing landed next to the config
    assert {p.name for p in case_dir.iterdir()} == {"ex2b.yaml"}
