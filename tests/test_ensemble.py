"""Ensemble tests (reference: ex2b-ensemble.yaml + src/ensemble.c)."""

import shutil

import numpy as np

from rdycore_tpu.config.yaml_input import load_config
from rdycore_tpu.ensemble import EnsembleSimulation, member_config
from rdycore_tpu.simulation import Simulation


def _cfg(tmp_path, stop_n=50):
    shutil.copy(
        "/root/reference/driver/tests/swe_roe/ex2b-ensemble.yaml",
        tmp_path / "e.yaml",
    )
    cfg = load_config(str(tmp_path / "e.yaml"))
    cfg.time.stop_n = stop_n
    cfg.time.stop = None
    cfg.time.time_step = 5e-6
    cfg.validate()
    cfg.logging.level = "none"
    cfg.output.format = "none"
    return cfg


def test_member_config_overrides(tmp_path):
    cfg = _cfg(tmp_path)
    m0 = member_config(cfg, 0)
    m1 = member_config(cfg, 1)
    assert m0.materials[0].properties.manning.value == 0.015
    assert m1.materials[0].properties.manning.value == 0.030
    assert m0.ensemble.size == 0  # members don't recurse
    assert m0.output.directory.endswith("member_0")


def test_vmapped_ensemble_matches_independent_runs(tmp_path):
    cfg = _cfg(tmp_path)
    ens = EnsembleSimulation(cfg)
    assert ens.vmapped
    ens.run()

    # each member must match a standalone simulation with the same config
    for i in range(2):
        solo = Simulation(member_config(_cfg(tmp_path), i))
        solo.run()
        np.testing.assert_allclose(
            ens.members[i].get_solution(), solo.get_solution(), atol=1e-13
        )

    # members with different Manning n must diverge from each other
    assert not np.allclose(
        ens.members[0].get_solution(), ens.members[1].get_solution()
    )
