"""Golden-value regression anchors: catch accidental numerics changes.

Values generated from the f64 CPU run of this commit's physics on the
reference's ex2b dam-break fixture (200 euler steps, dt = 5e-6 h). Any
intentional numerics change must regenerate them (see the command in the
test docstring) and justify itself against the MMS convergence studies.
"""

import shutil

import numpy as np
import pytest

from rdycore_tpu.config.yaml_input import load_config
from rdycore_tpu.simulation import Simulation

GOLDEN = {
    "h_mean": 1.7672264805223483,
    "h_max": 1.91711019083429,
    "hu_sum": -27.128002102431697,
    "hv_sum": -29.347652134303818,
    "h_7": 1.91711019083429,
    "hu_23": -2.0645725848554375,
}


def test_ex2b_golden_values(tmp_path):
    """Regenerate with:
    python - <<'EOF'
    ... run ex2b 200 steps f64, print the GOLDEN fields ...
    EOF
    """
    shutil.copy(
        "/root/reference/driver/tests/swe_roe/ex2b.yaml", tmp_path / "ex2b.yaml"
    )
    cfg = load_config(str(tmp_path / "ex2b.yaml"))
    cfg.time.stop_n = 200
    cfg.time.stop = None
    cfg.time.time_step = 5e-6
    cfg.validate()
    cfg.logging.level = "none"
    cfg.output.format = "none"
    cfg.checkpoint.interval = 0
    sim = Simulation(cfg)
    sim.run()
    q = sim.get_solution()

    got = {
        "h_mean": float(q[0].mean()),
        "h_max": float(q[0].max()),
        "hu_sum": float(q[1].sum()),
        "hv_sum": float(q[2].sum()),
        "h_7": float(q[0][7]),
        "hu_23": float(q[1][23]),
    }
    for k, want in GOLDEN.items():
        assert got[k] == pytest.approx(want, rel=1e-8), (
            f"{k}: got {got[k]!r}, golden {want!r}"
        )
