"""Embedded C coupling API: the reference's C/Fortran binding layer
analogue (include/rdycore.h + src/f90-mod/rdycore.F90). Builds
librdycore_tpu_capi.so + the C driver (csrc/test_capi.c — the
driver/main.c loop: create -> set source / advance / sanity-check ->
destroy) and runs it in a subprocess; compile-checks the Fortran module
when gfortran is available."""

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIG = """
physics:
  flow:
    mode: swe
numerics:
  spatial: fv
  temporal: euler
  riemann: roe
  precision: single
logging:
  level: none
time:
  stop: 0.05
  unit: seconds
  time_step: 0.001
  coupling_interval: 0.01
output:
  format: none
grid:
  file: {repo}/examples/dam_break.npz
regions:
  - name: reservoir
    grid_region_id: 1
  - name: floodplain
    grid_region_id: 2
surface_composition:
  - region: reservoir
    material: smooth
  - region: floodplain
    material: smooth
materials:
  - name: smooth
    properties:
      manning:
        value: 0.018
initial_conditions:
  - region: reservoir
    flow: column
  - region: floodplain
    flow: wet_bed
flow_conditions:
  - name: column
    type: dirichlet
    height: 0.25
    x_momentum: 0
    y_momentum: 0
  - name: wet_bed
    type: dirichlet
    height: 0.05
    x_momentum: 0
    y_momentum: 0
"""


def _have(tool):
    return shutil.which(tool) is not None


@pytest.fixture(scope="module")
def capi_build():
    if not (_have("g++") or _have("gcc")):
        pytest.skip("no C compiler")
    if not _have("python3-config"):
        pytest.skip("no python3-config (embedding headers unavailable)")
    r = subprocess.run(
        ["make", "-C", os.path.join(REPO, "csrc"), "capi"],
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        pytest.fail(f"capi build failed:\n{r.stdout}\n{r.stderr}")
    return os.path.join(REPO, "csrc", "test_capi")


@pytest.fixture(scope="module")
def dam_break_mesh():
    """The example meshes are generated artifacts (gitignored); build the
    dam-break one on demand so a fresh clone passes."""
    path = os.path.join(REPO, "examples", "dam_break.npz")
    if not os.path.exists(path):
        import numpy as np

        from rdycore_tpu.mesh import structured_quad
        from rdycore_tpu.mesh.core import save_mesh_npz

        mesh = structured_quad(
            200, 100, 0.0, 2.0, 0.0, 1.0,
            region_fn=lambda cx, cy: np.where(cx < 1.0, 1, 2),
        )
        save_mesh_npz(mesh, path)
    return path


def test_c_coupling_driver(capi_build, dam_break_mesh, tmp_path):
    cfg = tmp_path / "rain.yaml"
    cfg.write_text(CONFIG.format(repo=REPO))
    env = dict(os.environ)
    env["RDYTPU_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [capi_build, str(cfg), str(tmp_path / "ckpt.h5"),
         str(tmp_path / "onedof.bin")],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, f"\n{r.stdout}\n{r.stderr}"
    assert "OK:" in r.stdout
    assert "checkpoint round-trip bitwise" in r.stdout
    assert "one-DOF vec round-trip + set_initial_conditions" in r.stdout


def test_f90_module_compiles(tmp_path):
    """The iso_c_binding Fortran module (coupling/rdycore_tpu.F90) must
    compile standalone — it ships as source for the E3SM host's
    compiler."""
    fc = shutil.which("gfortran") or shutil.which("flang")
    if fc is None:
        pytest.skip("no Fortran compiler in this image")
    r = subprocess.run(
        [fc, "-c", os.path.join(REPO, "coupling", "rdycore_tpu.F90"),
         "-o", str(tmp_path / "m.o"), "-J", str(tmp_path)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr


def test_c_coupling_driver_bad_config(capi_build, tmp_path):
    """A nonexistent config must fail with a nonzero exit code (the
    reference's bad_input negative-test pattern), not crash or hang."""
    env = dict(os.environ)
    env["RDYTPU_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [capi_build, str(tmp_path / "nope.yaml")],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert r.returncode != 0
