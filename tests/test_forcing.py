"""Forcing tests: reference fixture datasets (Houston rain, hourly rasters)
+ rain mass balance."""

import datetime

import numpy as np
import pytest

from rdycore_tpu.forcing import (
    ConstantRain,
    Forcing,
    HomogeneousDataset,
    RasterDataset,
    attach_forcing,
    interp_time_series,
)

COND = "/root/reference/share/conditions"


def test_interp_time_series():
    pairs = np.array([[0.0, 1.0], [10.0, 2.0], [20.0, 4.0]])
    assert interp_time_series(pairs, 5.0, False) == 1.0
    assert interp_time_series(pairs, 5.0, True) == pytest.approx(1.5)
    assert interp_time_series(pairs, 25.0, True) == 4.0  # hold last
    assert interp_time_series(pairs, -1.0, False) == 1.0


def test_houston_rain_fixture():
    ds = HomogeneousDataset(f"{COND}/Houston1km.rain.int32.bin")
    assert ds.pairs.shape[1] == 2
    t0 = ds.pairs[0, 0]
    v = ds.value_at(t0)
    assert np.isfinite(v)


def test_hourly_raster_fixture():
    mesh_xy = np.array([[0.0, 0.0], [1000.0, 2000.0]])
    # probe the header to learn the raster's actual extent first
    from rdycore_tpu.io.petsc_binary import read_petsc_vec

    vals = read_petsc_vec(f"{COND}/2017-08-26:00-00.int32.bin")
    ncols, nrows, xlc, ylc, cellsize = (
        int(vals[0]), int(vals[1]), vals[2], vals[3], vals[4],
    )
    assert ncols * nrows == len(vals) - 5
    mesh_xy = np.array(
        [
            [xlc, ylc],
            [xlc + cellsize * (ncols - 1), ylc + cellsize * (nrows - 1)],
            [xlc + cellsize * ncols / 2, ylc + cellsize * nrows / 2],
        ]
    )
    ds = RasterDataset(
        directory=COND,
        start_date=datetime.datetime(2017, 8, 26, 0, 0),
        mesh_xy=mesh_xy,
    )
    r0 = ds.rates_at(0.0)
    assert r0.shape == (3,)
    # the fixtures ship hours 00 and 01; advance to the second file
    r1 = ds.rates_at(3600.0)
    assert ds.current_date.hour == 1
    assert np.isfinite(r1).all()


def test_rain_mass_balance(tmp_path):
    """Constant rain on a closed box: volume gain = rate * area * time."""
    import jax.numpy as jnp

    from rdycore_tpu.config.schema import Config
    from rdycore_tpu.mesh import structured_quad
    from rdycore_tpu.simulation import Simulation

    cfg = Config()
    cfg.time.stop = 10.0
    cfg.time.time_step = 0.01
    cfg.time.coupling_interval = 2.0
    cfg.logging.level = "none"
    cfg.validate()
    mesh = structured_quad(8, 8)
    sim = Simulation(cfg, mesh=mesh)
    sim.set_solution(np.zeros((3, mesh.num_cells)) + [[1.0], [0.0], [0.0]])

    rate = 1e-4  # m/s
    forcing = Forcing(constant_rain=ConstantRain(rate))
    attach_forcing(sim, forcing)

    area = mesh.cell_area
    v0 = float((sim.get_height() * area).sum())
    sim.run()
    v1 = float((sim.get_height() * area).sum())
    expect = rate * area.sum() * 10.0
    assert v1 - v0 == pytest.approx(expect, rel=1e-10)
