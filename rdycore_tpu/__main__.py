"""CLI driver: the analogue of the reference's `rdycore` executable
(driver/main.c): create -> setup -> advance loop -> report.

Usage:
    python -m rdycore_tpu <config.yaml> [--dt SECONDS] [--cpu] [--f32|--f64]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="rdycore_tpu")
    ap.add_argument("config", help="YAML configuration file")
    ap.add_argument("--dt", type=float, default=None, help="override time step [config units]")
    ap.add_argument("--cpu", action="store_true", help="run on CPU")
    ap.add_argument("--f32", action="store_true", help="force single precision")
    ap.add_argument("--f64", action="store_true", help="force double precision")
    ap.add_argument("--mms", action="store_true", help="run as an MMS problem (like rdycore_mms)")
    # forcing options (the F90/E3SM driver's -rain / -bc dataset options,
    # driver/main.F90:197-338)
    ap.add_argument("--constant-rain-rate", type=float, default=None, help="[m/s]")
    ap.add_argument("--homogeneous-rain-file", default=None)
    ap.add_argument("--temporally-interpolate-rain", action="store_true")
    ap.add_argument("--raster-rain-dir", default=None)
    ap.add_argument("--homogeneous-bc-file", default=None, metavar="BOUNDARY=FILE")
    # AMR driver options (driver/amr.c: time-stamped refinement rasters)
    ap.add_argument(
        "--pause", action="store_true",
        help="print PID and wait for Enter (debugger attach; the reference's "
             "-pause, rdysetup.c:1292-1332)",
    )
    ap.add_argument("--amr-dataset-dir", default=None)
    ap.add_argument("--amr-area-threshold", type=float, default=0.125)
    ap.add_argument(
        "--output-dir", default=None,
        help="override output.directory (outputs normally land next to the "
             "config file; use this to drive read-only configs)",
    )
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from rdycore_tpu.config.yaml_input import load_config

    if args.pause:
        import os as _os

        print(f"rdycore_tpu pid: {_os.getpid()} -- press Enter to continue")
        input()

    cfg = load_config(args.config)
    if args.output_dir is not None:
        import os as _os

        # os.path.join(config_dir, <absolute>) keeps the absolute path, so
        # every writer (XDMF/CGNS/checkpoint/time series) lands here
        cfg.output.directory = _os.path.abspath(args.output_dir)
    if args.dt is not None:
        cfg.time.time_step = args.dt
    if args.f32:
        cfg.numerics.precision = "single"
    if args.f64:
        cfg.numerics.precision = "double"
    if cfg.numerics.precision == "double":
        jax.config.update("jax_enable_x64", True)

    if args.mms:
        from rdycore_tpu.mms import MMSDriver

        drv = MMSDriver(cfg)
        ok = drv.run()
        return 0 if ok else 1

    from rdycore_tpu.simulation import Simulation
    from rdycore_tpu.io.writers import attach_output_monitors

    sim = Simulation(cfg)
    attach_output_monitors(sim)

    if (
        args.constant_rain_rate is not None
        or args.homogeneous_rain_file
        or args.raster_rain_dir
        or args.homogeneous_bc_file
    ):
        import datetime

        from rdycore_tpu.forcing import (
            ConstantRain,
            Forcing,
            HomogeneousDataset,
            RasterDataset,
            attach_forcing,
        )

        forcing = Forcing()
        if args.constant_rain_rate is not None:
            forcing.constant_rain = ConstantRain(args.constant_rain_rate)
        if args.homogeneous_rain_file:
            forcing.homogeneous_rain = HomogeneousDataset(
                cfg.resolve_path(args.homogeneous_rain_file),
                temporally_interpolate=args.temporally_interpolate_rain,
            )
        if args.raster_rain_dir:
            start = (
                datetime.datetime.strptime(cfg.time.date, "%Y-%m-%d")
                if cfg.time.date
                else datetime.datetime(2017, 8, 26)
            )
            forcing.raster_rain = RasterDataset(
                directory=args.raster_rain_dir,
                start_date=start,
                mesh_xy=sim.mesh.cell_centroid[:, :2],
            )
        if args.homogeneous_bc_file:
            bname, _, fname = args.homogeneous_bc_file.partition("=")
            forcing.homogeneous_bc[bname] = HomogeneousDataset(
                cfg.resolve_path(fname)
            )
        attach_forcing(sim, forcing)
    sim.log.info(
        f"mesh: {sim.mesh.num_cells} cells, {sim.mesh.num_edges} edges; "
        f"dt = {sim.dt:.6g} s, t_final = {sim.t_final:.6g} s"
    )
    amr_dir = args.amr_dataset_dir
    if amr_dir:
        import datetime as _dt

        from rdycore_tpu.amr import mark_cells_from_raster, perform_amr
        from rdycore_tpu.forcing import dataset_filename
        from rdycore_tpu.io.petsc_binary import read_petsc_vec

        amr_start = (
            _dt.datetime.strptime(cfg.time.date, "%Y-%m-%d")
            if cfg.time.date
            else _dt.datetime(2011, 1, 1)
        )

    import numpy as _np
    import os as _os

    t0 = time.time()
    prev_t = sim.t
    amr_minute = 0
    while not sim.finished:
        if amr_dir:
            # the AMR driver advances the dataset one minute per coupling
            # interval; rasters live on the level-0 base mesh and are
            # injected onto the current mesh via the refine tree
            # (driver/amr.c:205-226)
            date = amr_start + _dt.timedelta(minutes=amr_minute)
            amr_minute += 1
            path = dataset_filename(amr_dir, date)
            if _os.path.exists(path):
                vals = read_petsc_vec(path)
                base_map = getattr(
                    sim, "amr_base_map", _np.arange(sim.mesh.num_cells)
                )
                current = vals[base_map]
                marked = mark_cells_from_raster(
                    current, sim.mesh.cell_area, args.amr_area_threshold
                )
                if marked.any():
                    perform_amr(sim, marked)
        sim.advance()
        assert sim.t > prev_t, "time did not advance"  # main.c sanity checks
        prev_t = sim.t
    wall = time.time() - t0
    sim.log.info(
        f"done: {sim.step} steps to t = {sim.t:.6g} s in {wall:.2f} s "
        f"({sim.step * sim.mesh.num_cells / max(wall, 1e-9):.3g} cell-updates/s)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
