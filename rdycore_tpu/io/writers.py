"""Output monitors: XDMF/HDF5 output, checkpointing, time series.

The reference registers TSMonitors for XDMF output (xdmf_output.c),
checkpoints (checkpoint.c) and time series (time_series.c). Here monitors
are per-coupling-interval callbacks on the Simulation.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:
    from ..simulation import Simulation

# output field name -> (array source, component) following the reference's
# field names (ex2b_ic_file.yaml output.fields)
_FIELD_COMPONENTS = {
    "Height": ("sol", 0),
    "MomentumX": ("sol", 1),
    "MomentumY": ("sol", 2),
    "VelocityX": ("prim", 1),
    "VelocityY": ("prim", 2),
    "WaterSource": ("src", 0),
    "MomentumXSource": ("src", 1),
    "MomentumYSource": ("src", 2),
}

DEFAULT_FIELDS = ["Height", "MomentumX", "MomentumY"]


def output_filename(cfg, directory, prefix, step, t, suffix):
    """Reference filename conventions (rdyadvance.c:65-151):

    - when time.date ("YYYY-MM-DD-hh:mm:ss", sscanf'd leniently like
      yaml_input.c:948) is set: '<prefix>.YYYY-MM-DD.hh.mm.ss.<suffix>'
      at simulation date + t seconds (GenerateTimestampedFilename);
    - otherwise '<prefix>-<step 0-padded to digits of stop_n>.<suffix>'
      (GenerateIndexedFilename).
    """
    if cfg.time.date:
        import datetime as _dt
        import re

        nums = [int(x) for x in re.findall(r"\d+", cfg.time.date)[:6]]
        nums += [0] * (6 - len(nums))
        y, mo, d, hh, mm, ss = nums
        stamp = _dt.datetime(y, mo, d, hh, mm, ss) + _dt.timedelta(
            seconds=float(t)
        )
        name = (
            f"{prefix}.{stamp.year:04d}-{stamp.month:02d}-{stamp.day:02d}"
            f".{stamp.hour:02d}.{stamp.minute:02d}.{stamp.second:02d}"
            f".{suffix}"
        )
    else:
        import math

        nd = int(math.log10(max(cfg.time.stop_n or 1, 1))) + 1
        name = f"{prefix}-{step:0{nd}d}.{suffix}"
    return os.path.join(directory, name)


def attach_output_monitors(sim: "Simulation") -> None:
    cfg = sim.config
    if cfg.output.format == "xdmf":
        sim.add_monitor(XDMFWriter(sim))
    elif cfg.output.format == "binary":
        sim.add_monitor(BinaryWriter(sim))
    elif cfg.output.format == "cgns":
        from .cgns import CGNSWriter

        sim.add_monitor(CGNSWriter(sim))
    if cfg.checkpoint.interval:
        from .checkpoint import CheckpointMonitor

        sim.add_monitor(CheckpointMonitor(sim))
    if cfg.output.time_series.boundary_fluxes or (
        cfg.output.time_series.observations.interval
        and cfg.output.time_series.observations.sites.cells
    ):
        from .time_series import TimeSeriesMonitor

        sim.add_monitor(TimeSeriesMonitor(sim))


def collect_output_fields(sim: "Simulation", fields) -> list:
    """Evaluate the configured output fields against the current state.

    Returns [(name, 1-D float array over cells)] following the reference's
    field names + dt-weighted '_Mean' variants (xdmf_output.c:179-241).
    """
    sol = sim.get_solution()
    prim = None
    src = np.asarray(sim.ext_src)
    atime = sim.accum_time
    out = []
    for name in fields:
        mean = name.endswith("_Mean")
        base = name[:-5] if mean else name
        spec = _FIELD_COMPONENTS.get(base)
        if spec is None:
            continue
        kind, comp = spec
        if mean and atime > 0:
            if kind == "sol":
                data = sim.accum_sol[comp] / atime
            elif kind == "prim":
                data = sim.accum_prim[comp] / atime
            else:
                data = src[comp]
        else:
            if kind == "sol":
                data = sol[comp]
            elif kind == "prim":
                if prim is None:
                    prim = _primitives(sim, sol)
                data = prim[comp]
            else:
                data = src[comp]
        out.append((name, np.asarray(data)))
    return out


class XDMFWriter:
    """HDF5 heavy data + XMF light XML, in natural cell order
    (xdmf_output.c:254-434). One HDF5 file per run; one XMF referencing it."""

    def __init__(self, sim: "Simulation"):
        self.sim = sim
        cfg = sim.config
        self.dir = os.path.join(cfg.config_dir, cfg.output.directory)
        os.makedirs(self.dir, exist_ok=True)
        self.prefix = cfg.output.prefix or "output"
        self.fields = cfg.output.fields or DEFAULT_FIELDS
        self.interval = cfg.output.output_interval or 1
        # temporal cadence (output.time_interval in output.time_unit)
        from ..config.schema import time_to_seconds

        self.time_interval = (
            time_to_seconds(cfg.output.time_interval, cfg.output.time_unit)
            if cfg.output.time_interval
            else 0.0
        )
        self._next_time = self.time_interval
        self.batch_size = max(cfg.output.batch_size, 1)
        self._last_step = -1
        self._wrote_grid = False
        self._times = []
        self._opened_batches = set()
        self._write_step()  # initial condition snapshot

    def _due(self, sim: "Simulation") -> bool:
        if self.time_interval:
            if sim.t + 1e-12 >= self._next_time or sim.finished:
                while self._next_time <= sim.t + 1e-12:
                    self._next_time += self.time_interval
                return True
            return False
        return sim.step % self.interval == 0 or sim.finished

    def __call__(self, sim: "Simulation"):
        if self._due(sim) and sim.step != self._last_step:
            self._last_step = sim.step
            self._write_step()

    def _h5_for_snapshot(self, index: int) -> str:
        """Heavy data is split into files of batch_size snapshots
        (xdmf_output.c batch behavior); the grid lives in its own file.
        With batch_size 1 and a simulation start date, each snapshot's
        file is timestamped instead (DetermineOutputFile,
        rdyadvance.c:117-125)."""
        if self.batch_size == 1 and self.sim.config.time.date:
            t = self._times[index] if index < len(self._times) else self.sim.t
            return output_filename(
                self.sim.config, self.dir, self.prefix, index, t, "h5"
            )
        batch = index // self.batch_size
        return os.path.join(self.dir, f"{self.prefix}.{batch:03d}.h5")

    def _write_step(self):
        import h5py

        sim = self.sim
        if not self._wrote_grid:
            grid_path = os.path.join(self.dir, f"{self.prefix}.grid.h5")
            with h5py.File(grid_path, "w") as f:
                self._write_grid(f)
            self._wrote_grid = True
        snap = len(self._times)
        path = self._h5_for_snapshot(snap)
        # truncate each batch file the first time THIS run touches it, so
        # re-running over a previous run's output never collides with stale
        # snapshot groups (the reference overwrites its output files too)
        mode = "a" if path in self._opened_batches else "w"
        self._opened_batches.add(path)
        with h5py.File(path, mode) as f:
            g = f.require_group(f"{snap}")
            for name, data in collect_output_fields(sim, self.fields):
                g.create_dataset(name, data=data)
            g.attrs["time"] = sim.t
            g.attrs["step"] = sim.step
        self._times.append(sim.t)
        self._write_xmf()

    def _write_grid(self, f):
        mesh = self.sim.mesh
        # mixed topology: XDMF mixed element list [type, v0, v1, ...]
        topo = []
        for c in range(mesh.num_cells):
            nv = int(mesh.cell_num_vertices[c])
            topo.append(4 if nv == 3 else 5)  # 4=Triangle, 5=Quadrilateral
            topo.extend(int(v) for v in mesh.cell_vertices[c, :nv])
        grid = f.require_group("grid")
        grid.create_dataset("topology", data=np.asarray(topo, dtype=np.int64))
        grid.create_dataset("points", data=mesh.points)

    def _write_xmf(self):
        mesh = self.sim.mesh
        xmf_path = os.path.join(self.dir, f"{self.prefix}.xmf")
        grid_h5 = f"{self.prefix}.grid.h5"
        ncells = mesh.num_cells
        npts = mesh.num_vertices
        topo_len = sum(int(n) + 1 for n in mesh.cell_num_vertices)
        parts = [
            '<?xml version="1.0" ?>',
            '<Xdmf Version="3.0">',
            "<Domain>",
            '<Grid Name="time_series" GridType="Collection" CollectionType="Temporal">',
        ]
        for i, t in enumerate(self._times):
            h5 = os.path.basename(self._h5_for_snapshot(i))
            parts += [
                f'<Grid Name="step_{i}" GridType="Uniform">',
                f'<Time Value="{t}"/>',
                f'<Topology TopologyType="Mixed" NumberOfElements="{ncells}">',
                f'<DataItem Format="HDF" Dimensions="{topo_len}">{grid_h5}:/grid/topology</DataItem>',
                "</Topology>",
                '<Geometry GeometryType="XYZ">',
                f'<DataItem Format="HDF" Dimensions="{npts} 3">{grid_h5}:/grid/points</DataItem>',
                "</Geometry>",
            ]
            for name in self.fields:
                parts += [
                    f'<Attribute Name="{name}" Center="Cell">',
                    f'<DataItem Format="HDF" Dimensions="{ncells}">{h5}:/{i}/{name}</DataItem>',
                    "</Attribute>",
                ]
            parts.append("</Grid>")
        parts += ["</Grid>", "</Domain>", "</Xdmf>"]
        with open(xmf_path, "w") as f:
            f.write("\n".join(parts))


class BinaryWriter:
    """PETSc-binary output (the reference's OUTPUT_BINARY viewer): one Vec
    per snapshot, solution blocked per cell in natural order, file name
    '<prefix>-<step>.bin' (DetermineOutputFile, rdyadvance.c:65-151)."""

    def __init__(self, sim: "Simulation"):
        cfg = sim.config
        self.dir = os.path.join(cfg.config_dir, cfg.output.directory)
        os.makedirs(self.dir, exist_ok=True)
        self.prefix = cfg.output.prefix or "output"
        self.interval = cfg.output.output_interval or 1
        self._last_step = -1
        self._write(sim)

    def __call__(self, sim: "Simulation"):
        due = sim.step % self.interval == 0 or sim.finished
        if due and sim.step != self._last_step:
            self._last_step = sim.step
            self._write(sim)

    def _write(self, sim: "Simulation"):
        from .petsc_binary import write_petsc_vec

        sol = sim.get_solution()  # [ndof, C]
        nat = np.argsort(sim.get_natural_ids())
        blocked = sol[:, nat].T.reshape(-1)  # cell-blocked, natural order
        path = output_filename(
            sim.config, self.dir, self.prefix, sim.step, sim.t, "bin"
        )
        write_petsc_vec(path, blocked)


def _primitives(sim, sol):
    h = sol[0]
    tiny = sim.config.physics.flow.tiny_h
    ha = sim.config.physics.flow.h_anuga_reg_parameter
    denom = h * h + ha * ha
    denom = np.where(denom > 0, denom, 1.0)
    wet = h >= tiny
    return np.stack(
        [h, np.where(wet, sol[1] * h / denom, 0.0), np.where(wet, sol[2] * h / denom, 0.0)]
    )
