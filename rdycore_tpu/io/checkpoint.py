"""Checkpoint / restart (src/checkpoint.c).

Checkpoints store metadata {t, dt, step} + the solution in *natural cell
order* so restarts are partition-independent (checkpoint.c:49-137,187-203).
HDF5 format; E3SM-style file names '<prefix>.rdycore.r.<NNNN>.h5'
(checkpoint.c:141-151). Restart re-seeds {t, dt, step} unless
restart.reinitialize resets time to 0 (rdyconfigimpl.h:183-186).
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:
    from ..simulation import Simulation


def checkpoint_filename(
    directory: str, prefix: str, step: int, fmt: str = "hdf5"
) -> str:
    ext = "h5" if fmt == "hdf5" else "bin"
    return os.path.join(directory, f"{prefix}.rdycore.r.{step:04d}.{ext}")


def write_checkpoint(sim: "Simulation", path: str) -> None:
    q = sim.get_solution()  # [ndof, C] local order
    nat = sim.get_natural_ids()
    order = np.argsort(nat)
    sol = q[:, order]  # natural order

    if path.endswith(".bin"):
        # binary format (the reference's PETSc-binary checkpoints): two Vec
        # records, metadata {nproc, t, dt, step} then the blocked solution
        # (checkpoint.c:49-137)
        import struct

        from .petsc_binary import VEC_FILE_CLASSID

        meta = np.array([1.0, sim.t, sim.dt, float(sim.step)])
        blocked = sol.T.reshape(-1)
        with open(path, "wb") as f:
            for vec in (meta, blocked):
                f.write(struct.pack(">i", VEC_FILE_CLASSID))
                f.write(struct.pack(">i", vec.size))
                f.write(vec.astype(">f8").tobytes())
        return

    import h5py

    with h5py.File(path, "w") as f:
        f.attrs["t"] = sim.t
        f.attrs["dt"] = sim.dt
        f.attrs["step"] = sim.step
        f.attrs["num_cells"] = sim.num_cells
        f.create_dataset("solution", data=sol)


def read_checkpoint(path: str):
    if path.endswith(".bin"):
        from .petsc_binary import read_petsc_vecs

        meta_vec, blocked = read_petsc_vecs(path)[:2]
        ndof_times_c = len(blocked)
        meta = {
            "t": float(meta_vec[1]),
            "dt": float(meta_vec[2]),
            "step": int(meta_vec[3]),
        }
        # infer layout from the caller (restore checks num_cells)
        meta["num_cells"] = None
        meta["_blocked"] = blocked
        return meta, blocked

    import h5py

    with h5py.File(path, "r") as f:
        meta = {
            "t": float(f.attrs["t"]),
            "dt": float(f.attrs["dt"]),
            "step": int(f.attrs["step"]),
            "num_cells": int(f.attrs["num_cells"]),
        }
        sol = np.asarray(f["solution"])
    return meta, sol


def restore_from_checkpoint(sim: "Simulation", path: str, reinitialize: bool = False):
    meta, sol = read_checkpoint(path)
    if sol.ndim == 1:  # binary: blocked flat vector
        if len(sol) % sim.num_cells:
            raise ValueError(
                f"binary checkpoint has {len(sol)} values; not a multiple of "
                f"{sim.num_cells} cells"
            )
        sol = sol.reshape(sim.num_cells, -1).T
    if meta.get("num_cells") not in (None, sim.num_cells):
        raise ValueError(
            f"checkpoint has {meta['num_cells']} cells; mesh has {sim.num_cells}"
        )
    nat = sim.get_natural_ids()
    order = np.argsort(nat)
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    sim.set_solution(sol[:, inv])
    if not reinitialize:
        sim.t = meta["t"]
        sim.dt = meta["dt"]
        sim.step = meta["step"]


class CheckpointMonitor:
    def __init__(self, sim: "Simulation"):
        cfg = sim.config
        self.interval = cfg.checkpoint.interval
        self.prefix = cfg.checkpoint.prefix or cfg.output.prefix or "sim"
        self.fmt = cfg.checkpoint.format
        self.dir = os.path.join(cfg.config_dir, cfg.output.directory)
        os.makedirs(self.dir, exist_ok=True)
        self.last_written = -1

    def __call__(self, sim: "Simulation"):
        if (
            self.interval
            and sim.step % self.interval == 0
            and sim.step != self.last_written
        ):
            path = checkpoint_filename(self.dir, self.prefix, sim.step, self.fmt)
            write_checkpoint(sim, path)
            sim.log.detail(f"wrote checkpoint {path}")
            self.last_written = sim.step
