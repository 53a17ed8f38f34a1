"""Byte-level bridge behind the embedded C API (csrc/capi.c).

The C shim (and the Fortran module bound to it, coupling/rdycore_tpu.F90)
talks to the Simulation coupling surface exclusively through this module:
scalars and `bytes` in/out, so the C side needs only the stable CPython
API — no NumPy headers, no jax headers. This is the TPU build's analogue
of the reference's C/Fortran binding layer (src/f90-mod/rdycore.F90 +
include/rdycore.h): same lifecycle (create → advance loop → destroy) and
the per-interval set-sources/BCs → advance → get-state coupling pattern
of driver/main.F90.
"""

from __future__ import annotations

import numpy as np

_sims: dict = {}
_next_handle = [1]


def create(config_path: str) -> int:
    """RDyCreate + RDySetup: returns an opaque handle."""
    import os

    import jax

    # hosts embedding this library can force a platform even when the
    # environment pre-sets another (e.g. a remote-TPU env var baked into
    # the image): RDYTPU_PLATFORM wins over JAX_PLATFORMS
    plat = os.environ.get("RDYTPU_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    from .config.yaml_input import load_config
    from .simulation import Simulation

    sim = Simulation(load_config(config_path))
    h = _next_handle[0]
    _next_handle[0] += 1
    _sims[h] = sim
    return h


def destroy(h: int) -> None:
    _sims.pop(h, None)


def advance(h: int) -> None:
    _sims[h].advance()


def finished(h: int) -> bool:
    return bool(_sims[h].finished)


def num_cells(h: int) -> int:
    return int(_sims[h].mesh.num_cells)


def num_boundary_edges(h: int, boundary: str) -> int:
    return int(_sims[h].get_num_boundary_edges(boundary))


def time(h: int) -> float:
    return float(_sims[h].get_time())


def time_step(h: int) -> float:
    return float(_sims[h].get_time_step())


def step(h: int) -> int:
    return int(_sims[h].get_step())


def coupling_interval(h: int) -> float:
    return float(_sims[h].get_coupling_interval())


def set_coupling_interval(h: int, value: float) -> None:
    _sims[h].set_coupling_interval(value)


# ---- state getters (f64 bytes, natural cell order of the config grid) ----

def _bytes(a) -> bytes:
    return np.ascontiguousarray(a, dtype=np.float64).tobytes()


def get_height(h: int) -> bytes:
    return _bytes(_sims[h].get_height())


def get_x_momentum(h: int) -> bytes:
    return _bytes(_sims[h].get_x_momentum())


def get_y_momentum(h: int) -> bytes:
    return _bytes(_sims[h].get_y_momentum())


def get_cell_areas(h: int) -> bytes:
    return _bytes(_sims[h].get_cell_areas())


def get_cell_centroids(h: int) -> bytes:  # [C, 3] row-major
    return _bytes(_sims[h].get_cell_centroids())


def get_natural_ids(h: int) -> bytes:  # int64
    return np.ascontiguousarray(
        _sims[h].get_natural_ids(), dtype=np.int64
    ).tobytes()


def get_manning_n(h: int) -> bytes:
    return _bytes(_sims[h].get_manning_n())


# ---- coupling setters (the driver/main.F90 pattern) ----------------------

def set_domain_water_source(h: int, buf: bytes) -> None:
    _sims[h].set_domain_water_source(
        np.frombuffer(buf, dtype=np.float64).copy()
    )


def set_regional_water_source(h: int, region: str, buf: bytes) -> None:
    _sims[h].set_regional_water_source(
        region, np.frombuffer(buf, dtype=np.float64).copy()
    )


def set_manning_n(h: int, buf: bytes) -> None:
    _sims[h].set_manning_n(np.frombuffer(buf, dtype=np.float64).copy())


def set_flow_dirichlet_boundary_values(
    h: int, boundary: str, buf: bytes
) -> None:
    """buf: n_edges * 3 doubles, edge-major (h, hu, hv per edge — the
    reference's RDySetFlowDirichletBoundaryValues layout)."""
    vals = np.frombuffer(buf, dtype=np.float64).copy()
    _sims[h].set_flow_dirichlet_boundary_values(boundary, vals)


def write_checkpoint(h: int, path: str) -> None:
    """RDyWriteHDF5CheckpointFile: coupler-driven checkpoint."""
    _sims[h].write_checkpoint(path)


def read_checkpoint(h: int, path: str) -> None:
    """RDyReadHDF5CheckpointFile."""
    _sims[h].read_checkpoint(path)


# ---- misc API parity (RDyConvertTime, boundary metadata, one-DOF IO) -----

def convert_time(value: float, unit_from: str, unit_to: str) -> float:
    """RDyConvertTime."""
    from .simulation import Simulation

    return float(Simulation.convert_time(value, unit_from, unit_to))


def version() -> bytes:
    from . import __version__

    return __version__.encode()


def num_boundary_conditions(h: int) -> int:
    return int(_sims[h].get_num_boundary_conditions())


def boundary_id(h: int, boundary: str) -> int:
    return int(_sims[h].get_boundary_id(boundary))


def boundary_condition_flow_type(h: int, boundary: str) -> int:
    return int(_sims[h].get_boundary_condition_flow_type(boundary))


def get_boundary_edge_centroids(h: int, boundary: str) -> bytes:
    """[n_edges, 3] row-major (RDyGetBoundaryEdge{X,Y,Z}Centroids)."""
    return _bytes(_sims[h].get_boundary_edge_centroids(boundary))


def get_solution(h: int) -> bytes:
    """Cell-major interleaved [C, ndof] (PETSc Vec blocksize-ndof layout),
    matching the reference's RDyCreatePrognosticVec/RDyGetSolution* so a
    host ported from the reference passes buffers unchanged. The internal
    Python layout is [ndof, C]; this bridge transposes at the boundary."""
    return _bytes(np.ascontiguousarray(_sims[h].get_solution().T))


def set_initial_conditions(h: int, buf: bytes) -> None:
    """RDySetInitialConditions: ndof*C doubles, cell-major interleaved
    [C, ndof] (see get_solution)."""
    sim = _sims[h]
    q = np.frombuffer(buf, dtype=np.float64).reshape(sim.mesh.num_cells, -1)
    sim.set_initial_conditions(np.ascontiguousarray(q.T))


def read_one_dof_vec(h: int, path: str) -> bytes:
    """RDyReadOneDOFGlobalVecFromBinaryFile: per-cell values in the
    simulation's cell order."""
    return _bytes(_sims[h].read_one_dof_vec_from_binary(path))


def write_one_dof_vec(h: int, path: str, buf: bytes) -> None:
    """RDyWriteOneDOFGlobalVecToBinaryFile."""
    _sims[h].write_one_dof_vec_to_binary(
        path, np.frombuffer(buf, dtype=np.float64).copy()
    )
