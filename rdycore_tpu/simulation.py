"""The Simulation object: the TPU-native RDy lifecycle.

Mirrors the reference's RDy object lifecycle (docs/developer/organization.md;
src/rdycore.c, src/rdysetup.c, src/rdyadvance.c):

    sim = Simulation.from_file("case.yaml")   # RDyCreate + RDySetup
    while not sim.finished:                   # while (!RDyFinished(rdy))
        sim.advance()                         #   RDyAdvance(rdy)

plus the E3SM-style coupling surface (src/rdydata.c): get/set arrays in
natural cell order between coupling intervals.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config.expressions import compile_expression
from .config.schema import Config, ConfigError, time_to_seconds
from .config.yaml_input import load_config
from .constants import N_FLOW_DOF
from .logging_ import Logger
from .mesh.core import Mesh
from .mesh.exodus import read_exodus
from .mesh.gmsh import read_gmsh
from .operator import SWEOperator, build_operator
from .ops.swe import boundary as bc_mod
from .ops.swe.sources import SOURCE_IMPLICIT_XQ2018, SOURCE_SEMI_IMPLICIT
from .io.petsc_binary import read_petsc_vec
from .timestepping import adapt_timestep, make_interval_advancer

_BC_CODES = {
    "dirichlet": bc_mod.BC_DIRICHLET,
    "reflecting": bc_mod.BC_REFLECTING,
    "critical-outflow": bc_mod.BC_CRITICAL_OUTFLOW,
}

_SOURCE_CODES = {
    "semi_implicit": SOURCE_SEMI_IMPLICIT,
    "implicit_xq2018": SOURCE_IMPLICIT_XQ2018,
}


def load_mesh_file(path: str) -> Mesh:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".msh":
        return read_gmsh(path)
    if ext in (".exo", ".e", ".exo2"):
        return read_exodus(path)
    if ext == ".npz":
        from .mesh.core import load_mesh_npz

        return load_mesh_npz(path)
    raise ConfigError(f"unsupported mesh format '{ext}' ({path})")


class Simulation:
    """A configured simulation on a single device (multi-device lives in
    parallel/)."""

    def __init__(self, config: Config, mesh: Optional[Mesh] = None):
        self.config = config
        self.log = Logger(config.logging.level, config.logging.file)
        self.dtype = config.dtype

        # ---- mesh (rdysetup.c CreateDM + RDyMeshCreateFromDM) ----
        if mesh is None:
            mesh_path = config.resolve_path(config.grid.file)
            self.log.detail(f"Loading mesh from {mesh_path}")
            mesh = load_mesh_file(mesh_path)
        cell_elev = None
        if config.grid.cell_elevation.file:
            cell_elev = read_petsc_vec(
                config.resolve_path(config.grid.cell_elevation.file)
            )
        if config.numerics.cell_ordering == "rcm":
            from .mesh.core import rcm_reorder

            mesh = rcm_reorder(mesh)
            self.log.detail("applied RCM cell ordering")
        elif (
            config.parallel.n_devices > 1
            and config.parallel.partitioning == "auto"
            and config.numerics.edge_flux_backend in ("xla", "pallas")
        ):
            # Graph-aware partition ordering (the ParMETIS/DMPlexDistribute
            # analogue, rdydm.c:116-121): the shard split is equal contiguous
            # blocks of the cell order, so banding the order with RCM gives
            # irregular meshes O(bandwidth) frontiers and keeps every ghost
            # on shard p+-1, preserving the neighbor-only ppermute halo.
            # Couplers see the reordered cells; map via get_natural_ids.
            from .mesh.core import rcm_reorder

            mesh = rcm_reorder(mesh)
            self.log.detail(
                "applied RCM partition ordering (parallel.partitioning: auto)"
            )
        if cell_elev is not None:
            # the file is in natural cell order; any reordering above must
            # scatter it (the reference's natural->global VecScatter,
            # rdysetup.c:826-831)
            mesh.set_cell_elevations(cell_elev[mesh.natural_ids])
        self.mesh = mesh

        # ---- regions / boundaries (InitRegions / InitBoundaries) ----
        self.region_cells: Dict[str, np.ndarray] = {}
        for r in config.regions:
            cells = mesh.regions.get(f"__id_{r.grid_region_id}")
            if cells is None:
                cells = mesh.regions.get(r.name)
            if cells is None:
                raise ConfigError(
                    f"region '{r.name}' (grid_region_id={r.grid_region_id}) "
                    f"not found in mesh (has {sorted(k for k in mesh.regions if not k.startswith('__'))})"
                )
            self.region_cells[r.name] = cells
        if not config.regions:
            self.region_cells["domain"] = np.arange(mesh.num_cells, dtype=np.int32)

        boundary_edges: Dict[str, np.ndarray] = {}
        for b in config.boundaries:
            edges = mesh.boundaries.get(f"__id_{b.grid_boundary_id}")
            if edges is None:
                edges = mesh.boundaries.get(b.name)
            if edges is None:
                raise ConfigError(
                    f"boundary '{b.name}' (grid_boundary_id={b.grid_boundary_id}) "
                    "not found in mesh"
                )
            boundary_edges[b.name] = np.asarray(edges)
        # any boundary edge not covered by a named boundary gets the implicit
        # reflecting wall (rdysetup.c:706-777)
        covered = (
            np.concatenate(list(boundary_edges.values()))
            if boundary_edges
            else np.zeros(0, dtype=np.int64)
        )
        all_bnd = np.arange(
            mesh.num_internal_edges, mesh.num_edges, dtype=np.int64
        )
        leftover = np.setdiff1d(all_bnd, covered)
        if len(leftover):
            boundary_edges["__auto_reflecting__"] = leftover

        # rebuild the mesh's boundary map so the operator sees exactly the
        # configured segments
        mesh_boundaries = dict(boundary_edges)
        self._mesh_for_op = dataclasses.replace(mesh, boundaries=mesh_boundaries)

        # ---- conditions lookup ----
        self.flow_conditions = {c.name: c for c in config.flow_conditions}

        # ---- BC types per boundary (InitBoundaryConditions) ----
        bc_types: Dict[str, int] = {}
        self._dirichlet_conditions: Dict[str, object] = {}
        for bc in config.boundary_conditions:
            fc = self.flow_conditions[bc.flow]
            code = _BC_CODES.get(fc.type)
            if code is None:
                raise ConfigError(
                    f"flow condition '{fc.name}' has type '{fc.type}' which is "
                    "not a supported boundary condition"
                )
            for bname in bc.boundaries:
                bc_types[bname] = code
                if code == bc_mod.BC_DIRICHLET:
                    self._dirichlet_conditions[bname] = fc

        # ---- materials (InitMaterialProperties) ----
        mannings = np.zeros(mesh.num_cells)
        materials = {m.name: m for m in config.materials}
        for sc in config.surface_composition:
            mat = materials[sc.material]
            cells = self.region_cells[sc.region]
            prop = mat.properties.manning
            if prop.file:
                vals = read_petsc_vec(config.resolve_path(prop.file))
                if len(vals) == mesh.num_cells:
                    # file is in natural order (reference scatters it,
                    # rdysetup.c:560-576)
                    mannings[cells] = vals[mesh.natural_ids[cells]]
                else:
                    mannings[cells] = vals[: len(cells)]
            elif prop.value is not None:
                mannings[cells] = self._eval_cells(prop.value, cells)
            else:
                raise ConfigError(
                    f"material '{mat.name}' has no manning value or file"
                )
        self.mannings_n = mannings

        # ---- tracers (sediment classes + salinity + heat) ----
        self.num_sediment = config.physics.sediment.num_classes
        self.num_tracers = (
            self.num_sediment
            + (1 if config.physics.salinity else 0)
            + (1 if config.physics.heat else 0)
        )
        self.ndof = N_FLOW_DOF + self.num_tracers
        self.sediment_conditions = {c.name: c for c in config.sediment_conditions}
        self.salinity_conditions = {c.name: c for c in config.salinity_conditions}
        self.temperature_conditions = {
            c.name: c for c in config.temperature_conditions
        }

        # ---- operator ----
        self.operator: SWEOperator = build_operator(
            self._mesh_for_op,
            bc_types=bc_types,
            mannings_n=mannings,
            num_tracers=self.num_tracers,
            num_sediment=self.num_sediment,
            riemann=config.numerics.riemann,
            tiny_h=config.physics.flow.tiny_h,
            h_anuga=config.physics.flow.h_anuga_reg_parameter,
            source_method=_SOURCE_CODES.get(
                config.physics.flow.source.method, SOURCE_SEMI_IMPLICIT
            ),
            xq2018_threshold=config.physics.flow.source.xq2018_threshold,
            well_balancing_hr=(
                config.physics.flow.well_balancing == "hydrostatic_reconstruction"
            ),
            well_balancing_bs2002=(
                config.physics.flow.well_balancing == "bs2002"
            ),
            second_order=config.numerics.second_order,
            limiter=config.numerics.limiter,
            dtype=self.dtype,
        )

        # (sharded runs convert per shard inside ShardedSWE instead; keep
        # the reference operator unreordered so global edge ids in the
        # Courant diagnostics stay in the reference edge order)
        if (
            config.numerics.edge_flux_backend == "pallas"
            and config.parallel.n_devices <= 1
        ):
            from .ops.pallas.slotted import to_pallas_backend

            new_op = to_pallas_backend(
                self.operator, interpret=jax.default_backend() == "cpu"
            )
            if new_op.edge_flux_backend != "pallas":
                self.log.warning(
                    "pallas edge-flux backend unavailable for this mesh/"
                    "configuration (bandwidth too large or unsupported "
                    "feature); using the XLA path. Try cell_ordering: rcm."
                )
            self.operator = new_op

        # ---- structured raster fast paths (TPU flagship performance) ----
        self._structured = None
        if config.numerics.edge_flux_backend in (
            "structured", "fused_structured"
        ):
            self._init_structured_backend()

        # ---- boundary geometry (edge centers, for BC expressions) ----
        self._bnd_centers = self._boundary_edge_centers()

        # ---- initial solution (InitSolution) ----
        self.q = jnp.asarray(self._initial_solution(), dtype=self.dtype)

        # ---- Dirichlet boundary values (InitDirichletBoundaryConditions) ----
        self.boundary_values = jnp.asarray(
            self._dirichlet_values(t=0.0), dtype=self.dtype
        )

        # ---- external sources (InitSources) ----
        _src0 = self._initial_sources()
        self.ext_src = jnp.asarray(_src0, dtype=self.dtype)
        # whether any external source is active: when False AND no source
        # setter has fired, the fused-step kernel elides its per-step
        # external-source stream entirely (a setter re-arming sources
        # invalidates the compiled advancer, see _update_ext_src)
        self._ext_active = bool(np.any(_src0))

        # ---- time state ----
        tc = config.time
        self.time_unit = tc.unit
        self.t = 0.0  # seconds
        self.step = 0
        self.dt = time_to_seconds(tc.time_step, tc.unit)
        self.t_final = time_to_seconds(tc.stop, tc.unit)
        self.max_steps = tc.stop_n if tc.stop_n else None
        self.coupling_interval = time_to_seconds(tc.coupling_interval, tc.unit)
        self.prev_max_courant: Optional[float] = None
        self.prev_courant_edge: Optional[int] = None

        # ---- stepper ----
        self._advance_fn = None
        self._advance_scheme = config.numerics.temporal
        if self._advance_scheme == "ark_imex":
            # real 2nd-order additive RK, ARS(2,2,2): explicit Roe fluxes /
            # bed slope / external sources, implicit Manning friction solved
            # per-cell in closed form at each DIRK stage (timestepping.
            # _ark_imex_step; the reference routes this through PETSc
            # TSARKIMEX, rdysetup.c:1183-1196)
            self.log.info(
                "ark_imex: ARS(2,2,2) — explicit fluxes + per-cell "
                "closed-form implicit Manning friction per stage"
                + ("; tracers advance explicitly" if self.ndof > 3 else "")
            )
        if self._advance_scheme == "beuler":
            # backward Euler via matrix-free Newton-Krylov
            # (timestepping._beuler_step; the reference's TSBEULER + SNES).
            # On the pallas backend, residuals evaluate through the kernels
            # and JVPs route through the XLA twin (inexact Newton); the
            # structured raster backends reject beuler in their own checks.
            if config.numerics.edge_flux_backend not in (
                "xla", "auto", "pallas", "fused_structured"
            ):
                raise ConfigError(
                    "temporal: beuler requires edge_flux_backend: "
                    "xla, pallas, or fused_structured"
                )
            self.log.info(
                "beuler: backward Euler via matrix-free Newton-GMRES"
                + (
                    " (kernel residuals, XLA-twin JVPs)"
                    if config.numerics.edge_flux_backend
                    in ("pallas", "fused_structured")
                    else " (exact JVPs)"
                )
            )
        self._monitors: List[Callable] = []

        # monitors fire at step cadence in the reference (TSMonitors); we
        # split each coupling interval into chunks of the gcd of all
        # configured step intervals so each monitor sees its exact steps
        import math

        intervals = [
            i
            for i in (
                config.checkpoint.interval,
                config.output.output_interval
                if config.output.format != "none"
                else 0,
                config.output.time_series.boundary_fluxes,
                config.output.time_series.observations.interval,
            )
            if i
        ]
        self.monitor_stride = math.gcd(*intervals) if intervals else 0

        # accumulated diagnostics for time series / outputs
        self.bflux_accum = np.zeros((self.ndof, max(self.operator.num_boundary_edges, 1)))
        self.accum_sol = np.zeros((self.ndof, mesh.num_cells))
        self.accum_prim = np.zeros((self.ndof, mesh.num_cells))
        self.accum_time = 0.0

        self.log_domain_statistics()

        # ---- multi-device execution (parallel.n_devices) ----
        # (the fused_structured backend owns its own row-strip sharding;
        # everything else goes through the unstructured ShardedSWE path)
        self._sharded = None
        self._q_stacked = None
        if config.parallel.n_devices > 1 and self._structured is None:
            self._init_sharded()

        # restart (checkpoint.c:259-317)
        if config.restart.file:
            from .io.checkpoint import restore_from_checkpoint

            restore_from_checkpoint(
                self,
                config.resolve_path(config.restart.file),
                config.restart.reinitialize,
            )
            self.log.info(
                f"restarted from {config.restart.file} at t = {self.t:.6g} s, "
                f"step {self.step}"
            )

    # ------------------------------------------------------------- setup bits
    def _eval_cells(self, value, cells, t: float = 0.0) -> np.ndarray:
        """Evaluate a number-or-expression at cell centroids."""
        if isinstance(value, (int, float)):
            return np.full(len(cells), float(value))
        fn = compile_expression(str(value))
        x = self.mesh.cell_centroid[cells, 0]
        y = self.mesh.cell_centroid[cells, 1]
        return np.asarray(fn(x, y, t), dtype=np.float64)

    def _boundary_edge_centers(self) -> np.ndarray:
        """[Eb, 2] midpoints of boundary edges in operator segment order."""
        pts = self.mesh.points
        centers = []
        for seg in self.operator.segments:
            ev = self.mesh.edge_vertices[seg.edge_ids]
            mid = (pts[ev[:, 0], :2] + pts[ev[:, 1], :2]) / 2.0
            centers.append(mid)
        if centers:
            return np.concatenate(centers, axis=0)
        return np.zeros((0, 2))

    def _initial_solution(self) -> np.ndarray:
        q = np.zeros((self.ndof, self.mesh.num_cells))
        for ic in self.config.initial_conditions:
            fc = self.flow_conditions[ic.flow]
            cells = self.region_cells[ic.region]
            if fc.file:
                vals = read_petsc_vec(self.config.resolve_path(fc.file))
                if len(vals) == N_FLOW_DOF * self.mesh.num_cells:
                    # blocked Vec in natural order (rdysetup.c:804-835)
                    blocked = vals.reshape(self.mesh.num_cells, N_FLOW_DOF)
                    nat = self.mesh.natural_ids
                    q[:N_FLOW_DOF, cells] = blocked[nat[cells]].T
                else:
                    raise ConfigError(
                        f"IC file for '{fc.name}' has {len(vals)} values; "
                        f"expected {N_FLOW_DOF * self.mesh.num_cells}"
                    )
            else:
                q[0, cells] = self._eval_cells(
                    fc.height if fc.height is not None else 0.0, cells
                )
                q[1, cells] = self._eval_cells(
                    fc.x_momentum if fc.x_momentum is not None else 0.0, cells
                )
                q[2, cells] = self._eval_cells(
                    fc.y_momentum if fc.y_momentum is not None else 0.0, cells
                )

            # tracer ICs: condition values go directly into the state slots
            # (InitTracerSolution, rdysetup.c:911-1067)
            if self.num_tracers:
                self._init_tracer_rows(q, ic, cells)
        return q

    def _init_tracer_rows(self, q, ic, cells):
        row = N_FLOW_DOF
        if self.num_sediment and ic.sediment:
            sc = self.sediment_conditions[ic.sediment]
            classes = sc.classes
            for k in range(self.num_sediment):
                cond = classes[k] if k < len(classes) else None
                if cond is None:
                    pass
                elif cond.file:
                    vals = read_petsc_vec(self.config.resolve_path(cond.file))
                    q[row + k, cells] = (
                        vals[self.mesh.natural_ids[cells]]
                        if len(vals) >= self.mesh.num_cells
                        else vals[: len(cells)]
                    )
                elif cond.value is not None:
                    q[row + k, cells] = self._eval_cells(cond.value, cells)
        row += self.num_sediment
        if self.config.physics.salinity and ic.salinity:
            cond = self.salinity_conditions[ic.salinity]
            if cond.file:
                vals = read_petsc_vec(self.config.resolve_path(cond.file))
                q[row, cells] = (
                    vals[self.mesh.natural_ids[cells]]
                    if len(vals) >= self.mesh.num_cells
                    else vals[: len(cells)]
                )
            elif cond.concentration is not None:
                q[row, cells] = self._eval_cells(cond.concentration, cells)
            row += 1
        if self.config.physics.heat and ic.temperature:
            cond = self.temperature_conditions[ic.temperature]
            if cond.file:
                vals = read_petsc_vec(self.config.resolve_path(cond.file))
                q[row, cells] = (
                    vals[self.mesh.natural_ids[cells]]
                    if len(vals) >= self.mesh.num_cells
                    else vals[: len(cells)]
                )
            elif cond.temperature is not None:
                q[row, cells] = self._eval_cells(cond.temperature, cells)

    def _dirichlet_values(self, t: float) -> np.ndarray:
        bvals = np.zeros((self.ndof, max(self.operator.num_boundary_edges, 1)))
        for seg in self.operator.segments:
            fc = self._dirichlet_conditions.get(seg.name)
            if fc is None:
                continue
            sl = slice(seg.start, seg.start + seg.count)
            x = self._bnd_centers[sl, 0]
            y = self._bnd_centers[sl, 1]
            for row, value in enumerate((fc.height, fc.x_momentum, fc.y_momentum)):
                if value is None:
                    continue
                if isinstance(value, (int, float)):
                    bvals[row, sl] = float(value)
                else:
                    fn = compile_expression(str(value))
                    bvals[row, sl] = np.asarray(fn(x, y, t))
        return bvals

    def _initial_sources(self) -> np.ndarray:
        src = np.zeros((self.ndof, self.mesh.num_cells))
        for s in self.config.sources:
            if not s.flow:
                continue
            fc = self.flow_conditions[s.flow]
            cells = self.region_cells[s.region]
            if fc.file:
                vals = read_petsc_vec(self.config.resolve_path(fc.file))
                if len(vals) == self.mesh.num_cells:
                    src[0, cells] = vals[self.mesh.natural_ids[cells]]
                else:
                    src[0, cells] = vals[: len(cells)]
            else:
                for row, value in enumerate((fc.height, fc.x_momentum, fc.y_momentum)):
                    if value is not None:
                        src[row, cells] = self._eval_cells(value, cells)
        return src

    def _init_sharded(self):
        """Set up shard_map execution over parallel.n_devices devices (the
        MPI domain-decomposition replacement)."""
        from jax.sharding import Mesh as DeviceMesh

        from .parallel.sharded import ShardedSWE

        cfg = self.config
        n = cfg.parallel.n_devices
        devices = jax.devices()
        if len(devices) < n:
            raise ConfigError(
                f"parallel.n_devices = {n} but only {len(devices)} devices "
                "are available"
            )
        self._sharded = ShardedSWE(
            self._mesh_for_op,
            n,
            bc_types={s.name: s.bc_type for s in self.operator.segments},
            mannings_n=self.mannings_n,
            dtype=self.dtype,
            axis_name=cfg.parallel.axis_name,
            tiny_h=cfg.physics.flow.tiny_h,
            h_anuga=cfg.physics.flow.h_anuga_reg_parameter,
            source_method=self.operator.source_method,
            xq2018_threshold=self.operator.xq2018_threshold,
            well_balancing_hr=self.operator.well_balancing_hr,
            well_balancing_bs2002=self.operator.well_balancing_bs2002,
            second_order=cfg.numerics.second_order,
            limiter=cfg.numerics.limiter,
            num_tracers=self.num_tracers,
            num_sediment=self.num_sediment,
            riemann=cfg.numerics.riemann,
            edge_flux_backend=cfg.numerics.edge_flux_backend,
            pallas_interpret=jax.default_backend() == "cpu",
        )
        if (
            cfg.numerics.edge_flux_backend == "pallas"
            and not self._sharded.pallas_active
        ):
            self.log.warning(
                "pallas edge-flux backend unavailable for this sharded "
                "mesh/configuration; using the XLA path per shard."
            )
        self._device_mesh = DeviceMesh(
            np.array(devices[:n]), (cfg.parallel.axis_name,)
        )
        self._sharded_advance = None
        self._sharded_courant_edge = -1
        self.log.info(
            f"parallel: {n} devices, {self._sharded.B} owned cells/shard, "
            f"halo {'ppermute' if self._sharded.neighbor_only else 'all_gather'}"
        )
        # domain-decomposition statistics (rdysetup.c:1336-1368 logs min/max/
        # median cells per rank; blocks are equal here, so the varying load
        # is the ghost/frontier work)
        ng = np.asarray(self._sharded.halo.num_ghosts)
        self.log.detail(
            f"partition: ghosts/shard min {int(ng.min())} / "
            f"median {int(np.median(ng))} / max {int(ng.max())}, "
            f"frontier {self._sharded.S_max} cells/shard, "
            f"local cell space {self._sharded.C_loc}"
        )

    def _init_structured_backend(self):
        """Wire the uniform-raster fast paths into the config surface.

        'structured' = the zero-gather XLA slicing operator
        (ops/structured.py); 'fused_structured' = the fully-fused Pallas
        TPU kernel (ops/pallas/structured_step.py, one HBM pass/step).
        Both require a row-major uniform quad raster and flow-only
        first-order physics; anything else is a ConfigError so the user
        isn't silently handed different numerics.
        """
        from .ops.structured import (
            build_structured_operator,
            detect_uniform_raster,
            make_structured_stepper,
        )

        cfg = self.config
        kind = cfg.numerics.edge_flux_backend
        raster = detect_uniform_raster(self._mesh_for_op)
        if raster is None:
            raise ConfigError(
                f"edge_flux_backend: {kind} requires a uniform row-major "
                "quad raster mesh (and numerics.cell_ordering: natural)"
            )
        nx, ny, dx, dy = raster
        unsupported = []
        if self.num_tracers and kind != "fused_structured":
            # the fused kernel (single-device AND row-strip sharded)
            # advects tracers in-kernel (round 4); the XLA structured
            # path does not
            unsupported.append("tracers/sediment")
        if cfg.numerics.second_order and kind != "fused_structured":
            # the fused kernel reconstructs MUSCL faces in-kernel (round
            # 4; round 5 also on the row-strip sharded variant via a
            # 3-row ppermute halo + global-row masks); the XLA structured
            # path does not
            unsupported.append("second_order")
        if cfg.physics.flow.well_balancing not in (None, "", "none"):
            unsupported.append("well_balancing")
        if cfg.parallel.n_devices > 1 and kind != "fused_structured":
            # the fused kernel has a row-strip sharded variant; the XLA
            # structured path does not (use xla/pallas for sharded rasters)
            unsupported.append("parallel.n_devices > 1")
        # dt-weighted output accounting lives in the fused stepper's carry
        # (round 4; round 5 extends it to the row-strip sharded variant —
        # per-strip accumulators + raster wall-flux twins, psum-combined);
        # the XLA structured path still rejects it
        accum_ok = kind == "fused_structured"
        wants_bflux = bool(cfg.output.time_series.boundary_fluxes)
        wants_means = any(
            f.endswith("_Mean") for f in (cfg.output.fields or [])
        ) or bool(
            cfg.output.time_series.observations.interval
            and not cfg.output.time_series.observations
            .time_sampling.instantaneous
        )
        if wants_bflux and not accum_ok:
            unsupported.append("time_series.boundary_fluxes")
        if wants_means and not accum_ok:
            unsupported.append("time-averaged output fields")
        if unsupported:
            raise ConfigError(
                f"edge_flux_backend: {kind} does not support: "
                + ", ".join(unsupported)
            )

        # wall BCs from the operator's boundary segments via outward normals
        a = self.operator.arrays
        walls = {}  # (cn, sn) -> bc code
        for seg in self.operator.segments:
            sl = slice(seg.start, seg.start + seg.count)
            cns = np.asarray(a.bnd_cn[sl]).round().astype(int)
            sns = np.asarray(a.bnd_sn[sl]).round().astype(int)
            for w in set(zip(cns.tolist(), sns.tolist())):
                prev = walls.setdefault(w, seg.bc_type)
                if prev != seg.bc_type:
                    raise ConfigError(
                        f"edge_flux_backend: {kind}: wall with normal {w} "
                        "has mixed boundary conditions"
                    )
        if kind != "fused_structured" and any(
            bc == bc_mod.BC_DIRICHLET for bc in walls.values()
        ):
            raise ConfigError(
                f"edge_flux_backend: {kind} does not support Dirichlet "
                "walls (use the fused_structured/xla/pallas backends)"
            )
        bc_left = walls.get((-1, 0), bc_mod.BC_REFLECTING)
        bc_right = walls.get((1, 0), bc_mod.BC_REFLECTING)
        bc_bottom = walls.get((0, -1), bc_mod.BC_REFLECTING)
        bc_top = walls.get((0, 1), bc_mod.BC_REFLECTING)

        mesh = self._mesh_for_op
        dzx = np.asarray(mesh.cell_dz_dx).reshape(ny, nx)
        dzy = np.asarray(mesh.cell_dz_dy).reshape(ny, nx)
        mann = np.asarray(self.mannings_n).reshape(ny, nx)

        if kind == "fused_structured":
            scheme = self._structured_scheme()
            if scheme not in ("euler", "ssprk2", "ssprk3", "rk4", "beuler"):
                raise ConfigError(
                    "edge_flux_backend: fused_structured supports temporal: "
                    "euler|ssprk2|ssprk3|rk4|beuler"
                )
            if self.operator.source_method != SOURCE_SEMI_IMPLICIT:
                raise ConfigError(
                    "edge_flux_backend: fused_structured supports the "
                    "semi_implicit source method only"
                )
            n_dev = cfg.parallel.n_devices
            if n_dev > 1 and scheme == "beuler":
                raise ConfigError(
                    "edge_flux_backend: fused_structured with "
                    "parallel.n_devices > 1 supports temporal: "
                    "euler|ssprk2|ssprk3|rk4"
                )
            ty = 16 if ny % (16 * max(n_dev, 1)) == 0 else 8
            if nx % 128 or ny % ty:
                self.log.warning(
                    f"fused_structured needs nx % 128 == 0 and ny % {ty} == "
                    f"0 (got {nx}x{ny}); falling back to the structured XLA "
                    "path"
                )
                kind = "structured"
            if kind == "fused_structured" and n_dev > 1 and ny % (
                n_dev * ty
            ):
                raise ConfigError(
                    f"edge_flux_backend: fused_structured with "
                    f"parallel.n_devices = {n_dev} needs ny divisible by "
                    f"n_devices * {ty} (got ny = {ny})"
                )
        if kind == "structured" and cfg.parallel.n_devices > 1:
            raise ConfigError(
                "edge_flux_backend: structured does not support "
                "parallel.n_devices > 1"
            )
        if kind == "structured" and cfg.numerics.second_order:
            raise ConfigError(
                "edge_flux_backend: structured does not support "
                "second_order (use fused_structured on a 128-aligned "
                "raster, or xla/pallas)"
            )
        if kind == "structured" and self.num_tracers:
            raise ConfigError(
                "edge_flux_backend: structured does not support tracers "
                "(use fused_structured on a 128-aligned raster, or "
                "xla/pallas)"
            )
        if kind == "fused_structured":
            from .ops.pallas.structured_step import (
                StructuredPlan,
                make_fused_structured_stepper,
            )

            plan = StructuredPlan(
                nx=nx, ny=ny, dx=dx, dy=dy,
                tiny_h=cfg.physics.flow.tiny_h,
                h_anuga=cfg.physics.flow.h_anuga_reg_parameter,
                bc_left=bc_left, bc_right=bc_right,
                bc_bottom=bc_bottom, bc_top=bc_top,
                gr=ty,
            )
            # Dirichlet walls: per-side index maps (position along the
            # wall -> boundary_values column) so the ghost frame can be
            # filled from the live Dirichlet values each interval
            side_cols = {}
            side_edge_cols = {}
            side_of = {(-1, 0): "left", (1, 0): "right",
                       (0, -1): "bottom", (0, 1): "top"}
            for w, bc in walls.items():
                side = side_of[w]
                n_side = ny if side in ("left", "right") else nx
                cols = np.full(n_side, -1, np.int64)
                for seg in self.operator.segments:
                    sl = np.arange(seg.start, seg.start + seg.count)
                    cns = np.asarray(a.bnd_cn[sl]).round().astype(int)
                    sns = np.asarray(a.bnd_sn[sl]).round().astype(int)
                    on = (cns == w[0]) & (sns == w[1])
                    cells = np.asarray(a.bnd_left[sl])[on]
                    pos = (
                        cells // nx if side in ("left", "right")
                        else cells % nx
                    )
                    cols[pos] = sl[on]
                side_edge_cols[side] = cols
                if bc != bc_mod.BC_DIRICHLET:
                    continue
                if (cols < 0).any():
                    raise ConfigError(
                        f"edge_flux_backend: {kind}: Dirichlet wall "
                        f"'{side}' is not fully covered by boundary edges"
                    )
                side_cols[side] = cols
            # the source plane is threaded through the kernel only when the
            # config declares sources/forcing (a zero-rain plane costs ~5%)
            with_src = bool(cfg.sources) or bool(
                getattr(cfg, "forcing_active", False)
            )
            interp = jax.default_backend() == "cpu"
            if n_dev > 1:
                # row-strip sharded variant: same kernel per strip, 1-row
                # ppermute halo, bitwise-equal to the single-device kernel
                # (the reference runs one input deck at any rank count,
                # docs/user/example-cases/dam-break/frontier.batch.base)
                from jax.sharding import (
                    Mesh as DeviceMesh, NamedSharding, PartitionSpec,
                )
                from .ops.pallas.structured_step import (
                    make_sharded_fused_structured_stepper,
                    pad_plane_sharded,
                )

                devices = jax.devices()
                if len(devices) < n_dev:
                    raise ConfigError(
                        f"parallel.n_devices = {n_dev} but only "
                        f"{len(devices)} devices are available"
                    )
                dm = DeviceMesh(
                    np.array(devices[:n_dev]), (cfg.parallel.axis_name,)
                )
                accum = wants_bflux or wants_means
                adv = make_sharded_fused_structured_stepper(
                    plan, dm, axis_name=cfg.parallel.axis_name,
                    scheme=scheme, with_src=with_src, interpret=interp,
                    num_tracers=self.num_tracers,
                    num_sediment=self.num_sediment,
                    riemann=cfg.numerics.riemann,
                    accumulate=accum,
                    second_order=cfg.numerics.second_order,
                    limiter=cfg.numerics.limiter,
                    positivity=self.operator.positivity_limit,
                )
                shrd = NamedSharding(
                    dm, PartitionSpec(cfg.parallel.axis_name, None, None)
                )
                geo_dev = tuple(
                    jax.device_put(
                        jnp.asarray(pad_plane_sharded(g, n_dev, ty)), shrd
                    )
                    for g in (dzx, dzy, mann)
                )
                self._structured = dict(
                    kind="fused_sharded", plan=plan, nx=nx, ny=ny,
                    n_shards=n_dev, device_mesh=dm, sharding=shrd,
                    with_src=with_src, side_cols=side_cols,
                    side_edge_cols=side_edge_cols,
                    accumulate=accum, bflux=wants_bflux,
                    scheme=scheme, geo=(dzx, dzy, mann),
                    geo_dev=geo_dev, adv=adv,
                )
            else:
                accum = wants_bflux or wants_means
                bflux_fn = None
                if wants_bflux and self.operator.num_boundary_edges:
                    _op = self.operator

                    def bflux_fn(q_flat, bv_edges):
                        return _op.boundary_fluxes(q_flat, bv_edges)[0]

                lin_op = None
                if scheme == "beuler":
                    # Newton-GMRES JVP twin: the differentiable XLA
                    # structured raster operator with identical physics
                    lin_op = build_structured_operator(
                        nx, ny, dx, dy, mannings_n=mann,
                        dtype=jnp.float32, dz_dx=dzx, dz_dy=dzy,
                        bc_left=bc_left, bc_right=bc_right,
                        bc_bottom=bc_bottom, bc_top=bc_top,
                        tiny_h=cfg.physics.flow.tiny_h,
                        h_anuga=cfg.physics.flow.h_anuga_reg_parameter,
                        source_method=self.operator.source_method,
                        xq2018_threshold=self.operator.xq2018_threshold,
                    )
                adv = make_fused_structured_stepper(
                    plan, dzx, dzy, mann, scheme=scheme, with_src=with_src,
                    accumulate=accum, bflux_fn=bflux_fn,
                    num_tracers=self.num_tracers,
                    num_sediment=self.num_sediment,
                    riemann=cfg.numerics.riemann,
                    second_order=cfg.numerics.second_order,
                    limiter=cfg.numerics.limiter,
                    positivity=self.operator.positivity_limit,
                    lin_op=lin_op,
                )
                self._structured = dict(
                    kind="fused", plan=plan, nx=nx, ny=ny,
                    with_src=with_src, side_cols=side_cols,
                    accumulate=accum, bflux=bflux_fn is not None,
                    lin_op=lin_op,
                    scheme=scheme, geo=(dzx, dzy, mann),
                    adv=jax.jit(
                        functools.partial(adv, interpret=interp),
                        static_argnames=(),
                    ),
                )
            self.log.info(
                f"structured raster {nx}x{ny}: fused Pallas kernel "
                f"(ty={ty}, {scheme}"
                f"{f', {n_dev} row strips' if n_dev > 1 else ''}"
                f"{', +src' if with_src else ''}"
                f"{', interpret' if interp else ''})"
            )
        else:
            op = build_structured_operator(
                nx, ny, dx, dy,
                mannings_n=mann,
                dtype=self.dtype,
                dz_dx=dzx, dz_dy=dzy,
                bc_left=bc_left, bc_right=bc_right,
                bc_bottom=bc_bottom, bc_top=bc_top,
                tiny_h=cfg.physics.flow.tiny_h,
                h_anuga=cfg.physics.flow.h_anuga_reg_parameter,
                source_method=self.operator.source_method,
                xq2018_threshold=self.operator.xq2018_threshold,
            )
            scheme = self._structured_scheme()
            if scheme not in ("euler", "ssprk2", "rk4"):
                raise ConfigError(
                    "edge_flux_backend: structured supports temporal: "
                    "euler|ssprk2|rk4"
                )
            self._structured = dict(
                kind="xla", op=op, nx=nx, ny=ny,
                adv=jax.jit(make_structured_stepper(op, scheme)),
            )
            self.log.info(
                f"structured raster {nx}x{ny}: zero-gather XLA path "
                f"({scheme})"
            )

    def _structured_scheme(self) -> str:
        return self.config.numerics.temporal

    def _rebuild_fused_stepper(self):
        """Rebuild the fused-structured stepper (e.g. when a coupler first
        sets an external water source, requiring the src plane DMA)."""
        from .ops.pallas.structured_step import (
            make_fused_structured_stepper,
            make_sharded_fused_structured_stepper,
        )

        st = self._structured
        dzx, dzy, mann = st["geo"]
        interp = jax.default_backend() == "cpu"
        if st["kind"] == "fused_sharded":
            st["adv"] = make_sharded_fused_structured_stepper(
                st["plan"], st["device_mesh"],
                axis_name=self.config.parallel.axis_name,
                scheme=st["scheme"], with_src=st["with_src"],
                interpret=interp,
                num_tracers=self.num_tracers,
                num_sediment=self.num_sediment,
                riemann=self.config.numerics.riemann,
                accumulate=st.get("accumulate", False),
                second_order=self.config.numerics.second_order,
                limiter=self.config.numerics.limiter,
                positivity=self.operator.positivity_limit,
            )
            return
        bflux_fn = None
        if st.get("bflux"):
            _op = self.operator

            def bflux_fn(q_flat, bv_edges):
                return _op.boundary_fluxes(q_flat, bv_edges)[0]

        adv = make_fused_structured_stepper(
            st["plan"], dzx, dzy, mann, scheme=st["scheme"],
            with_src=st["with_src"],
            accumulate=st.get("accumulate", False), bflux_fn=bflux_fn,
            num_tracers=self.num_tracers,
            num_sediment=self.num_sediment,
            riemann=self.config.numerics.riemann,
            second_order=self.config.numerics.second_order,
            limiter=self.config.numerics.limiter,
            positivity=self.operator.positivity_limit,
            lin_op=st.get("lin_op"),
        )
        st["adv"] = jax.jit(functools.partial(adv, interpret=interp))

    def _advance_structured(self, n_steps: int, t_end: float) -> float:
        st = self._structured
        nx, ny = st["nx"], st["ny"]
        if st["kind"] == "xla":
            q3 = jnp.reshape(self.q, (N_FLOW_DOF, ny, nx))
            src3 = jnp.reshape(self.ext_src, (N_FLOW_DOF, ny, nx))
            q_out, t_out, cmax = st["adv"](
                st["op"].arrays, q3, self.t,
                jnp.asarray(self.dt, self.dtype), int(n_steps),
                jnp.asarray(t_end, self.dtype), src3,
            )
            self.q = jnp.reshape(q_out, (N_FLOW_DOF, ny * nx))
        else:
            from .ops.pallas.structured_step import (
                GC, pad_plane, pad_plane_sharded, unshard_plane,
            )

            sharded = st["kind"] == "fused_sharded"
            gr = st["plan"].gr
            if sharded:
                P_ = st["n_shards"]
                pack = lambda x: jax.device_put(
                    jnp.asarray(pad_plane_sharded(x, P_, gr)),
                    st["sharding"],
                )
            else:
                pack = lambda x: jnp.asarray(pad_plane(x, gr))

            src_np = np.asarray(self.ext_src)
            if np.abs(src_np[1:]).max() != 0.0:
                raise ConfigError(
                    "edge_flux_backend: fused_structured supports water "
                    "(row 0) external sources only (use structured for "
                    "momentum sources)"
                )
            src_arg = None
            if not st["with_src"] and np.abs(src_np[0]).max() != 0.0:
                # a coupler set rain after init: rebuild the stepper with
                # the source plane threaded through (one-time recompile)
                self.log.info(
                    "fused_structured: external water source appeared; "
                    "rebuilding the fused stepper with a source plane"
                )
                st["with_src"] = True
                self._rebuild_fused_stepper()
                st = self._structured
            if st["with_src"]:
                src_arg = pack(src_np[0].reshape(ny, nx))
            bc_vals = None
            if st["side_cols"]:
                bv = self.boundary_values
                # all ndof rows: Dirichlet tracer walls prescribe hc too
                bc_vals = {
                    side: tuple(
                        jnp.asarray(bv[row, cols], jnp.float32)
                        for row in range(self.ndof)
                    )
                    for side, cols in st["side_cols"].items()
                }
            q3 = np.asarray(
                jnp.reshape(self.q, (self.ndof, ny, nx)), np.float32
            )
            kwargs = dict(src=src_arg, bc_vals=bc_vals)
            nt = self.num_tracers
            if nt:
                hc_in = jnp.stack(
                    [pack(q3[N_FLOW_DOF + j]) for j in range(nt)]
                )
                if sharded:
                    # [nt, P, rows, nxp] -> [P, nt, rows, nxp]
                    hc_in = jnp.moveaxis(hc_in, 0, 1)
                kwargs["hc"] = hc_in
            accum = st.get("accumulate", False)
            if sharded:
                dzx_d, dzy_d, mann_d = st["geo_dev"]
                args = (np.float32(self.t), np.float32(self.dt),
                        np.int32(n_steps), np.float32(t_end),
                        dzx_d, dzy_d, mann_d)
            else:
                args = (np.float32(self.t), np.float32(self.dt),
                        np.int32(n_steps), np.float32(t_end))
                if accum:
                    kwargs["bv_edges"] = jnp.asarray(
                        self.boundary_values, jnp.float32
                    )
            out = st["adv"](
                pack(q3[0]), pack(q3[1]), pack(q3[2]), *args, **kwargs
            )
            h, hu, hv = out[:3]
            hc_out = out[3] if nt else None
            t_out, cmax = out[3 + bool(nt) : 5 + bool(nt)]
            if accum and sharded:
                # per-strip accumulators (asol/aprim strip-stacked in
                # global row order) + per-side wall-flux accumulators
                # scattered into the operator's boundary-edge order
                bfaL, bfaR, bfB, bfT, asol_s, aprim_s, atime = (
                    out[5 + bool(nt):]
                )
                if st.get("bflux"):
                    def _rows(x):  # [P, 3, nyl] -> [3, ny] by global row
                        x = np.asarray(x)
                        return np.moveaxis(x, 0, 1).reshape(x.shape[1], -1)

                    sec = st["side_edge_cols"]
                    for side, arr in (
                        ("left", _rows(bfaL)), ("right", _rows(bfaR)),
                        ("bottom", np.asarray(bfB)),
                        ("top", np.asarray(bfT)),
                    ):
                        cols = sec.get(side)
                        if cols is None:
                            continue
                        valid = cols >= 0
                        self.bflux_accum[:3, cols[valid]] += arr[:, valid]
                for tgt, src_s in (
                    (self.accum_sol, asol_s), (self.accum_prim, aprim_s),
                ):
                    g = np.moveaxis(np.asarray(src_s), 0, 1)
                    tgt += g.reshape(g.shape[0], -1)
                self.accum_time += float(atime)
            elif accum:
                bfa, asol, aprim, atime = out[5 + bool(nt):]
                if st.get("bflux"):
                    self.bflux_accum += np.asarray(bfa)
                self.accum_sol += np.asarray(asol)
                self.accum_prim += np.asarray(aprim)
                self.accum_time += float(atime)
            if sharded:
                planes = [unshard_plane(np.asarray(p), gr)
                          for p in (h, hu, hv)]
                if nt:
                    hc_np = np.asarray(hc_out)  # [P, nt, rows, nxp]
                    planes += [
                        unshard_plane(hc_np[:, j], gr) for j in range(nt)
                    ]
            else:
                planes = [
                    jnp.asarray(p)[gr : gr + ny, GC : GC + nx]
                    for p in (h, hu, hv)
                ]
                if nt:
                    planes += [
                        jnp.asarray(hc_out)[j, gr : gr + ny, GC : GC + nx]
                        for j in range(nt)
                    ]
            self.q = jnp.reshape(
                jnp.stack([jnp.asarray(p) for p in planes]),
                (self.ndof, ny * nx),
            ).astype(self.dtype)
        self.t = float(t_out)
        self.step += int(n_steps)
        self.prev_courant_edge = None
        return float(cmax)

    def _advance_sharded(self, n_steps: int, t_end: float):
        import jax.numpy as jnp

        sh = self._sharded
        if self._sharded_advance is None:
            self._sharded_advance = sh.make_interval_fn(
                self._device_mesh, self._advance_scheme,
                ext_active=self._ext_active,
            )
        if self._q_stacked is None:
            self._q_stacked = sh.scatter_state(np.asarray(self.q))
            self._src_stacked = jnp.zeros(
                (sh.P, self.ndof, sh.C_loc), self.dtype
            )
            # scatter external sources into shard layout
            src = np.asarray(self.ext_src)
            s = np.zeros((sh.P, self.ndof, sh.C_loc))
            C = self.mesh.num_cells
            for p in range(sh.P):
                lo, hi = p * sh.B, min((p + 1) * sh.B, C)
                s[p, :, : hi - lo] = src[:, lo:hi]
            self._src_stacked = jnp.asarray(s, self.dtype)
        q_out, t_out, cmax, cinfo = self._sharded_advance(
            self._q_stacked,
            self.t,
            jnp.asarray(self.dt, self.dtype),
            int(n_steps),
            jnp.asarray(t_end, self.dtype),
            self.boundary_values,
            self._src_stacked,
        )
        self._q_stacked = q_out
        self._q = None  # lazily gathered only if a monitor/getter reads q
        self.t = float(t_out)
        self.step += int(n_steps)
        _, gedge = sh.courant_location(cinfo)
        self._sharded_courant_edge = gedge
        return float(cmax)

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def from_file(cls, path: str, **overrides) -> "Simulation":
        return cls(load_config(path, overrides or None))

    def rebuild_on_mesh(self, new_mesh: Mesh, mannings_n: np.ndarray) -> None:
        """Rebuild the operator and stepper on a new mesh, preserving time
        state (used by AMR, rdyamr.c:482+: regions/boundaries/operator/TS
        are reconstructed on the refined mesh)."""
        t, dt, step = self.t, self.dt, self.step
        prev_courant = self.prev_max_courant
        monitors = self._monitors
        old_log = self.log

        cfg = self.config
        # re-run the setup pipeline with the new mesh; conditions with
        # region-based evaluation re-evaluate (but state/sources are
        # overwritten by the caller via parent-injection afterwards)
        self.__init__(cfg, mesh=new_mesh)
        self.set_manning_n(mannings_n)
        self.t, self.dt, self.step = t, dt, step
        self.prev_max_courant = prev_courant
        self._monitors = monitors
        self.log = old_log

    @property
    def finished(self) -> bool:
        """RDyFinished (rdyadvance.c:388-400)."""
        if self.t >= self.t_final - 1e-12:
            return True
        if self.max_steps is not None and self.step >= self.max_steps:
            return True
        return False

    def add_monitor(self, fn: Callable[["Simulation"], None]):
        """Register a per-coupling-interval callback (the TSMonitor analogue:
        output writers, checkpointing, time series)."""
        self._monitors.append(fn)

    def advance(self):
        """Advance one coupling interval (RDyAdvance, rdyadvance.c:261-383)."""
        cfg = self.config

        # adaptive dt from the previous interval's Courant diagnostics
        ta = cfg.time.adaptive
        if ta.enable and self.prev_max_courant is not None:
            self.dt = adapt_timestep(
                self.dt,
                self.prev_max_courant,
                ta.target_courant_number,
                ta.max_increase_factor,
                self.coupling_interval,
            )

        t_end = min(self.t + self.coupling_interval, self.t_final)
        span = t_end - self.t
        n_steps = max(1, int(np.ceil(span / self.dt - 1e-12)))
        if self.max_steps is not None:
            n_steps = min(n_steps, self.max_steps - self.step)
            t_end = min(t_end, self.t + n_steps * self.dt)

        if self._advance_fn is None and self._structured is None:
            # accumulate time-averaged/boundary-flux diagnostics only when
            # some output consumes them (the accumulators add ~100 B/cell/
            # step of HBM traffic)
            ts = cfg.output.time_series
            needs_accum = bool(
                ts.boundary_fluxes
                or (
                    ts.observations.interval
                    and not ts.observations.time_sampling.instantaneous
                )
                or any(f.endswith("_Mean") for f in (cfg.output.fields or []))
            )
            self._advance_fn = jax.jit(
                make_interval_advancer(
                    self.operator, self._advance_scheme,
                    accumulate=needs_accum,
                    ext_sources=self._ext_active,
                ),
                donate_argnums=(1,),
            )

        max_courant = 0.0
        stride = self.monitor_stride if self._monitors and self.monitor_stride else n_steps
        done = 0
        while done < n_steps:
            chunk = min(stride, n_steps - done)
            if self._sharded is not None or self._structured is not None:
                if self._sharded is not None:
                    cmax = self._advance_sharded(chunk, t_end)
                    if cmax >= max_courant:
                        self.prev_courant_edge = self._sharded_courant_edge
                else:
                    cmax = self._advance_structured(chunk, t_end)
                done += chunk
                max_courant = max(max_courant, cmax)
                if self._monitors and self.monitor_stride and done < n_steps:
                    for mon in self._monitors:
                        mon(self)
                continue
            res = self._advance_fn(
                self.operator.arrays,
                self.q,
                self.t,
                jnp.asarray(self.dt, self.dtype),
                int(chunk),
                jnp.asarray(t_end, self.dtype),
                self.boundary_values,
                self.ext_src,
            )
            self.q = res.q
            self.t = float(res.t)
            self.step += int(chunk)
            done += chunk
            if float(res.max_courant) >= max_courant:
                self.prev_courant_edge = int(res.courant_edge)
            max_courant = max(max_courant, float(res.max_courant))
            self.bflux_accum += np.asarray(res.bflux_accum)
            self.accum_sol += np.asarray(res.accum_sol)
            self.accum_prim += np.asarray(res.accum_prim)
            self.accum_time += float(res.accum_time)
            if self._monitors and self.monitor_stride and done < n_steps:
                for mon in self._monitors:
                    mon(self)

        self.prev_max_courant = max_courant

        self.log.detail(
            f"step {self.step}: t = {self.t:.6g} s, dt = {self.dt:.6g} s, "
            f"max courant = {self.prev_max_courant:.4g}"
        )

        for mon in self._monitors:
            mon(self)

    def run(self):
        """create -> setup -> advance loop (the C driver main.c:34-88)."""
        while not self.finished:
            self.advance()

    # ------------------------------------------------------------- coupling API
    # The E3SM-style get/set surface (src/rdydata.c), arrays in natural
    # cell order. On a single device natural order == local order.

    @property
    def num_cells(self) -> int:
        return self.mesh.num_cells

    @property
    def q(self) -> jnp.ndarray:
        """Prognostic state [ndof, C] in global cell order. When running
        sharded, the live state is the device-resident per-shard
        `_q_stacked`; reading q triggers a LAZY host gather, so the advance
        loop itself never does a device->host transfer (the reference
        likewise only scatters to natural order at I/O time,
        checkpoint.c:187-203)."""
        if self._q is None and self._q_stacked is not None:
            self._q = jnp.asarray(
                self._sharded.gather_state(self._q_stacked), self.dtype
            )
        return self._q

    @q.setter
    def q(self, value):
        self._q = value
        self._q_stacked = None  # re-scatter on next sharded advance

    def get_height(self) -> np.ndarray:
        return np.asarray(self.q[0])

    def get_x_momentum(self) -> np.ndarray:
        return np.asarray(self.q[1])

    def get_y_momentum(self) -> np.ndarray:
        return np.asarray(self.q[2])

    def get_solution(self) -> np.ndarray:
        return np.asarray(self.q)

    def set_solution(self, q: np.ndarray):
        self.q = jnp.asarray(q, dtype=self.dtype)  # setter clears _q_stacked

    def get_cell_centroids(self) -> np.ndarray:
        return self.mesh.cell_centroid.copy()

    def get_cell_areas(self) -> np.ndarray:
        return self.mesh.cell_area.copy()

    def get_natural_ids(self) -> np.ndarray:
        return self.mesh.natural_ids.copy()

    def get_manning_n(self) -> np.ndarray:
        return self.mannings_n.copy()

    def set_manning_n(self, n: np.ndarray):
        self.mannings_n = np.asarray(n, dtype=np.float64)
        arrays = self.operator.arrays._replace(
            mannings_n=jnp.asarray(n, dtype=self.dtype)
        )
        object.__setattr__(self.operator, "arrays", arrays)
        # a non-uniform n invalidates the fused-step kernel's scalar-geom
        # specialization (uniform VALUES flow without retrace; uniformity
        # itself is compile-static)
        if self.operator.uniform_geom and np.ptp(np.asarray(n)) != 0:
            object.__setattr__(self.operator, "uniform_geom", False)
            self._advance_fn = None
        # the structured fast paths bake the Manning plane into their
        # steppers at init; rebuild them from the new field (RDySetup's
        # InitMaterialProperties analogue must reach every backend)
        if self._structured is not None:
            self._init_structured_backend()

    def _update_ext_src(self, src: np.ndarray):
        """Install new external sources; if sources just became active on a
        run compiled without the ext stream, drop the compiled advancer so
        the next interval rebuilds with it."""
        self.ext_src = jnp.asarray(src, dtype=self.dtype)
        if not self._ext_active and np.any(src):
            self._ext_active = True
            self._advance_fn = None
            # the sharded fused-step kernel elides the ext stream when
            # sources were inactive at build time — rebuild it too
            self._sharded_advance = None
        if self._sharded is not None and self._q_stacked is not None:
            # refresh the stacked per-shard source planes
            s = np.zeros((self._sharded.P, self.ndof, self._sharded.C_loc))
            C = self.mesh.num_cells
            for p in range(self._sharded.P):
                lo, hi = p * self._sharded.B, min(
                    (p + 1) * self._sharded.B, C
                )
                s[p, :, : hi - lo] = np.asarray(src)[:, lo:hi]
            self._src_stacked = jnp.asarray(s, self.dtype)

    def set_domain_water_source(self, rate: np.ndarray | float):
        """RDySetDomainWaterSource: water source for every cell [m/s]."""
        src = np.asarray(self.ext_src).copy()
        src[0, :] = rate
        self._update_ext_src(src)

    def set_regional_water_source(self, region: str, rate: np.ndarray | float):
        """RDySetRegionalWaterSource."""
        src = np.asarray(self.ext_src).copy()
        src[0, self.region_cells[region]] = rate
        self._update_ext_src(src)

    def set_momentum_source(self, comp: int, rate: np.ndarray | float):
        src = np.asarray(self.ext_src).copy()
        src[comp, :] = rate
        self._update_ext_src(src)

    def set_flow_dirichlet_boundary_values(
        self, boundary: str, values: np.ndarray
    ):
        """RDySetFlowDirichletBoundaryValues: [3, n_edges] or [n_edges * 3]."""
        seg = {s.name: s for s in self.operator.segments}[boundary]
        vals = np.asarray(values, dtype=np.float64)
        if vals.ndim == 1:
            vals = vals.reshape(seg.count, N_FLOW_DOF).T
        bv = np.asarray(self.boundary_values).copy()
        bv[:, seg.start : seg.start + seg.count] = vals
        self.boundary_values = jnp.asarray(bv, dtype=self.dtype)

    def get_boundary_edge_centers(self, boundary: str) -> np.ndarray:
        seg = {s.name: s for s in self.operator.segments}[boundary]
        return self._bnd_centers[seg.start : seg.start + seg.count]

    # ---- time accessors (RDyGetTime/GetTimeStep/Get-SetCouplingInterval) ----
    def get_time(self, unit: Optional[str] = None) -> float:
        from .config.schema import time_from_seconds

        return time_from_seconds(self.t, unit or self.time_unit)

    def get_time_step(self, unit: Optional[str] = None) -> float:
        from .config.schema import time_from_seconds

        return time_from_seconds(self.dt, unit or self.time_unit)

    def get_step(self) -> int:
        return self.step

    def get_coupling_interval(self, unit: Optional[str] = None) -> float:
        from .config.schema import time_from_seconds

        return time_from_seconds(self.coupling_interval, unit or self.time_unit)

    def set_coupling_interval(self, value: float, unit: Optional[str] = None):
        self.coupling_interval = time_to_seconds(value, unit or self.time_unit)

    @staticmethod
    def convert_time(value: float, unit_from: str, unit_to: str) -> float:
        """RDyConvertTime (rdyadvance.c:427-432)."""
        from .config.schema import time_from_seconds

        return time_from_seconds(time_to_seconds(value, unit_from), unit_to)

    def get_time_unit(self) -> str:
        """RDyGetTimeUnit: the config file's time unit."""
        return self.time_unit

    def get_version(self) -> str:
        """RDyGetVersion."""
        from . import __version__

        return __version__

    def set_log_file(self, path: str):
        """RDySetLogFile (rdysetup.c:1282): redirect leveled logging."""
        self.log.close()
        self.log = Logger(self.config.logging.level, path)

    def set_initial_conditions(self, q: np.ndarray):
        """RDySetInitialConditions (rdydata.c:541): copy a prognostic array
        into the solution."""
        self.set_solution(q)

    def create_prognostic_array(self) -> np.ndarray:
        """RDyCreatePrognosticVec: a zeroed [ndof, num_cells] array shaped
        like the solution."""
        return np.zeros(np.asarray(self.q).shape, dtype=np.float64)

    def create_one_dof_array(self) -> np.ndarray:
        """RDyCreateOneDOFGlobalVec: a zeroed per-cell scalar array."""
        return np.zeros(self.mesh.num_cells, dtype=np.float64)

    def read_one_dof_vec_from_binary(self, path: str) -> np.ndarray:
        """RDyReadOneDOF{Global,Local}VecFromBinaryFile (rdydata.c:583-633):
        read a naturally-ordered per-cell scalar PETSc binary Vec and return
        it in the simulation's cell order (the natural->global scatter)."""
        data = read_petsc_vec(path)
        if data.size != self.mesh.num_cells:
            raise ValueError(
                f"{path}: expected {self.mesh.num_cells} values, "
                f"got {data.size}"
            )
        return data[self.mesh.natural_ids]

    def write_one_dof_vec_to_binary(self, path: str, values: np.ndarray):
        """RDyWriteOneDOFGlobalVecToBinaryFile (rdydata.c:559-580): write a
        per-cell scalar (simulation cell order) as a naturally-ordered PETSc
        binary Vec (the global->natural scatter)."""
        from .io.petsc_binary import write_petsc_vec

        values = np.asarray(values, dtype=np.float64)
        if values.shape != (self.mesh.num_cells,):
            raise ValueError(
                f"expected shape ({self.mesh.num_cells},), got {values.shape}"
            )
        natural = np.empty_like(values)
        natural[self.mesh.natural_ids] = values
        write_petsc_vec(path, natural)

    # ---- boundary metadata (RDyGetNumBoundary*/RDyGetBoundary*) ----
    @property
    def boundary_names(self) -> List[str]:
        return [s.name for s in self.operator.segments]

    def get_num_global_cells(self) -> int:
        """RDyGetNumGlobalCells (== owned cells on a single global domain)."""
        return self.mesh.num_cells

    def get_num_boundary_conditions(self) -> int:
        """RDyGetNumBoundaryConditions (rdydata.c:18)."""
        return len(self.operator.segments)

    def get_boundary_id(self, boundary: str) -> int:
        """RDyGetBoundaryID (rdydata.c:434): the mesh's boundary id for a
        named boundary; -1 for the implicit auto-reflecting wall."""
        for b in self.config.boundaries:
            if b.name == boundary:
                return b.grid_boundary_id
        self._segment(boundary)  # raises KeyError if unknown
        return -1

    def get_num_boundary_edges(self, boundary: str) -> int:
        return {s.name: s for s in self.operator.segments}[boundary].count

    def get_boundary_condition_flow_type(self, boundary: str) -> int:
        """RDyGetBoundaryConditionFlowType: returns the *public*
        RDyConditionType value (reference include/rdycore.h:133-139:
        dirichlet=0, neumann=1, reflecting=2, critical-outflow=3, runoff=4),
        translated from the internal BC_* codes in ops/swe/boundary.py so a
        host ported from the reference sees the same enum."""
        from .ops.swe.boundary import (
            BC_CRITICAL_OUTFLOW,
            BC_DIRICHLET,
            BC_REFLECTING,
        )

        internal = {s.name: s for s in self.operator.segments}[boundary].bc_type
        to_public = {BC_DIRICHLET: 0, BC_REFLECTING: 2, BC_CRITICAL_OUTFLOW: 3}
        return to_public[internal]

    def _segment(self, boundary: str):
        return {s.name: s for s in self.operator.segments}[boundary]

    def get_boundary_edge_centroids(self, boundary: str) -> np.ndarray:
        """[n, 3] edge midpoints incl. bed elevation (RDyGetBoundaryEdge*Centroids)."""
        seg = self._segment(boundary)
        ev = self.mesh.edge_vertices[seg.edge_ids]
        return (self.mesh.points[ev[:, 0]] + self.mesh.points[ev[:, 1]]) / 2.0

    def get_boundary_cells(self, boundary: str) -> np.ndarray:
        seg = self._segment(boundary)
        return self.mesh.edge_cells[seg.edge_ids, 0]

    def get_boundary_cell_centroids(self, boundary: str) -> np.ndarray:
        return self.mesh.cell_centroid[self.get_boundary_cells(boundary)]

    def get_boundary_cell_natural_ids(self, boundary: str) -> np.ndarray:
        return self.mesh.natural_ids[self.get_boundary_cells(boundary)]

    # ---- tracer Dirichlet values (RDySet*DirichletBoundaryValues) ----
    def _set_tracer_dirichlet(self, boundary: str, row: int, values):
        seg = self._segment(boundary)
        bv = np.asarray(self.boundary_values).copy()
        bv[row, seg.start : seg.start + seg.count] = values
        self.boundary_values = jnp.asarray(bv, dtype=self.dtype)

    def set_sediment_dirichlet_boundary_values(
        self, boundary: str, class_values: np.ndarray
    ):
        """class_values: [num_classes, n_edges] of h*c_i."""
        vals = np.atleast_2d(np.asarray(class_values, dtype=np.float64))
        for k in range(vals.shape[0]):
            self._set_tracer_dirichlet(boundary, N_FLOW_DOF + k, vals[k])

    def set_salinity_dirichlet_boundary_values(self, boundary: str, values):
        row = N_FLOW_DOF + self.num_sediment
        self._set_tracer_dirichlet(boundary, row, values)

    def set_temperature_dirichlet_boundary_values(self, boundary: str, values):
        row = (
            N_FLOW_DOF
            + self.num_sediment
            + (1 if self.config.physics.salinity else 0)
        )
        self._set_tracer_dirichlet(boundary, row, values)

    # ---- regional sources (RDySetRegional*Source) ----
    def set_regional_momentum_source(self, region: str, comp: int, rate):
        """comp: 0 = x momentum, 1 = y momentum."""
        src = np.asarray(self.ext_src).copy()
        src[1 + comp, self.region_cells[region]] = rate
        self._update_ext_src(src)

    def set_regional_sediment_source(self, region: str, class_idx: int, rate):
        src = np.asarray(self.ext_src).copy()
        src[N_FLOW_DOF + class_idx, self.region_cells[region]] = rate
        self._update_ext_src(src)

    def set_regional_tracer_source(self, region: str, row: int, rate):
        src = np.asarray(self.ext_src).copy()
        src[N_FLOW_DOF + row, self.region_cells[region]] = rate
        self._update_ext_src(src)

    # ---- Manning n (RDySetRegional/DomainManningsN) ----
    def set_regional_manning_n(self, region: str, values):
        n = self.mannings_n.copy()
        n[self.region_cells[region]] = values
        self.set_manning_n(n)

    # ---- checkpoint API (RDyWrite/ReadHDF5CheckpointFile) ----
    def write_checkpoint(self, path: str):
        from .io.checkpoint import write_checkpoint

        write_checkpoint(self, path)

    def read_checkpoint(self, path: str, reinitialize: bool = False):
        from .io.checkpoint import restore_from_checkpoint

        restore_from_checkpoint(self, path, reinitialize)

    # ---- diagnostics (rdysetup.c:1336-1368 partition statistics) ----
    def log_domain_statistics(self):
        C = self.mesh.num_cells
        self.log.detail(
            f"domain: {C} cells, {self.mesh.num_edges} edges "
            f"({self.mesh.num_internal_edges} internal), "
            f"{self.mesh.num_vertices} vertices; "
            f"area [{self.mesh.cell_area.min():.4g}, "
            f"{self.mesh.cell_area.max():.4g}], "
            f"min edge length {self.mesh.min_edge_length():.4g}"
        )

    @property
    def restarted(self) -> bool:
        """True if this simulation was initialized from a checkpoint
        (RDyRestarted, src/rdycore.c)."""
        return bool(self.config.restart.file)

    def get_build_configuration(self) -> str:
        """Version/build info string (RDyGetVersion /
        RDyGetBuildConfiguration, src/rdycore.c)."""
        from . import __version__

        return (
            f"rdycore_tpu {__version__} (jax {jax.__version__}, "
            f"backend {jax.default_backend()}, dtype {jnp.dtype(self.dtype).name})"
        )

    def mark_cells_for_amr(self, refine_cell: np.ndarray) -> None:
        """Save per-cell refinement flags for the next perform_amr()
        (RDyMarkOwnedCellsForAMR, src/rdyamr.c:46-60)."""
        flags = np.asarray(refine_cell, dtype=bool)
        if flags.shape != (self.mesh.num_cells,):
            raise ValueError(
                f"refine_cell must have shape ({self.mesh.num_cells},)"
            )
        self._amr_marked = flags.copy()

    def perform_amr(self) -> None:
        """Refine marked cells, transfer state, rebuild operators
        (RDyPerformAMR, src/rdyamr.c:482+). Cells must have been marked
        with mark_cells_for_amr() first."""
        from .amr import perform_amr as _do

        marked = getattr(self, "_amr_marked", None)
        if marked is None:
            raise RuntimeError(
                "no cells marked: call mark_cells_for_amr() first"
            )
        self._amr_marked = None
        _do(self, marked)

    def get_courant_number_diagnostics(self):
        """Max-wave-speed diagnostics from the last coupling interval.

        The reference's CourantNumberDiagnostics struct
        (include/private/rdyoperatorimpl.h:21-26, reduced across ranks via a
        custom MPI op, src/operator.c:698-893): the max Courant number plus
        the edge and cell at which it was encountered. Returns
        (max_courant_num, global_edge_id, global_cell_id) with the cell id
        in natural order; (-1, -1) ids before the first interval. On the
        sharded path the per-shard (max, global edge) pairs are reduced
        host-side (ShardedSWE.courant_location), so the location is
        available there too.
        """
        if self.prev_max_courant is None:
            return (0.0, -1, -1)
        e = self.prev_courant_edge
        if e is None or e < 0:
            return (float(self.prev_max_courant), -1, -1)
        a = self.operator.arrays
        Ei = self.operator.num_internal_edges
        if e < Ei:
            cell = int(np.asarray(a.int_left)[e])
        else:
            cell = int(np.asarray(a.bnd_left)[e - Ei])
        nat = self._mesh_for_op.natural_ids
        if nat is not None:
            cell = int(nat[cell])
        return (float(self.prev_max_courant), int(e), cell)
