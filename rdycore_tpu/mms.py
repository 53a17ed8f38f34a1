"""Method of Manufactured Solutions verification harness (src/rdymms.c).

Given analytic h(x,y,t), u, v, z(x,y), n(x,y) and their derivatives from the
YAML `mms` section, this module:
  1. snaps mesh vertex elevations to z(x,y) (SnapVerticesToBathymetry,
     rdymms.c:108-135) and rebuilds FV geometry
  2. sets analytic ICs, analytic Dirichlet BCs on every boundary
     (rdymms.c:49-68) and analytic source terms (RDyMMSComputeSourceTerms,
     rdymms.c:489-600), both evaluated at t + dt/2 each step
     (MMSPreStep, rdymms.c:139-151) -- here traced *inside* the jitted step
     loop rather than via a host callback
  3. computes area-weighted L1/L2/Linf error norms vs the analytic solution
     (RDyMMSComputeErrorNorms, rdymms.c:850-903)
  4. runs convergence studies over uniform refinements with linear-regression
     rate fits and PASS/FAIL thresholds (rdymms.c:920-1066)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config.expressions import compile_expression
from .config.schema import Config, ConfigError, time_to_seconds
from .constants import GRAVITY
from .mesh.core import Mesh, build_mesh, named_boundary_sets
from .mesh.generate import refine_uniform
from .operator import build_operator
from .ops.swe.boundary import BC_DIRICHLET
from .simulation import load_mesh_file
from .timestepping import make_interval_advancer

_SWE_FIELDS = (
    "h", "dhdx", "dhdy", "dhdt",
    "u", "dudx", "dudy", "dudt",
    "v", "dvdx", "dvdy", "dvdt",
    "z", "dzdx", "dzdy", "n",
)


class MMSProblem:
    """Compiled analytic solution set (SWE + optional sediment classes)."""

    def __init__(self, config: Config):
        mms = config.mms
        if not mms.swe:
            raise ConfigError("config has no mms.swe section")
        consts = dict(mms.constants)
        self.fns = {}
        for f in _SWE_FIELDS:
            if f not in mms.swe:
                raise ConfigError(f"mms.swe is missing '{f}'")
            self.fns[f] = compile_expression(mms.swe[f], consts)
        self.num_sediment = config.physics.sediment.num_classes
        self.sed_fns = []
        for i in range(self.num_sediment):
            keys = {
                "c": f"c{i}", "dcdx": f"dc{i}dx",
                "dcdy": f"dc{i}dy", "dcdt": f"dc{i}dt",
            }
            fns = {}
            for k, key in keys.items():
                if key not in mms.sediment:
                    raise ConfigError(f"mms.sediment is missing '{key}'")
                fns[k] = compile_expression(mms.sediment[key], consts)
            self.sed_fns.append(fns)
        self.config = config

    # ---- analytic fields -------------------------------------------------
    def solution(self, x, y, t):
        """(h, hu, hv, [h c_i...]) at points (x, y) and time t."""
        h = self.fns["h"](x, y, t)
        u = self.fns["u"](x, y, t)
        v = self.fns["v"](x, y, t)
        rows = [h, h * u, h * v]
        for fns in self.sed_fns:
            rows.append(h * fns["c"](x, y, t))
        return jnp.stack(rows)

    def source_terms(self, x, y, t):
        """Analytic SWE (+sediment) source terms (rdymms.c:563-632)."""
        f = {k: self.fns[k](x, y, t) for k in _SWE_FIELDS}
        g = GRAVITY
        h, u, v = f["h"], f["u"], f["v"]
        cd = g * f["n"] ** 2 * jnp.power(h, -1.0 / 3.0)
        speed = jnp.sqrt(u * u + v * v)

        s_h = f["dhdt"] + u * f["dhdx"] + h * f["dudx"] + v * f["dhdy"] + h * f["dvdy"]

        s_hu = u * f["dhdt"] + h * f["dudt"]
        s_hu += 2.0 * u * h * f["dudx"] + u * u * f["dhdx"] + g * h * f["dhdx"]
        s_hu += u * h * f["dvdy"] + v * h * f["dudy"] + u * v * f["dhdy"]
        s_hu += f["dzdx"] * g * h
        s_hu += cd * u * speed

        s_hv = v * f["dhdt"] + h * f["dvdt"]
        s_hv += u * h * f["dvdx"] + v * h * f["dudx"] + u * v * f["dhdx"]
        s_hv += v * v * f["dhdy"] + 2.0 * v * h * f["dvdy"] + g * h * f["dhdy"]
        s_hv += f["dzdy"] * g * h
        s_hv += cd * v * speed

        rows = [s_h, s_hu, s_hv]
        if self.sed_fns:
            from .ops.tracer.sources import SedimentParams

            p = SedimentParams()
            tau_b = 0.5 * p.rhow * cd * (u * u + v * v)
            for fns in self.sed_fns:
                ci = fns["c"](x, y, t)
                s_c = ci * f["dhdt"] + h * fns["dcdt"](x, y, t)
                s_c += (
                    u * ci * f["dhdx"] + h * ci * f["dudx"]
                    + u * h * fns["dcdx"](x, y, t)
                )
                s_c += (
                    v * ci * f["dhdy"] + h * ci * f["dvdy"]
                    + v * h * fns["dcdy"](x, y, t)
                )
                ei = (
                    p.kp_constant
                    * (tau_b - p.tau_critical_erosion)
                    / p.tau_critical_erosion
                )
                di = p.settling_velocity * ci * (
                    1.0 - tau_b / p.tau_critical_deposition
                )
                s_c += -(ei - di)
                rows.append(s_c)

        return jnp.stack(rows)

    def boundary_values(self, x, y, t):
        """Analytic Dirichlet (h, hu, hv) at boundary-edge midpoints
        (RDyMMSEnforceBoundaryConditions, rdymms.c:708-760)."""
        return self.solution(x, y, t)


@dataclasses.dataclass
class MMSRunResult:
    L1: np.ndarray  # [3]
    L2: np.ndarray  # [3]
    Linf: np.ndarray  # [3]
    num_cells: int
    area: float


def run_mms_level(
    problem: MMSProblem, mesh: Mesh, dtype=jnp.float64
) -> MMSRunResult:
    """Run the MMS problem on one mesh and return final error norms."""
    cfg = problem.config

    # snap bathymetry to the analytic z(x, y) and rebuild geometry
    pts = mesh.points.copy()
    pts[:, 2] = np.asarray(problem.fns["z"](pts[:, 0], pts[:, 1], 0.0))
    mesh = build_mesh(
        pts,
        mesh.cell_vertices,
        mesh.cell_num_vertices,
        regions=mesh.regions,
        boundary_edges={
            name: mesh.edge_vertices[eids]
            for name, eids in named_boundary_sets(mesh).items()
        },
    )

    cx = mesh.cell_centroid[:, 0]
    cy = mesh.cell_centroid[:, 1]

    # analytic Manning coefficient
    mannings = np.asarray(problem.fns["n"](cx, cy, 0.0))

    # every boundary gets the analytic Dirichlet BC
    bc_types = {
        name: BC_DIRICHLET
        for name in mesh.boundaries
        if not name.startswith("__id_")
    }
    nt = problem.num_sediment
    op = build_operator(
        mesh,
        bc_types=bc_types,
        mannings_n=mannings,
        tiny_h=cfg.physics.flow.tiny_h,
        h_anuga=cfg.physics.flow.h_anuga_reg_parameter,
        second_order=cfg.numerics.second_order,
        limiter=cfg.numerics.limiter,
        num_tracers=nt,
        num_sediment=nt,
        riemann=cfg.numerics.riemann,
        dtype=dtype,
    )

    # boundary edge midpoints in operator segment order
    bx, by = [], []
    for seg in op.segments:
        ev = mesh.edge_vertices[seg.edge_ids]
        mid = (mesh.points[ev[:, 0], :2] + mesh.points[ev[:, 1], :2]) / 2.0
        bx.append(mid[:, 0])
        by.append(mid[:, 1])
    bx = jnp.asarray(np.concatenate(bx), dtype)
    by = jnp.asarray(np.concatenate(by), dtype)

    cxd = jnp.asarray(cx, dtype)
    cyd = jnp.asarray(cy, dtype)

    def bc_fn(t):
        return problem.boundary_values(bx, by, t)

    def src_fn(t):
        return problem.source_terms(cxd, cyd, t)

    # analytic IC
    q0 = problem.solution(cxd, cyd, 0.0).astype(dtype)

    dt = time_to_seconds(cfg.time.time_step, cfg.time.unit)
    t_final = time_to_seconds(cfg.time.stop, cfg.time.unit)
    n_steps = int(np.ceil(t_final / dt - 1e-12))

    adv = jax.jit(
        make_interval_advancer(
            op, cfg.numerics.temporal, bc_fn=bc_fn, src_fn=src_fn
        )
    )
    res = adv(
        op.arrays,
        q0,
        jnp.asarray(0.0, dtype),
        jnp.asarray(dt, dtype),
        n_steps,
        jnp.asarray(t_final, dtype),
        jnp.zeros((op.ndof, max(op.num_boundary_edges, 1)), dtype),
        jnp.zeros_like(q0),
    )

    q_final = res.q
    t_final_actual = float(res.t)
    q_exact = problem.solution(cxd, cyd, t_final_actual)
    err = np.asarray(q_final - q_exact)

    area = mesh.cell_area
    L1 = (np.abs(err) * area).sum(axis=1)
    L2 = np.sqrt(((err**2) * area).sum(axis=1))
    Linf = np.abs(err).max(axis=1)
    return MMSRunResult(
        L1=L1, L2=L2, Linf=Linf, num_cells=mesh.num_cells, area=float(area.sum())
    )


def estimate_convergence_rates(
    problem: MMSProblem, base_mesh: Mesh, dtype=jnp.float64, log=print
) -> Dict[str, np.ndarray]:
    """Convergence study (RDyMMSEstimateConvergenceRates, rdymms.c:920-1008):
    run at refinements base..base+num, fit log10(err) vs log10(N), rate =
    -slope * dim."""
    conv = problem.config.mms.convergence
    base = conv.base_refinement
    num = conv.num_refinements

    results = []
    mesh = refine_uniform(base_mesh, base) if base else base_mesh
    for r in range(num + 1):
        res = run_mms_level(problem, mesh, dtype=dtype)
        results.append(res)
        log(
            f"refinement {base + r}: N={res.num_cells}  "
            f"L1={res.L1}  L2={res.L2}  Linf={res.Linf}"
        )
        if r < num:
            mesh = refine_uniform(mesh, 1)

    x = np.log10([r.num_cells for r in results])
    rates = {}
    dim = 2
    for norm in ("L1", "L2", "Linf"):
        errs = np.stack([getattr(r, norm) for r in results])  # [levels, 3]
        comp_rates = []
        for c in range(errs.shape[1]):
            y = np.log10(errs[:, c])
            slope = np.polyfit(x, y, 1)[0]
            comp_rates.append(-slope * dim)
        rates[norm] = np.asarray(comp_rates)
    return rates


class MMSDriver:
    """The rdycore_mms executable equivalent (driver/mms.c)."""

    def __init__(self, config: Config):
        self.config = config
        self.problem = MMSProblem(config)
        mesh_path = config.resolve_path(config.grid.file)
        self.base_mesh = load_mesh_file(mesh_path)
        self.dtype = config.dtype
        self.COMPONENTS = tuple(
            ["h", "hu", "hv"]
            + [f"c{i}" for i in range(self.problem.num_sediment)]
        )

    def run(self, log=print) -> bool:
        conv = self.config.mms.convergence
        if conv and conv.num_refinements:
            rates = estimate_convergence_rates(
                self.problem, self.base_mesh, dtype=self.dtype, log=log
            )
            log("Convergence rates:")
            for i, comp in enumerate(self.COMPONENTS):
                log(
                    f"  {comp}: L1 = {rates['L1'][i]:.3g}, "
                    f"L2 = {rates['L2'][i]:.3g}, Linf = {rates['Linf'][i]:.3g}"
                )
            ok = True
            for i, comp in enumerate(self.COMPONENTS):
                expected = conv.expected_rates.get(comp)
                if expected is None:
                    continue
                for norm in ("L1", "L2", "Linf"):
                    got = rates[norm][i]
                    want = getattr(expected, norm)
                    if np.isnan(got) or got <= want:
                        log(
                            f"FAIL: {norm} convergence rate for {comp} is "
                            f"{got:.3g} (expected {want})"
                        )
                        ok = False
            if ok:
                log("PASS: all convergence rates satisfy thresholds.")
            return ok
        else:
            base = conv.base_refinement if conv else 0
            mesh = refine_uniform(self.base_mesh, base) if base else self.base_mesh
            res = run_mms_level(self.problem, mesh, dtype=self.dtype)
            log(f"Error norms at t = {self.config.time.stop}:")
            for i, comp in enumerate(self.COMPONENTS):
                log(
                    f"  {comp}: L1 = {res.L1[i]:.6g}, L2 = {res.L2[i]:.6g}, "
                    f"Linf = {res.Linf[i]:.6g}"
                )
            log(f"  Avg-cell-area    : {res.area / res.num_cells:.16f}")
            log(f"  Avg-length-scale : {np.sqrt(res.area / res.num_cells):.16f}")
            self.last_result = res
            return True
