"""Explicit time integration: the TPU-native replacement for PETSc TS.

The reference wires TS (euler / rk4 / beuler) with OperatorRHSFunction
(rdysetup.c:1174-1216) and advances one coupling interval per RDyAdvance with
TS_EXACTFINALTIME_MATCHSTEP (rdyadvance.c:345-364). Here an entire coupling
interval is ONE jitted `lax.fori_loop` — no host round-trips between steps;
the final step is shortened in-graph to land exactly on the interval end.

Adaptive dt stays *between* intervals (host side), exactly like the
reference (rdyadvance.c:303-343), so step counts stay static inside jit.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .operator import SWEOperator, OperatorArrays, RHSResult, with_arrays

TEMPORAL_EULER = "euler"
TEMPORAL_RK4 = "rk4"
TEMPORAL_SSPRK2 = "ssprk2"
TEMPORAL_SSPRK3 = "ssprk3"
TEMPORAL_ARK_IMEX = "ark_imex"
TEMPORAL_BEULER = "beuler"

# ARS(2,2,2) additive RK coefficients (Ascher, Ruuth & Spiteri 1997 §2.6);
# the reference exposes the same method family via PETSc TSARKIMEX
# (rdysetup.c:1183-1196, method enum rdyconfigimpl.h:52-56)
ARS222_GAMMA = 1.0 - 0.5 * 2.0**0.5
ARS222_DELTA = 1.0 - 1.0 / (2.0 * ARS222_GAMMA)

# stage tables for the fused full-step kernel: each stage computes
# q_out = alpha * q^n + beta * q_stage + gfac * dt * F(q_stage)
# (euler / Shu-Osher SSP forms, matching _rk_step exactly up to f32
# reassociation of the convex combinations)
_FUSED_STEP_STAGES = {
    TEMPORAL_EULER: ((0.0, 1.0, 1.0),),
    TEMPORAL_SSPRK2: ((0.0, 1.0, 1.0), (0.5, 0.5, 0.5)),
    TEMPORAL_SSPRK3: (
        (0.0, 1.0, 1.0), (0.75, 0.25, 0.25), (1.0 / 3.0, 2.0 / 3.0, 2.0 / 3.0),
    ),
}


class IntervalResult(NamedTuple):
    q: jnp.ndarray  # [ndof, C] final state
    t: jnp.ndarray  # final time (seconds)
    max_courant: jnp.ndarray  # max Courant number over the interval
    courant_edge: jnp.ndarray  # edge index achieving it
    bflux_accum: jnp.ndarray  # [ndof, Eb] sum over steps of dt * boundary flux
    accum_sol: jnp.ndarray  # [ndof, C] sum of dt * q (time-averaged output)
    accum_prim: jnp.ndarray  # [ndof, C] sum of dt * primitives
    accum_time: jnp.ndarray  # total time accumulated


def _ark_imex_step(rhs_fn, q, t, dt, mannings_n, tiny_h):
    """One ARS(2,2,2) additive IMEX-RK step: explicit Roe fluxes / bed slope
    / external sources (rhs_fn must be the FRICTION-FREE rhs, i.e. the
    operator with source_method=SOURCE_NONE), implicit Manning friction
    solved per-cell in closed form at each DIRK stage. 2nd-order and
    stiffly accurate (u^{n+1} = U2). The reference gets the same treatment
    from PETSc TSARKIMEX (rdysetup.c:1183-1196)."""
    from .ops.swe.sources import friction_implicit_stage_solve

    g_, d_ = ARS222_GAMMA, ARS222_DELTA
    r1: RHSResult = rhs_fn(q, t, dt)
    fe0 = r1.rhs
    # stage 1: U1 = u^n + dt*g*F_E(u^n) + dt*g*F_I(U1)
    m1 = q + dt * g_ * fe0
    U1, fi1 = friction_implicit_stage_solve(m1, mannings_n, dt * g_, tiny_h)
    # stage 2: U2 = u^n + dt*(d*F_E(u^n) + (1-d)*F_E(U1))
    #               + dt*((1-g)*F_I(U1) + g*F_I(U2))
    fe1 = rhs_fn(U1, t + g_ * dt, dt).rhs
    m2 = q + dt * (d_ * fe0 + (1.0 - d_) * fe1) + dt * (1.0 - g_) * fi1
    q_new, _ = friction_implicit_stage_solve(m2, mannings_n, dt * g_, tiny_h)
    return q_new, r1


def _beuler_step(rhs_fn, q, t, dt, newton_iters=6, krylov_m=16,
                 axis_name=None, lin_rhs_fn=None):
    """One backward-Euler step via matrix-free Newton-Krylov: the residual
    R(u) = u - u^n - dt*F(u, t+dt) is driven to zero with a fixed number of
    Newton iterations, each solving (I - dt*J) du = -R by GMRES with EXACT
    Jacobian-vector products from jax.jvp (no finite differencing). This is
    the TPU-native analogue of the reference's TSBEULER + SNES + KSP stack
    (rdysetup.c:1183-1196): XLA fuses the JVP with the RHS, and the whole
    Newton loop stays on-device inside the interval fori_loop.
    Unconditionally stable in the linear sense — runs at Courant > 1.

    axis_name (sharded): every inner product psums over the device-mesh
    axis, so the Arnoldi basis, Hessenberg, and Newton steps are the
    GLOBAL-problem ones — each shard runs the identical small dense solve
    on the replicated Hessenberg while the matvecs stay shard-local RHS
    evaluations with their usual halo exchanges (the analogue of PETSc
    KSP's MPI-reduced dot products).

    lin_rhs_fn (kernel backends): JVPs route through this differentiable
    twin while residual evaluations stay on rhs_fn — jax.jvp cannot
    differentiate the Pallas kernels, but Newton-GMRES only needs an
    accurate-to-f32-rounding Jacobian (inexact Newton; the reference's
    SNES defaults to an fd-approximated one, which is far looser)."""
    r1: RHSResult = rhs_fn(q, t, dt)
    t1 = t + dt

    def F(qq):
        return rhs_fn(qq, t1, dt).rhs

    F_lin = F if lin_rhs_fn is None else (
        lambda qq: lin_rhs_fn(qq, t1, dt).rhs
    )
    q_new = newton_beuler_solve(
        F, F_lin, q, dt, newton_iters=newton_iters, krylov_m=krylov_m,
        axis_name=axis_name,
    )
    return q_new, r1


def newton_beuler_solve(F, F_lin, q, dt, newton_iters=6, krylov_m=16,
                        axis_name=None):
    """Newton-GMRES core of the backward-Euler step (see _beuler_step):
    drives R(u) = u - q - dt*F(u) to zero with JVPs through F_lin.
    Shared by the unstructured path and the fused raster backend
    (simulation wires the raster kernel's rhs mode as F and the XLA
    structured twin as F_lin)."""

    def gsum(x):
        s = jnp.sum(x)
        if axis_name is not None:
            s = jax.lax.psum(s, axis_name)
        return s

    def gdot(a, b):
        return gsum(a * b)

    def res_norm(qq):
        R = qq - q - dt * F(qq)
        return R, jnp.sqrt(gdot(R, R))

    def gmres(Av, b):
        """One GMRES(m) cycle (modified Gram-Schmidt Arnoldi) with global
        inner products; the least-squares solve on the (m+1, m) Hessenberg
        is tiny and replicated."""
        beta = jnp.sqrt(gdot(b, b))
        beta_safe = jnp.where(beta > 0.0, beta, 1.0)
        V = [b / beta_safe]
        H = jnp.zeros((krylov_m + 1, krylov_m), q.dtype)
        for j in range(krylov_m):
            w = Av(V[j])
            for i in range(j + 1):
                hij = gdot(w, V[i])
                H = H.at[i, j].set(hij)
                w = w - hij * V[i]
            hn = jnp.sqrt(gdot(w, w))
            H = H.at[j + 1, j].set(hn)
            V.append(w / jnp.where(hn > 0.0, hn, 1.0))
        e1 = jnp.zeros(krylov_m + 1, q.dtype).at[0].set(beta)
        y, *_ = jnp.linalg.lstsq(H, e1)
        dq = V[0] * y[0]
        for j in range(1, krylov_m):
            dq = dq + y[j] * V[j]
        return dq

    def newton_body(i, qk):
        R, rn = res_norm(qk)

        def Av(v):
            return v - dt * jax.jvp(F_lin, (qk,), (v,))[1]

        dq = gmres(Av, -R)
        # Backtracking globalization: full Newton steps overshoot on
        # wetting/drying kinks (the reference's SNES line search plays the
        # same role). Keep the best-residual candidate; NaN norms compare
        # False everywhere, so a diverged candidate is rejected rather
        # than poisoning the state.
        best_q, best_n = qk, rn
        for alpha in (1.0, 0.5, 0.25):
            q_c = qk + alpha * dq
            _, n_c = res_norm(q_c)
            take = n_c < best_n
            best_q = jnp.where(take, q_c, best_q)
            best_n = jnp.where(take, n_c, best_n)
        return best_q

    return jax.lax.fori_loop(0, newton_iters, newton_body, q)


def _rk_step(scheme: str, rhs_fn, q, t, dt, imex_ctx=None,
             axis_name=None, lin_rhs_fn=None):
    """One step; rhs_fn(q, t, dt) -> RHSResult. Returns the new q and
    the first-stage RHSResult (used for diagnostics, matching the reference's
    per-apply accumulation under forward euler). For ark_imex, rhs_fn must be
    the friction-free explicit RHS and imex_ctx = (mannings_n, tiny_h).
    axis_name: device-mesh axis for beuler's global inner products."""
    if scheme == TEMPORAL_ARK_IMEX:
        mannings_n, tiny_h = imex_ctx
        return _ark_imex_step(rhs_fn, q, t, dt, mannings_n, tiny_h)
    if scheme == TEMPORAL_BEULER:
        return _beuler_step(rhs_fn, q, t, dt, axis_name=axis_name,
                            lin_rhs_fn=lin_rhs_fn)
    r1: RHSResult = rhs_fn(q, t, dt)
    if scheme == TEMPORAL_EULER:
        q_new = q + dt * r1.rhs
    elif scheme == TEMPORAL_RK4:
        r2 = rhs_fn(q + 0.5 * dt * r1.rhs, t + 0.5 * dt, dt)
        r3 = rhs_fn(q + 0.5 * dt * r2.rhs, t + 0.5 * dt, dt)
        r4 = rhs_fn(q + dt * r3.rhs, t + dt, dt)
        q_new = q + (dt / 6.0) * (r1.rhs + 2.0 * r2.rhs + 2.0 * r3.rhs + r4.rhs)
    elif scheme == TEMPORAL_SSPRK2:
        q1 = q + dt * r1.rhs
        r2 = rhs_fn(q1, t + dt, dt)
        q_new = 0.5 * q + 0.5 * (q1 + dt * r2.rhs)
    elif scheme == TEMPORAL_SSPRK3:
        q1 = q + dt * r1.rhs
        r2 = rhs_fn(q1, t + dt, dt)
        q2 = 0.75 * q + 0.25 * (q1 + dt * r2.rhs)
        r3 = rhs_fn(q2, t + 0.5 * dt, dt)
        q_new = (1.0 / 3.0) * q + (2.0 / 3.0) * (q2 + dt * r3.rhs)
    else:
        raise ValueError(f"unknown temporal scheme '{scheme}'")
    return q_new, r1


def make_interval_advancer(
    op: SWEOperator,
    scheme: str = TEMPORAL_EULER,
    bc_fn: Optional[Callable] = None,
    src_fn: Optional[Callable] = None,
    accumulate: bool = True,
    ext_sources: bool = True,
):
    """Build a jittable function advancing one coupling interval.

    bc_fn(t) -> [ndof, Eb] overrides static Dirichlet boundary values with
    time-dependent ones *inside* the step loop (used by MMS, where the
    reference re-applies analytic BCs in a TS PreStep hook, rdymms.c:708).
    src_fn(t) likewise overrides external sources. Both are evaluated ONCE
    per step at the half-step time t + dt/2 and held fixed across RK stages,
    matching the reference's MMSPreStep semantics (rdymms.c:139-151).

    accumulate=False drops the per-step time-averaged/boundary-flux
    accumulators from the loop carry (~100 B/cell/step of HBM traffic --
    comparable to the RHS itself); use when no time-series or mean outputs
    are requested. Zero-valued accumulators are still returned for a stable
    result shape.

    Returns advance(arrays, q, t0, dt, n_steps, t_end, bnd_values, ext_src)
    -> IntervalResult. `n_steps` is a *dynamic* (traced) count: one compiled
    executable serves every interval length, which (a) avoids recompiles when
    adaptive dt changes the step count and (b) keeps per-step codegen
    bitwise-identical across runs -- the checkpoint/restart equivalence test
    requires exact reproducibility, and XLA specializing on a static trip
    count can change fusion/reassociation. The last step is shortened
    in-graph so the interval ends exactly at t_end.
    """

    base_op = op
    if scheme == TEMPORAL_ARK_IMEX:
        from .ops.swe.sources import SOURCE_NONE

        # explicit part excludes friction entirely; the DIRK stages own it.
        # Tracer rows are not stiff: they advance fully explicitly through
        # the additive splitting (friction_implicit_stage_solve passes
        # them through), so flow + tracers is supported.
        base_op = dataclasses.replace(op, source_method=SOURCE_NONE)

    # beuler on kernel backends (round 4): residuals evaluate through the
    # Pallas kernels while Newton-GMRES JVPs route through the XLA twin on
    # the SAME (possibly plan-reordered) arrays — the gather-form XLA path
    # is edge-order-independent, so the twin computes the identical rhs
    # and jax.jvp can differentiate it (reference: TSBEULER + SNES,
    # rdysetup.c:1183-1196)
    lin_base_op = None
    if scheme == TEMPORAL_BEULER and base_op.edge_flux_backend != "xla":
        lin_base_op = dataclasses.replace(base_op, edge_flux_backend="xla")

    # fused full-step path: whole RK stages run as one pallas call each
    # with the state carried in tile-row layout (ops/pallas/slotted.py
    # fused_step_slotted) — per-step XLA work drops to scalars. Only for
    # f32 states; selected per-dtype at trace time inside advance().
    fused_stages = _FUSED_STEP_STAGES.get(scheme)
    fused_step_ok = (
        fused_stages is not None
        and base_op.edge_flux_backend == "pallas"
        and bool(base_op.pallas_step_meta)
        # ndof > 3 (coupled tracers) runs in-kernel too (round 5); the
        # accumulate path still needs the ndof-row boundary fluxes that
        # only the two-kernel tier computes
        and (base_op.ndof == 3 or not accumulate)
        and (base_op.num_boundary_edges == 0 or base_op.pallas_bnd_kinds)
        and not base_op.well_balancing_hr
        and not base_op.well_balancing_bs2002
        and not base_op.second_order
    )

    def advance(
        arrays: OperatorArrays,
        q: jnp.ndarray,
        t0,
        dt,
        n_steps: int,
        t_end,
        bnd_values: jnp.ndarray,
        ext_src: jnp.ndarray,
    ) -> IntervalResult:
        bound_op = with_arrays(base_op, arrays)
        dtype = q.dtype
        if fused_step_ok and dtype == jnp.float32:
            return _advance_fused_step(
                bound_op, fused_stages, bc_fn, src_fn, accumulate,
                q, t0, dt, n_steps, t_end, bnd_values, ext_src,
                ext_sources=ext_sources,
            )

        ndof = q.shape[0]

        def body(i, carry):
            if accumulate:
                qq, tt, cmax, cedge, bfa, asol, aprim, atime = carry
            else:
                qq, tt, cmax, cedge = carry
            dt_i = jnp.minimum(dt, t_end - tt)
            dt_i = jnp.maximum(dt_i, 0.0)

            # per-step forcing, frozen across stages (MMSPreStep semantics)
            t_half = tt + 0.5 * dt_i
            bv = bc_fn(t_half) if bc_fn is not None else bnd_values
            es = src_fn(t_half) if src_fn is not None else ext_src

            def rhs_fn(q_s, t_s, dt_s):
                return bound_op.apply(q_s, dt_s, bv, es)

            lin_rhs_fn = None
            if lin_base_op is not None:
                lin_bound = with_arrays(lin_base_op, arrays)

                def lin_rhs_fn(q_s, t_s, dt_s):
                    return lin_bound.apply(q_s, dt_s, bv, es)

            imex_ctx = (
                (arrays.mannings_n, bound_op.tiny_h)
                if scheme == TEMPORAL_ARK_IMEX
                else None
            )
            q_new, r1 = _rk_step(scheme, rhs_fn, qq, tt, dt_i, imex_ctx,
                                 lin_rhs_fn=lin_rhs_fn)
            # step-level Courant (uses the actual step dt)
            step_courant = r1.max_courant_per_dt * dt_i
            bigger = step_courant > cmax
            cmax = jnp.where(bigger, step_courant, cmax)
            cedge = jnp.where(bigger, r1.courant_edge, cedge)
            # guard: if dt_i == 0 (past t_end), state unchanged
            active = dt_i > 0.0
            q_out = jnp.where(active, q_new, qq)
            if accumulate:
                bfa = bfa + dt_i * r1.boundary_fluxes
                asol = asol + dt_i * qq
                aprim = aprim + dt_i * r1.prim
                atime = atime + dt_i
                return (q_out, tt + dt_i, cmax, cedge, bfa, asol, aprim, atime)
            return (q_out, tt + dt_i, cmax, cedge)

        init_core = (
            q,
            jnp.asarray(t0, dtype),
            jnp.zeros((), dtype),
            jnp.zeros((), jnp.int32),
        )
        zero_bfa = jnp.zeros((ndof, max(op.num_boundary_edges, 1)), dtype)
        if accumulate:
            init = init_core + (
                zero_bfa, jnp.zeros_like(q), jnp.zeros_like(q),
                jnp.zeros((), dtype),
            )
            q_f, t_f, cmax, cedge, bfa, asol, aprim, atime = jax.lax.fori_loop(
                0, jnp.asarray(n_steps, jnp.int32), body, init
            )
        else:
            q_f, t_f, cmax, cedge = jax.lax.fori_loop(
                0, jnp.asarray(n_steps, jnp.int32), body, init_core
            )
            bfa = zero_bfa
            asol = jnp.zeros_like(q)
            aprim = jnp.zeros_like(q)
            atime = jnp.zeros((), dtype)
        return IntervalResult(
            q=q_f,
            t=t_f,
            max_courant=cmax,
            courant_edge=cedge,
            bflux_accum=bfa,
            accum_sol=asol,
            accum_prim=aprim,
            accum_time=atime,
        )

    return advance


def _advance_fused_step(
    op, stages, bc_fn, src_fn, accumulate,
    q, t0, dt, n_steps, t_end, bnd_values, ext_src,
    ext_sources=True,
) -> IntervalResult:
    """Interval loop over the fused full-step kernel (tier B).

    The state lives in tile-row layout [3, NB*GT*8, 128] across the whole
    interval; each RK stage is ONE pallas call computing fluxes (incl. the
    in-kernel boundary ghost states), divergence, sources, and the stage
    update. A dt_i == 0 tail step freezes the state algebraically
    (gfac * 0 = 0 and the stage convex combinations are the identity), so
    no per-step select over the state is needed."""
    from .ops.pallas.slotted import (
        GT, fused_step_slotted, pack_rows, slot_dirichlet_planes,
        unpack_rows,
    )

    a = op.arrays
    sm = op.pallas_step_meta
    ns, negrp, nringL, nringR, NB, ncgrp = sm
    rows = NB * GT * 8
    crows = ncgrp * GT * 8
    C = op.num_cells
    dtype = q.dtype
    has_dir = 1 in op.pallas_bnd_kinds

    has_ext = ext_sources or src_fn is not None
    q2d0 = pack_rows(q, rows)
    if op.uniform_geom:
        geom2d = None
        uniform_scal = (a.dz_dx[0], a.dz_dy[0], a.mannings_n[0])
    else:
        geom2d = pack_rows(
            jnp.stack([a.dz_dx, a.dz_dy, a.mannings_n]).astype(jnp.float32),
            crows,
        )
        uniform_scal = None
    # interval-constant streams hoisted out of the loop; per-step when a
    # time-dependent override (MMS) is installed
    ndof = op.ndof
    ext2d_const = None if (src_fn is not None or not has_ext) else pack_rows(
        ext_src[:ndof], crows
    )
    dirp_const = None
    if has_dir and bc_fn is None:
        dirp_const = slot_dirichlet_planes(
            a.pl_bnd_pos, a.pl_supL.shape[0], bnd_values, op.tiny_h,
            op.h_anuga, ndof=ndof, sel=op.pallas_bnd_sel,
        )

    def stage_call(q2d_s, qA2d, dt_i, coeffs, ext2d, dirp, emit_prim):
        alpha, beta, gfac = coeffs
        return fused_step_slotted(
            a, q2d_s, dt_i, sm, op.pallas_nsup, op.pallas_wq,
            op.pallas_cd_nsup_lk, op.pallas_cd_nsup_rk,
            op.tiny_h, op.h_anuga, op.xq2018_threshold, op.source_method,
            op.pallas_bnd_kinds, geom2d, ext2d, alpha, beta, gfac,
            qA2d=qA2d, dir_planes=dirp, emit_prim=emit_prim,
            uniform_scal=uniform_scal, interpret=op.pallas_interpret,
            num_tracers=op.num_tracers, num_sediment=op.num_sediment,
            upwind=op.riemann == "upwind_roe",
            ident_l=op.pallas_ident_l,
        )

    # aligned-layout remainder edges: their flux is absent from the
    # in-kernel divergence, so every stage gets an additive XLA
    # correction at the (few) wall cells. The semi-implicit friction's
    # dependence on the divergence is LINEAR in the missing flux
    # (tbx = (hu + dt*acc - dt*bedx) * factor with factor a function of q
    # alone), so the correction gdt * rem * (1 - wet * dt * factor) is
    # exact up to f32 reassociation.
    rem_np = op.pallas_bnd_rem
    if rem_np is not None:
        rem_j = jnp.asarray(rem_np, jnp.int32)
        cells_r = a.bnd_left[rem_j]
        coefb_r = (
            -a.bnd_len[rem_j] / a.area[cells_r]
        ).astype(jnp.float32)
        ccoef_r = jnp.asarray(
            a.edge_courant_coef, jnp.float32
        )[op.num_internal_edges + rem_j]
        mann_r = jnp.asarray(a.mannings_n, jnp.float32)[cells_r]
        nt_ = op.num_tracers

        def rem_correct(q_in2d, q_out2d, dt_i, gfac, bv):
            from .constants import GRAVITY

            qf = q_in2d.reshape(ndof, -1)[:, :C].astype(jnp.float32)
            fb, am = op.boundary_fluxes_nd(qf, bv)
            rem_rhs = fb[:, rem_j] * coefb_r  # [ndof, R]
            if op.source_method == 0:  # semi-implicit friction rows
                th = jnp.float32(op.tiny_h)
                h_r = qf[0, cells_r]
                wet = (h_r > th) if nt_ else (h_r >= th)
                h_safe = jnp.where(wet, h_r, 1.0)
                u = qf[1, cells_r] / h_safe
                v = qf[2, cells_r] / h_safe
                if nt_:
                    u = jnp.where(wet, u, 0.0)
                    v = jnp.where(wet, v, 0.0)
                cd = jnp.float32(GRAVITY) * mann_r * mann_r * jnp.power(
                    h_safe, -1.0 / 3.0
                )
                tb = cd * jnp.sqrt(u * u + v * v) / h_safe
                factor = tb / (1.0 + dt_i * tb)
                scale = 1.0 - jnp.where(wet, dt_i * factor, 0.0)
                rem_rhs = jnp.concatenate(
                    [rem_rhs[:1], rem_rhs[1:3] * scale, rem_rhs[3:]]
                )
            delta = jnp.float32(gfac) * dt_i * rem_rhs
            flat = q_out2d.reshape(ndof, -1)
            flat = flat.at[:, cells_r].add(delta)
            # remainder Courant (max over the stage-1 evaluation)
            cmax_r = (am[rem_j].astype(jnp.float32) * ccoef_r)
            eidx_r = op.num_internal_edges + rem_j[jnp.argmax(cmax_r)]
            return (
                flat.reshape(q_out2d.shape), cmax_r.max(),
                eidx_r.astype(jnp.int32),
            )
    else:
        rem_correct = None

    Eb = op.num_boundary_edges

    def body(i, carry):
        if accumulate:
            qq2d, tt, cmax, cedge, bfa, asol, aprim, atime = carry
        else:
            qq2d, tt, cmax, cedge = carry
        dt_i = jnp.minimum(dt, t_end - tt)
        dt_i = jnp.maximum(dt_i, 0.0).astype(jnp.float32)

        t_half = tt + 0.5 * dt_i
        bv = bc_fn(t_half) if bc_fn is not None else bnd_values
        ext2d = (
            pack_rows(src_fn(t_half)[:ndof], crows)
            if src_fn is not None else ext2d_const
        )
        if has_dir:
            dirp = dirp_const if bc_fn is None else slot_dirichlet_planes(
                a.pl_bnd_pos, a.pl_supL.shape[0], bv, op.tiny_h, op.h_anuga,
                ndof=ndof, sel=op.pallas_bnd_sel,
            )
        else:
            dirp = None

        out1 = stage_call(qq2d, None, dt_i, stages[0], ext2d, dirp,
                          emit_prim=accumulate)
        qs2d, cmax8, cidx8 = out1[0], out1[1], out1[2]
        cm_r = None
        if rem_correct is not None:
            qs2d, cm_r, ce_r = rem_correct(
                qq2d, qs2d, dt_i, stages[0][2], bv
            )
        for coeffs in stages[1:]:
            q_in = qs2d
            out = stage_call(q_in, qq2d, dt_i, coeffs, ext2d, dirp,
                             emit_prim=False)
            qs2d = out[0]
            if rem_correct is not None:
                qs2d, _, _ = rem_correct(q_in, qs2d, dt_i, coeffs[2], bv)

        # step-level Courant from the stage-1 kernel fold (boundary slots
        # included in-kernel for unified plans; remainder edges merged)
        cm = cmax8.reshape(-1)
        mi_k = cm.max()
        sedge = a.pl_slot_edge[cidx8.reshape(-1)[jnp.argmax(cm)]]
        if cm_r is not None:
            sedge = jnp.where(mi_k >= cm_r, sedge, ce_r)
            mi_k = jnp.maximum(mi_k, cm_r)
        step_courant = (mi_k * dt_i).astype(dtype)
        bigger = step_courant > cmax
        cmax = jnp.where(bigger, step_courant, cmax)
        cedge = jnp.where(bigger, sedge, cedge)

        if accumulate:
            prim2d = out1[3]
            qq_flat = qq2d.reshape(ndof, -1)[:, :C]
            if Eb:
                fb, _ = op.boundary_fluxes(qq_flat, bv)
                bfa = bfa + dt_i * fb
            asol = asol + dt_i * qq2d
            aprim = aprim + dt_i * prim2d
            atime = atime + dt_i
            return (qs2d, tt + dt_i, cmax, cedge, bfa, asol, aprim, atime)
        return (qs2d, tt + dt_i, cmax, cedge)

    init_core = (
        q2d0,
        jnp.asarray(t0, dtype),
        jnp.zeros((), dtype),
        jnp.zeros((), jnp.int32),
    )
    zero_bfa = jnp.zeros((ndof, max(Eb, 1)), dtype)
    if accumulate:
        init = init_core + (
            zero_bfa, jnp.zeros_like(q2d0), jnp.zeros_like(q2d0),
            jnp.zeros((), dtype),
        )
        q2d_f, t_f, cmax, cedge, bfa, asol2d, aprim2d, atime = (
            jax.lax.fori_loop(0, jnp.asarray(n_steps, jnp.int32), body, init)
        )
        asol = unpack_rows(asol2d, C, dtype)
        aprim = unpack_rows(aprim2d, C, dtype)
    else:
        q2d_f, t_f, cmax, cedge = jax.lax.fori_loop(
            0, jnp.asarray(n_steps, jnp.int32), body, init_core
        )
        bfa = zero_bfa
        asol = jnp.zeros((ndof, C), dtype)
        aprim = jnp.zeros((ndof, C), dtype)
        atime = jnp.zeros((), dtype)
    return IntervalResult(
        q=unpack_rows(q2d_f, C, dtype),
        t=t_f,
        max_courant=cmax,
        courant_edge=cedge,
        bflux_accum=bfa,
        accum_sol=asol,
        accum_prim=aprim,
        accum_time=atime,
    )


def adapt_timestep(
    dt: float,
    max_courant: float,
    target_courant: float,
    max_increase_factor: float,
    coupling_interval: float,
) -> float:
    """Host-side adaptive dt between coupling intervals (rdyadvance.c:303-343)."""
    if max_courant <= 0.0:
        return dt
    if max_courant < target_courant:
        factor = min(target_courant / max_courant, max_increase_factor)
        dt = dt * factor
        if dt > coupling_interval:
            dt = coupling_interval
    else:
        dt = dt * (target_courant / max_courant)
    return dt
