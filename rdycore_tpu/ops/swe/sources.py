"""SWE source terms: bed slope, Manning friction, external (rain) sources.

Mirrors the reference source operators:
- semi-implicit friction tb/(1 + dt*tb): swe_petsc.c:704-804 /
  swe_sources_ceed.h:37-63
- implicit XQ2018 closed form:           swe_petsc.c:816-932 /
  swe_sources_ceed.h:69-105
Both emit primitive variables (h, u, v) for time-averaged output, matching
the reference's "primitive_variables" operator field.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ...constants import GRAVITY
from ..math import safe_sqrt

SOURCE_SEMI_IMPLICIT = 0
SOURCE_IMPLICIT_XQ2018 = 1
# friction-free source (bed slope + external only): the explicit part of
# the ARK-IMEX splitting, whose DIRK stages own the friction term
SOURCE_NONE = 2


def apply_source_none(
    q, flux_div, ext_src, mannings_n, dz_dx, dz_dy, dt, tiny_h, h_anuga,
    include_bed_slope=True,
) -> SourceResult:
    """Bed slope + external sources, NO friction (ARK-IMEX explicit part)."""
    dtype = q.dtype
    g = jnp.asarray(GRAVITY, dtype)
    h, hu, hv = q[0], q[1], q[2]
    if include_bed_slope:
        bedx = dz_dx * g * h
        bedy = dz_dy * g * h
    else:
        bedx = jnp.zeros_like(h)
        bedy = jnp.zeros_like(h)
    rhs = jnp.stack(
        [ext_src[0], -bedx + ext_src[1], -bedy + ext_src[2]]
    )
    pu, pv = _primitives(h, hu, hv, tiny_h, h_anuga)
    prim = jnp.stack([h, pu, pv])
    return SourceResult(rhs=rhs, prim=prim)


class SourceResult(NamedTuple):
    rhs: jnp.ndarray  # [3, C] source contribution to add to the RHS
    prim: jnp.ndarray  # [3, C] primitive variables (h, u, v)


def _primitives(h, hu, hv, tiny_h, h_anuga):
    denom = h * h + h_anuga * h_anuga
    denom_safe = jnp.where(denom > 0.0, denom, 1.0)
    wet = h >= tiny_h
    u = jnp.where(wet, hu * h / denom_safe, 0.0)
    v = jnp.where(wet, hv * h / denom_safe, 0.0)
    return u, v


def apply_source_semi_implicit(
    q, flux_div, ext_src, mannings_n, dz_dx, dz_dy, dt, tiny_h, h_anuga,
    include_bed_slope=True,
) -> SourceResult:
    """Semi-implicit bed-slope + friction source.

    q: [3, C] state; flux_div: [3, C] previously computed flux divergence
    ("riemannf"); ext_src: [3, C] external sources; mannings_n: [C].
    """
    dtype = q.dtype
    g = jnp.asarray(GRAVITY, dtype)
    h, hu, hv = q[0], q[1], q[2]

    if include_bed_slope:
        bedx = dz_dx * g * h
        bedy = dz_dy * g * h
    else:
        bedx = jnp.zeros_like(h)
        bedy = jnp.zeros_like(h)

    wet = h >= tiny_h
    h_safe = jnp.where(wet, h, 1.0)
    u = hu / h_safe
    v = hv / h_safe
    cd = g * mannings_n * mannings_n * jnp.power(h_safe, -1.0 / 3.0)
    speed = safe_sqrt(u * u + v * v)
    tb = cd * speed / h_safe
    factor = tb / (1.0 + dt * tb)

    fsum_x = flux_div[1]
    fsum_y = flux_div[2]
    tbx = jnp.where(wet, (hu + dt * fsum_x - dt * bedx) * factor, 0.0)
    tby = jnp.where(wet, (hv + dt * fsum_y - dt * bedy) * factor, 0.0)

    rhs = jnp.stack(
        [ext_src[0], -bedx - tbx + ext_src[1], -bedy - tby + ext_src[2]]
    )
    pu, pv = _primitives(h, hu, hv, tiny_h, h_anuga)
    prim = jnp.stack([h, pu, pv])
    return SourceResult(rhs=rhs, prim=prim)


def friction_implicit_stage_solve(m, mannings_n, dt_imp, tiny_h):
    """Exact per-cell solve of the implicit friction stage equation

        q + dt_imp * tau(q) = m,   tau(q) = n^2 g h^{-7/3} q |q|

    used by the ARK-IMEX integrator's DIRK stages (the reference routes
    ark_imex through PETSc TSARKIMEX for exactly this stiff Manning term,
    rdysetup.c:1183-1196 + rdyconfigimpl.h:52-56). Friction acts on the
    momentum only and is colinear with it, so the 2x2 system reduces to a
    scalar quadratic: with K = dt_imp n^2 g h^{-7/3} and M = |m|,
    s + K s^2 = M gives s = (-1 + sqrt(1 + 4KM)) / (2K) — the same closed
    form as the XQ2018 treatment (swe_petsc.c:816-932), here applied per
    stage. Returns (q_stage [ndof, C], F_I(q_stage) [ndof, C]) where
    F_I = (q_stage - m) / dt_imp is recovered algebraically (exact).
    Tracer rows (3+) carry no friction: they pass through unchanged with
    F_I = 0 (tracer advection is not stiff — the additive splitting keeps
    it fully explicit)."""
    dtype = m.dtype
    g = jnp.asarray(GRAVITY, dtype)
    h, mx, my = m[0], m[1], m[2]
    wet = h >= tiny_h
    h_safe = jnp.where(wet, h, 1.0)

    K = dt_imp * g * mannings_n * mannings_n * jnp.power(h_safe, -7.0 / 3.0)
    M = safe_sqrt(mx * mx + my * my)
    KM = K * M
    # s/M = 2 / (1 + sqrt(1 + 4KM)): no cancellation as KM -> 0
    ratio = 2.0 / (1.0 + jnp.sqrt(1.0 + 4.0 * KM))
    ratio = jnp.where(wet, ratio, 1.0)  # dry cells: no friction
    qx = mx * ratio
    qy = my * ratio
    dt_safe = jnp.where(dt_imp > 0.0, dt_imp, 1.0)
    fi = (
        jnp.zeros_like(m)
        .at[1].set((qx - mx) / dt_safe)
        .at[2].set((qy - my) / dt_safe)
    )
    q_stage = m.at[1].set(qx).at[2].set(qy)
    return q_stage, fi


def apply_source_xq2018(
    q, flux_div, ext_src, mannings_n, dz_dx, dz_dy, dt, tiny_h, h_anuga,
    xq2018_threshold, include_bed_slope=True,
) -> SourceResult:
    """Implicit friction via Xia & Liang (2018) closed form (eqs 21-37)."""
    dtype = q.dtype
    g = jnp.asarray(GRAVITY, dtype)
    h, hu, hv = q[0], q[1], q[2]

    if include_bed_slope:
        bedx = dz_dx * g * h
        bedy = dz_dy * g * h
    else:
        bedx = jnp.zeros_like(h)
        bedy = jnp.zeros_like(h)

    wet = h >= tiny_h
    h_safe = jnp.where(wet, h, 1.0)

    ax = flux_div[1] - bedx
    ay = flux_div[2] - bedy
    mx = hu + ax * dt
    my = hv + ay * dt

    n2g = g * mannings_n * mannings_n
    lam = (
        n2g
        * jnp.power(h_safe, -4.0 / 3.0)
        * safe_sqrt((mx / h_safe) ** 2 + (my / h_safe) ** 2)
    )

    dtlam = dt * lam
    dtlam_safe = jnp.where(dtlam > 0.0, dtlam, 1.0)
    root = jnp.sqrt(1.0 + 4.0 * dtlam)
    qx_impl = (mx - mx * root) / (-2.0 * dtlam_safe)
    qy_impl = (my - my * root) / (-2.0 * dtlam_safe)
    small = dtlam < xq2018_threshold
    qx1 = jnp.where(small, mx, qx_impl)
    qy1 = jnp.where(small, my, qy_impl)

    qmag = safe_sqrt(qx1 * qx1 + qy1 * qy1)
    tbx = jnp.where(wet, n2g * jnp.power(h_safe, -7.0 / 3.0) * qx1 * qmag, 0.0)
    tby = jnp.where(wet, n2g * jnp.power(h_safe, -7.0 / 3.0) * qy1 * qmag, 0.0)

    rhs = jnp.stack(
        [ext_src[0], -bedx - tbx + ext_src[1], -bedy - tby + ext_src[2]]
    )
    pu, pv = _primitives(h, hu, hv, tiny_h, h_anuga)
    prim = jnp.stack([h, pu, pv])
    return SourceResult(rhs=rhs, prim=prim)
