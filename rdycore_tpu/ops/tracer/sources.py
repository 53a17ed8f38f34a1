"""Tracer (sediment/salinity/heat) source terms.

Mirrors TracerSources / TracerSemiImplicitBedFrictionRoughness
(tracer_sources_ceed.h:37-160): semi-implicit Manning friction on the flow
components plus Hairsine-Rose-style erosion/deposition for sediment classes
(docs/theory/sediment.md):
    tau_b = 0.5 rho_w Cd (u^2 + v^2)
    e_j   = kp (tau_b - tau_ce) / tau_ce
    d_j   = w_s c_j (1 - tau_b / tau_cd)
Parameter defaults from tracer_ceed.c:40-44.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ...constants import GRAVITY
from ..math import safe_sqrt

DENSITY_OF_WATER = 1000.0
DEFAULT_KP_CONSTANT = 0.001
DEFAULT_SETTLING_VELOCITY = 0.01
DEFAULT_TAU_CRITICAL_EROSION = 0.1
DEFAULT_TAU_CRITICAL_DEPOSITION = 1000.0


class SedimentParams(NamedTuple):
    kp_constant: float = DEFAULT_KP_CONSTANT
    settling_velocity: float = DEFAULT_SETTLING_VELOCITY
    tau_critical_erosion: float = DEFAULT_TAU_CRITICAL_EROSION
    tau_critical_deposition: float = DEFAULT_TAU_CRITICAL_DEPOSITION
    rhow: float = DENSITY_OF_WATER


def tracer_source_terms(
    q,  # [3+nt, C]
    flux_div,  # [3+nt, C]
    ext_src,  # [3+nt, C]
    mannings_n,  # [C]
    dz_dx,
    dz_dy,
    dt,
    tiny_h,
    h_anuga,
    num_sediment: int,
    params: SedimentParams,
    include_bed_slope=True,
    include_friction=True,
):
    """Returns (rhs_src [3+nt, C], prim [3+nt, C]); rhs_src excludes the flux
    divergence (added by the caller), matching the SWE source convention.

    include_friction=False drops the semi-implicit Manning term from the
    flow rows (the ARK-IMEX explicit part; its DIRK stages own friction,
    exactly like the pure-SWE SOURCE_NONE split)."""
    dtype = q.dtype
    g = jnp.asarray(GRAVITY, dtype)
    h, hu, hv = q[0], q[1], q[2]
    hci = q[3:]  # [nt, C]
    nt = hci.shape[0]

    if include_bed_slope:
        bedx = dz_dx * g * h
        bedy = dz_dy * g * h
    else:
        bedx = jnp.zeros_like(h)
        bedy = jnp.zeros_like(h)

    wet = h > tiny_h
    h_safe = jnp.where(wet, h, 1.0)
    u = jnp.where(wet, hu / h_safe, 0.0)
    v = jnp.where(wet, hv / h_safe, 0.0)
    ci = jnp.where(wet, hci / h_safe, 0.0)

    cd = g * mannings_n * mannings_n * jnp.power(h_safe, -1.0 / 3.0)
    speed = safe_sqrt(u * u + v * v)
    tb = cd * speed / h_safe
    factor = tb / (1.0 + dt * tb)
    if include_friction:
        tbx = jnp.where(wet, (hu + dt * (flux_div[1] - bedx)) * factor, 0.0)
        tby = jnp.where(wet, (hv + dt * (flux_div[2] - bedy)) * factor, 0.0)
    else:
        tbx = jnp.zeros_like(h)
        tby = jnp.zeros_like(h)

    # erosion/deposition for sediment classes only (salinity/heat advect
    # passively with zero e/d)
    tau_b = 0.5 * params.rhow * cd * (u * u + v * v)
    e = (
        params.kp_constant
        * (tau_b - params.tau_critical_erosion)
        / params.tau_critical_erosion
    )
    d = params.settling_velocity * ci * (1.0 - tau_b / params.tau_critical_deposition)
    ed = jnp.where(wet, e[None, :] - d, 0.0)  # [nt, C]
    if num_sediment < nt:
        mask = (jnp.arange(nt) < num_sediment).astype(dtype)[:, None]
        ed = ed * mask

    rhs_flow = jnp.stack(
        [ext_src[0], -bedx - tbx + ext_src[1], -bedy - tby + ext_src[2]]
    )
    rhs_tracer = ed + ext_src[3:]
    rhs = jnp.concatenate([rhs_flow, rhs_tracer], axis=0)

    # primitive variables: h, u, v (ANUGA-regularized), concentrations
    denom = h * h + h_anuga * h_anuga
    denom_safe = jnp.where(denom > 0.0, denom, 1.0)
    pu = jnp.where(h > tiny_h, hu * h / denom_safe, 0.0)
    pv = jnp.where(h > tiny_h, hv * h / denom_safe, 0.0)
    prim = jnp.concatenate([jnp.stack([h, pu, pv]), ci], axis=0)
    return rhs, prim
