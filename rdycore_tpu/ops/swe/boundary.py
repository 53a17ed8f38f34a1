"""SWE boundary-condition ghost states.

Computes the "right" Riemann state for boundary edges, per BC type, matching
the reference kernels:
- Dirichlet:        swe_petsc.c:552-559 / swe_fluxes_ceed.h:104-156
- Reflecting:       swe_petsc.c:434-461 / swe_fluxes_ceed.h:158-212
- Critical outflow: swe_petsc.c:465-503 / swe_fluxes_ceed.h:214-271
"""

from __future__ import annotations

import jax.numpy as jnp

from ..math import safe_cbrt, safe_sqrt

from ...constants import GRAVITY
from .riemann import regularized_velocity

# BC type codes (stable; used in config + operator dispatch)
BC_DIRICHLET = 0
BC_REFLECTING = 1
BC_CRITICAL_OUTFLOW = 2


def reflecting_ghost(h, u, v, sn, cn):
    """Mirror the velocity about the edge: ghost has the same h and the
    normal velocity component negated."""
    dum1 = sn * sn - cn * cn
    dum2 = 2.0 * sn * cn
    hr = h
    ur = u * dum1 - v * dum2
    vr = -u * dum2 - v * dum1
    return hr, ur, vr


def critical_outflow_ghost(h, u, v, sn, cn):
    """Critical-depth outflow: ghost state at Froude number 1. When the flow
    is *into* the domain, both sides become dry so no flux crosses."""
    dtype = h.dtype
    g = jnp.asarray(GRAVITY, dtype)
    uperp = u * cn + v * sn
    outgoing = uperp >= 0.0

    q = h * jnp.abs(uperp)
    h_crit = safe_cbrt(q * q / g)
    vel = safe_sqrt(g * h_crit)

    hl = jnp.where(outgoing, h, 0.0)
    ul = jnp.where(outgoing, u, 0.0)
    vl = jnp.where(outgoing, v, 0.0)
    hr = jnp.where(outgoing, h_crit, 0.0)
    ur = jnp.where(outgoing, vel * cn, 0.0)
    vr = jnp.where(outgoing, vel * sn, 0.0)
    return (hl, ul, vl), (hr, ur, vr)


def ghost_states(bc_type: int, hl, ul, vl, sn, cn, bvals, tiny_h, h_anuga):
    """Compute (possibly modified) left state and ghost right state for one
    boundary segment. `bvals` is the [3, n] Dirichlet (h, hu, hv) values
    array (ignored for other BC types).
    """
    if bc_type == BC_DIRICHLET:
        hr = bvals[0]
        ur, vr = regularized_velocity(hr, bvals[1], bvals[2], tiny_h, h_anuga)
        return (hl, ul, vl), (hr, ur, vr)
    if bc_type == BC_REFLECTING:
        hr, ur, vr = reflecting_ghost(hl, ul, vl, sn, cn)
        return (hl, ul, vl), (hr, ur, vr)
    if bc_type == BC_CRITICAL_OUTFLOW:
        return critical_outflow_ghost(hl, ul, vl, sn, cn)
    raise ValueError(f"unknown BC type code {bc_type}")
