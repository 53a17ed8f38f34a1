"""Vectorized SWE Roe Riemann solver.

Numerics mirror the reference's Roe eigenspectrum with critical-flow
(entropy) fix and flux 0.5*(FL + FR - R |Lambda| dW):
/root/reference/src/swe/swe_roe_flux_petsc.h:15-132 (and the CEED twin
swe_roe_flux_ceed.h). Written as pure jnp on batched arrays so the same
function runs inside XLA fusions *and* inside Pallas kernel bodies.

Dry-state safety: the reference computes fluxes for all edges and skips
accumulating those where both sides are dry; divisions there produce NaN
in C but are discarded. Here every division is guarded so no NaN is ever
formed (XLA propagates NaN through jnp.where otherwise).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ...constants import GRAVITY
from ..math import safe_sqrt


def roe_eigenspectrum(hl, ul, vl, hr, ur, vr, sn, cn):
    """Roe-average eigenspectrum with the critical-flow fix
    (swe_roe_flux_petsc.h:15-81). Returns a dict of the pieces shared by the
    flow and tracer flux assemblies."""
    dtype = jnp.result_type(hl, hr)
    g = jnp.asarray(GRAVITY, dtype)
    sqrt_g = jnp.asarray(GRAVITY, dtype) ** 0.5

    hl_s = jnp.maximum(hl, 0.0)
    hr_s = jnp.maximum(hr, 0.0)
    duml = safe_sqrt(hl_s)
    dumr = safe_sqrt(hr_s)
    cl = sqrt_g * duml  # = sqrt(g*hl_s), one sqrt instead of two
    cr = sqrt_g * dumr
    hhat = duml * dumr
    denom = duml + dumr
    denom_safe = jnp.where(denom > 0.0, denom, 1.0)
    uhat = (duml * ul + dumr * ur) / denom_safe
    vhat = (duml * vl + dumr * vr) / denom_safe
    chat = safe_sqrt(0.5 * g * (hl_s + hr_s))
    chat_safe = jnp.where(chat > 0.0, chat, 1.0)
    uperp = uhat * cn + vhat * sn

    dh = hr - hl
    du = ur - ul
    dv = vr - vl
    dupar = -du * sn + dv * cn
    duperp = du * cn + dv * sn

    uperpl = ul * cn + vl * sn
    uperpr = ur * cn + vr * sn
    a1 = jnp.abs(uperp - chat)
    a2 = jnp.abs(uperp)
    a3 = jnp.abs(uperp + chat)

    al1 = uperpl - cl
    ar1 = uperpr - cr
    da1 = jnp.maximum(0.0, 2.0 * (ar1 - al1))
    da1_safe = jnp.where(da1 > 0.0, da1, 1.0)
    a1 = jnp.where(a1 < da1, 0.5 * (a1 * a1 / da1_safe + da1), a1)

    al3 = uperpl + cl
    ar3 = uperpr + cr
    da3 = jnp.maximum(0.0, 2.0 * (ar3 - al3))
    da3_safe = jnp.where(da3 > 0.0, da3, 1.0)
    a3 = jnp.where(a3 < da3, 0.5 * (a3 * a3 / da3_safe + da3), a3)

    dW0 = 0.5 * (dh - hhat * duperp / chat_safe)
    dW1 = hhat * dupar
    dW2 = 0.5 * (dh + hhat * duperp / chat_safe)

    return {
        "a1": a1, "a2": a2, "a3": a3,
        "dW0": dW0, "dW1": dW1, "dW2": dW2,
        "uhat": uhat, "vhat": vhat, "chat": chat,
        "duml": duml, "dumr": dumr, "denom_safe": denom_safe,
        "dh": dh, "uperp": uperp, "uperpl": uperpl, "uperpr": uperpr,
        "hl_s": hl_s, "hr_s": hr_s, "g": g,
        "amax": chat + jnp.abs(uperp),
    }


def roe_flux(
    hl, ul, vl, hr, ur, vr, sn, cn, sqrt_hl=None, sqrt_hr=None, fast=False,
    cil=None, cir=None, upwind=False,
) -> Tuple[jnp.ndarray, ...]:
    """Roe flux through edges for the 2-D shallow water equations.

    All inputs are arrays of the same shape [...]. Velocities must already be
    regularized (see `regularized_velocity`). Returns (f_h, f_hu, f_hv, amax)
    where amax is the max wave speed |u_perp| + c_hat.

    cil/cir ([nt, ...] tracer concentrations): also return f_tracer as a
    5th element, sharing this eigensystem — the same math as
    ops.tracer.flux.tracer_roe_flux (Roe advected waves, or upwinded by
    the sign of the h-flux when upwind=True; tracer_roe_flux_ceed.h:18-170)
    but reusing the fast path's per-cell sqrt/rsqrt work.

    sqrt_hl/sqrt_hr: optional precomputed sqrt(max(h, 0)). A cell's sqrt
    feeds all four of its faces in a structured sweep, so kernels that
    evaluate Roe per face can compute it once per cell instead of once per
    (face, side) -- the sqrt is one of the dominant VPU costs.

    fast=True computes 1/chat via rsqrt (saves a divide per face on the
    TPU VPU; differs from the exact path by ~1 ulp). Used by the f32
    Pallas kernels only, so the f64 XLA twin keeps bit-stable numerics
    for the golden anchors.
    """
    dtype = jnp.result_type(hl, hr)
    g = jnp.asarray(GRAVITY, dtype)
    sqrt_g = jnp.asarray(GRAVITY, dtype) ** 0.5

    hl_s = jnp.maximum(hl, 0.0)
    hr_s = jnp.maximum(hr, 0.0)
    duml = safe_sqrt(hl_s) if sqrt_hl is None else sqrt_hl
    dumr = safe_sqrt(hr_s) if sqrt_hr is None else sqrt_hr
    cl = sqrt_g * duml  # = sqrt(g*hl_s), one sqrt instead of two
    cr = sqrt_g * dumr
    hhat = duml * dumr
    denom = duml + dumr
    inv_denom = 1.0 / jnp.where(denom > 0.0, denom, 1.0)
    uhat = (duml * ul + dumr * ur) * inv_denom
    vhat = (duml * vl + dumr * vr) * inv_denom
    c2 = 0.5 * g * (hl_s + hr_s)
    if fast:
        inv_chat = jax.lax.rsqrt(jnp.where(c2 > 0.0, c2, 1.0))
        chat = c2 * inv_chat  # = sqrt(c2); exactly 0 when c2 == 0
    else:
        chat = safe_sqrt(c2)
        inv_chat = 1.0 / jnp.where(chat > 0.0, chat, 1.0)
    uperp = uhat * cn + vhat * sn

    dh = hr - hl
    du = ur - ul
    dv = vr - vl
    dupar = -du * sn + dv * cn
    duperp = du * cn + dv * sn

    # eigenvalues with critical-flow (entropy) fix
    uperpl = ul * cn + vl * sn
    uperpr = ur * cn + vr * sn
    a1 = jnp.abs(uperp - chat)
    a2 = jnp.abs(uperp)
    a3 = jnp.abs(uperp + chat)

    al1 = uperpl - cl
    ar1 = uperpr - cr
    da1 = jnp.maximum(0.0, 2.0 * (ar1 - al1))
    da1_safe = jnp.where(da1 > 0.0, da1, 1.0)
    a1 = jnp.where(a1 < da1, 0.5 * (a1 * a1 / da1_safe + da1), a1)

    al3 = uperpl + cl
    ar3 = uperpr + cr
    da3 = jnp.maximum(0.0, 2.0 * (ar3 - al3))
    da3_safe = jnp.where(da3 > 0.0, da3, 1.0)
    a3 = jnp.where(a3 < da3, 0.5 * (a3 * a3 / da3_safe + da3), a3)

    # wave strengths
    hdup_c = hhat * duperp * inv_chat
    dW0 = 0.5 * (dh - hdup_c)
    dW1 = hhat * dupar
    dW2 = 0.5 * (dh + hdup_c)

    # right eigenvectors (rows of R are [h, hu, hv] components)
    # R[:,0] = (1, uhat - chat*cn, vhat - chat*sn)
    # R[:,1] = (0, -sn, cn)
    # R[:,2] = (1, uhat + chat*cn, vhat + chat*sn)

    # physical fluxes
    fl_h = uperpl * hl_s
    fl_hu = ul * uperpl * hl_s + 0.5 * g * hl_s * hl_s * cn
    fl_hv = vl * uperpl * hl_s + 0.5 * g * hl_s * hl_s * sn
    fr_h = uperpr * hr_s
    fr_hu = ur * uperpr * hr_s + 0.5 * g * hr_s * hr_s * cn
    fr_hv = vr * uperpr * hr_s + 0.5 * g * hr_s * hr_s * sn

    A0dW0 = a1 * dW0
    A1dW1 = a2 * dW1
    A2dW2 = a3 * dW2

    f_h = 0.5 * (fl_h + fr_h - A0dW0 - A2dW2)
    f_hu = 0.5 * (
        fl_hu
        + fr_hu
        - (uhat - chat * cn) * A0dW0
        - (-sn) * A1dW1
        - (uhat + chat * cn) * A2dW2
    )
    f_hv = 0.5 * (
        fl_hv
        + fr_hv
        - (vhat - chat * sn) * A0dW0
        - cn * A1dW1
        - (vhat + chat * sn) * A2dW2
    )

    amax = chat + jnp.abs(uperp)
    if cil is None:
        return f_h, f_hu, f_hv, amax

    fl_c = hl_s * uperpl * cil  # [nt, ...]
    fr_c = hr_s * uperpr * cir
    if upwind:
        c_up = jnp.where(f_h >= 0.0, cil, cir)
        f_tracer = f_h * c_up
    else:
        cihat = (duml * cil + dumr * cir) * inv_denom
        dch = cir * hr_s - cil * hl_s
        dW_c = dch - cihat * dh
        f_tracer = 0.5 * (fl_c + fr_c - cihat * (A0dW0 + A2dW2) - a2 * dW_c)
    return f_h, f_hu, f_hv, amax, f_tracer


def regularized_velocity(h, hu, hv, tiny_h, h_anuga):
    """ANUGA velocity regularization u = hu*h/(h^2 + h_anuga^2), zero when dry.

    Mirrors ComputeRiemannVelocities (swe_petsc.c:57-73).
    """
    denom = h * h + h_anuga * h_anuga
    denom_safe = jnp.where(denom > 0.0, denom, 1.0)
    wet = h >= tiny_h
    scale = jnp.where(wet, h / denom_safe, 0.0)  # one divide for u and v
    u = hu * scale
    v = hv * scale
    return u, v
