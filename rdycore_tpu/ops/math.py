"""Small math helpers (the reference's rdymathimpl.h analogue).

`safe_sqrt` exists for the implicit (beuler) integrator: the SWE RHS is
full of sqrt(x) evaluated at x == 0 (dry cells, zero momentum), where the
derivative is +inf and a jax.jvp tangent becomes NaN — which silently
collapses the Newton-GMRES update to zero. The custom JVP picks the
one-sided subgradient 0 at x == 0. The PRIMAL is exactly jnp.sqrt (same
XLA op, bitwise-identical results), so golden/regression anchors are
unaffected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_jvp
def safe_sqrt(x):
    return jnp.sqrt(x)


@safe_sqrt.defjvp
def _safe_sqrt_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    y = jnp.sqrt(x)
    y_safe = jnp.where(x > 0, y, 1.0)
    dy = jnp.where(x > 0, 0.5 / y_safe, 0.0) * dx
    return y, dy


@jax.custom_jvp
def safe_cbrt(x):
    return jnp.cbrt(x)


@safe_cbrt.defjvp
def _safe_cbrt_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    y = jnp.cbrt(x)
    y2 = y * y
    y2_safe = jnp.where(y2 > 0, y2, 1.0)
    dy = jnp.where(y2 > 0, (1.0 / 3.0) / y2_safe, 0.0) * dx
    return y, dy
