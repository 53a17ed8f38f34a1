"""Fused structured-step Pallas kernel vs the XLA structured operator
(interpret mode on CPU; TPU timing in bench.py BENCH_MODE=fused)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rdycore_tpu.ops.pallas.structured_step import (
    GC,
    GR,
    StructuredPlan,
    make_fused_structured_stepper,
    pad_plane,
)
from rdycore_tpu.ops.structured import (
    build_structured_operator,
    make_structured_stepper,
)
from rdycore_tpu.ops.swe.boundary import BC_REFLECTING


def test_fused_matches_xla_structured():
    nx, ny = 256, 24
    dx = dy = 0.01
    rng = np.random.default_rng(0)
    h0 = (1.0 + rng.random((ny, nx))).astype(np.float32)
    hu0 = (0.2 * rng.standard_normal((ny, nx))).astype(np.float32)
    hv0 = (0.2 * rng.standard_normal((ny, nx))).astype(np.float32)
    z = (0.05 * np.sin(np.arange(nx) * 0.1)[None, :] + np.zeros((ny, nx))).astype(
        np.float32
    )
    mann = np.full((ny, nx), 0.02, np.float32)

    op = build_structured_operator(
        nx, ny, dx, dy, z=z, mannings_n=mann, dtype=jnp.float32
    )
    adv_x = make_structured_stepper(op, "euler")
    q0 = jnp.asarray(np.stack([h0, hu0, hv0]))
    qx, _, cx = adv_x(op.arrays, q0, 0.0, 1e-3, 20, 1.0, jnp.zeros_like(q0))

    plan = StructuredPlan(
        nx=nx, ny=ny, dx=dx, dy=dy, tiny_h=1e-7, h_anuga=0.0,
        bc_left=BC_REFLECTING, bc_right=BC_REFLECTING,
        bc_bottom=BC_REFLECTING, bc_top=BC_REFLECTING,
    )
    adv_f = make_fused_structured_stepper(
        plan, np.asarray(op.arrays.dz_dx), np.asarray(op.arrays.dz_dy), mann
    )
    hp, hup, hvp = (jnp.asarray(pad_plane(x)) for x in (h0, hu0, hv0))
    hf, huf, hvf, tf, cf = adv_f(hp, hup, hvp, 0.0, 1e-3, 20, 1.0, interpret=True)

    qx_np = np.asarray(qx)
    for got, want in (
        (hf, qx_np[0]), (huf, qx_np[1]), (hvf, qx_np[2]),
    ):
        np.testing.assert_allclose(
            np.asarray(got)[GR : GR + ny, GC : GC + nx], want, atol=2e-6
        )
    assert float(cf) == pytest.approx(float(cx), rel=1e-6)
    assert float(tf) == pytest.approx(0.02)


def test_fused_dry_dam_break_wetting():
    """Dam break onto a dry bed through the fused kernel: wet/dry front
    advances without NaNs and conserves volume (closed box)."""
    nx, ny = 128, 16
    plan = StructuredPlan(
        nx=nx, ny=ny, dx=0.01, dy=0.01, tiny_h=1e-7, h_anuga=0.0,
        bc_left=BC_REFLECTING, bc_right=BC_REFLECTING,
        bc_bottom=BC_REFLECTING, bc_top=BC_REFLECTING,
    )
    z = np.zeros((ny, nx), np.float32)
    adv = make_fused_structured_stepper(plan, z, z, z)
    h0 = np.zeros((ny, nx), np.float32)
    h0[:, : nx // 2] = 0.5
    hp = jnp.asarray(pad_plane(h0))
    z0 = jnp.asarray(pad_plane(np.zeros((ny, nx), np.float32)))
    hf, huf, hvf, tf, cf = adv(hp, z0, z0, 0.0, 1e-3, 50, 1.0, interpret=True)
    h = np.asarray(hf)[GR : GR + ny, GC : GC + nx]
    assert np.isfinite(h).all()
    assert h[:, nx // 2 + 2].max() > 0.0  # the front moved
    assert h.sum() == pytest.approx(h0.sum(), rel=1e-5)
