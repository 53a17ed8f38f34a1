"""Fused structured-step Pallas kernel vs the XLA structured operator
(interpret mode on CPU; TPU timing in bench.py BENCH_MODE=fused)."""

import jax
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


def test_fused_tracers_dirichlet_wall_matches_unstructured():
    """Dirichlet wall with prescribed tracer mass on the fused raster
    kernel vs the unstructured coupled twin (reference: tracer Dirichlet
    Q-functions, tracer_fluxes_ceed.h)."""
    import numpy as np

    from rdycore_tpu.mesh import structured_quad
    from rdycore_tpu.operator import build_operator
    from rdycore_tpu.ops.swe.boundary import BC_DIRICHLET
    from rdycore_tpu.timestepping import make_interval_advancer
    from rdycore_tpu.ops.pallas.structured_step import (
        make_fused_structured_stepper,
    )

    nx, ny, nt = 128, 16, 2
    mesh = structured_quad(nx, ny, 0, 32, 0, 4)
    C = mesh.num_cells
    mann = np.full(C, 0.02)
    rng = np.random.default_rng(4)
    q0 = np.zeros((3 + nt, C), np.float32)
    q0[0] = 1.0 + rng.random(C)
    q0[3:] = 0.01 * q0[0]

    op = build_operator(
        mesh, bc_types={"left": BC_DIRICHLET}, mannings_n=mann,
        num_tracers=nt, dtype=jnp.float32,
    )
    bv = np.zeros((3 + nt, op.num_boundary_edges), np.float32)
    bv[0] = 1.5
    bv[1] = 0.4
    bv[3] = 1.5 * 0.05  # prescribed hc: c = 0.05 carried by the inflow
    adv_x = make_interval_advancer(op, "euler", accumulate=False)
    r = adv_x(op.arrays, jnp.asarray(q0), 0.0, 1e-3, 12, 1.0,
              jnp.asarray(bv), jnp.zeros_like(jnp.asarray(q0)))
    q_ref = np.asarray(r.q)

    from rdycore_tpu.ops.swe.boundary import BC_REFLECTING

    plan = StructuredPlan(
        nx=nx, ny=ny, dx=0.25, dy=0.25, tiny_h=1e-7, h_anuga=0.0,
        bc_left=BC_DIRICHLET, bc_right=BC_REFLECTING,
        bc_bottom=BC_REFLECTING, bc_top=BC_REFLECTING,
    )
    dzx = np.asarray(op.arrays.dz_dx).reshape(ny, nx)
    dzy = np.asarray(op.arrays.dz_dy).reshape(ny, nx)
    adv_f = make_fused_structured_stepper(
        plan, dzx, dzy, mann.reshape(ny, nx), num_tracers=nt,
    )
    pp = lambda x: jnp.asarray(pad_plane(x.reshape(ny, nx)))
    hcp = jnp.stack([pp(q0[3 + j]) for j in range(nt)])
    bc_vals = {"left": np.stack([
        np.full(ny, 1.5, np.float32), np.full(ny, 0.4, np.float32),
        np.zeros(ny, np.float32), np.full(ny, 1.5 * 0.05, np.float32),
        np.zeros(ny, np.float32),
    ])}
    h, hu, hv, hc, t, cm = adv_f(
        pp(q0[0]), pp(q0[1]), pp(q0[2]), 0.0, 1e-3, 12, 1.0,
        bc_vals=bc_vals, hc=hcp, interpret=True,
    )
    got = np.stack(
        [np.asarray(x)[GR:GR + ny, GC:GC + nx].reshape(-1)
         for x in (h, hu, hv)]
        + [np.asarray(hc)[j, GR:GR + ny, GC:GC + nx].reshape(-1)
           for j in range(nt)]
    )
    rel = np.abs(got - q_ref) / (1.0 + np.abs(q_ref))
    assert rel.max() < 2e-5
    # inflow tracer mass actually entered
    assert got[3].sum() > q0[3].sum() + 1e-5


@pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="needs a real TPU (the CI suite runs on CPU interpret)",
)
def test_fused_muscl_tpu_matches_interpret():
    """Round 5 (VERDICT r4 #2): the fused-raster MUSCL kernel compiles and
    runs ON TPU — the Mosaic array.h:480 lowering crash was bisected to
    slicing iota-derived masks and fixed by building every mask at its
    consumption shape. TPU results must match CPU interpret to f32
    rounding (fma-contraction differences only)."""
    from rdycore_tpu.ops.pallas.structured_step import (
        StructuredPlan, make_fused_structured_stepper, pad_plane,
    )

    nx, ny, ty = 256, 64, 8
    plan = StructuredPlan(
        nx=nx, ny=ny, dx=0.002, dy=0.002, tiny_h=1e-7, h_anuga=0.0,
        bc_left=1, bc_right=1, bc_bottom=1, bc_top=1, gr=ty,
    )
    adv = make_fused_structured_stepper(
        plan, None, None, None, scheme="ssprk2", second_order=True,
        limiter="minmod", positivity=True,
    )
    h0 = np.where(
        np.arange(nx)[None, :] < nx // 2, 10.0, 5.0
    ).astype(np.float32) * np.ones((ny, 1), np.float32)
    h0[:8, :16] = 0.0  # drying corner exercises the positivity scaling
    z = np.zeros((ny, nx), np.float32)
    mann = np.full((ny, nx), 0.015, np.float32)
    geo = tuple(jnp.asarray(pad_plane(g, ty)) for g in (z, z, mann))

    def args():
        return (jnp.asarray(pad_plane(h0, ty)),
                jnp.asarray(pad_plane(z, ty)),
                jnp.asarray(pad_plane(z, ty)))

    out_t = jax.jit(
        lambda a, b, c: adv(a, b, c, 0.0, 5e-5, 5, 1e9, *geo)
    )(*args())
    with jax.default_device(jax.devices("cpu")[0]):
        out_c = adv(*args(), 0.0, 5e-5, 5, 1e9, *geo, interpret=True)
    sl = (slice(ty, ty + ny), slice(64, 64 + nx))
    for a, b in zip(out_t[:3], out_c[:3]):
        assert np.abs(np.asarray(a)[sl] - np.asarray(b)[sl]).max() < 1e-5
    assert float(out_t[4]) == pytest.approx(float(out_c[4]), rel=1e-6)
