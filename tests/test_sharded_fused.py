"""Row-strip-sharded fused structured kernel (ops/pallas/structured_step.
make_sharded_fused_structured_stepper) vs the single-device fused kernel.

The reference runs its flagship dam-break with the same device kernels
across many nodes (docs/user/example-cases/dam-break/frontier.batch.base:
44-59); here the fused kernel runs unchanged per row strip with single-row
ppermute ghost exchange. Shard boundaries land on row-tile boundaries, so
euler stepping is BITWISE identical to the single-device kernel; the SSP
schemes' convex stage combinations live in XLA where fusion differs by at
most 1 ulp per combine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh as DeviceMesh, NamedSharding, PartitionSpec as P

from rdycore_tpu.ops.pallas.structured_step import (
    GC,
    StructuredPlan,
    make_fused_structured_stepper,
    make_sharded_fused_structured_stepper,
    pad_plane,
    pad_plane_sharded,
    unshard_plane,
)


def _case(nx=256, ny=64, ty=8, bc_top=2):
    plan = StructuredPlan(
        nx=nx, ny=ny, dx=0.01, dy=0.01, tiny_h=1e-7, h_anuga=0.0,
        bc_left=1, bc_right=1, bc_bottom=1, bc_top=bc_top, gr=ty,
    )
    rng = np.random.default_rng(0)
    h0 = (1.0 + rng.random((ny, nx))).astype(np.float32)
    h0[:, : nx // 3] = 0.0
    hu0 = (0.2 * rng.standard_normal((ny, nx))).astype(np.float32)
    hv0 = (0.2 * rng.standard_normal((ny, nx))).astype(np.float32)
    hu0[:, : nx // 3] = 0.0
    hv0[:, : nx // 3] = 0.0
    dz = (0.1 * rng.random((ny, nx))).astype(np.float32)
    dzx = np.gradient(dz, 0.01, axis=1)
    dzy = np.gradient(dz, 0.01, axis=0)
    mann = np.full((ny, nx), 0.02, np.float32)
    return plan, h0, hu0, hv0, dzx, dzy, mann


def _run_single(plan, scheme, n_steps, h0, hu0, hv0, dzx, dzy, mann,
                bc_vals=None):
    ty = plan.gr
    adv = make_fused_structured_stepper(plan, None, None, None, scheme=scheme)
    h, hu, hv = (jnp.asarray(pad_plane(x, ty)) for x in (h0, hu0, hv0))
    h1, hu1, hv1, t, cm = adv(
        h, hu, hv, 0.0, 1e-3, n_steps, 1e9,
        jnp.asarray(pad_plane(dzx, ty)), jnp.asarray(pad_plane(dzy, ty)),
        jnp.asarray(pad_plane(mann, ty)), bc_vals=bc_vals, interpret=True,
    )
    strip = lambda x: np.asarray(x)[ty:-ty, GC:-GC]
    return strip(h1), strip(hu1), strip(hv1), float(cm)


def _run_sharded(plan, scheme, n_steps, n_shards, h0, hu0, hv0, dzx, dzy,
                 mann, bc_vals=None):
    ty = plan.gr
    dm = DeviceMesh(np.array(jax.devices()[:n_shards]), ("y",))
    adv = make_sharded_fused_structured_stepper(
        plan, dm, scheme=scheme, interpret=True
    )
    sh = NamedSharding(dm, P("y", None, None))
    pack = lambda x: jax.device_put(
        jnp.asarray(pad_plane_sharded(x, n_shards, ty)), sh
    )
    h8, hu8, hv8, t, cm = adv(
        pack(h0), pack(hu0), pack(hv0), 0.0, 1e-3, n_steps, 1e9,
        pack(dzx), pack(dzy), pack(mann), bc_vals=bc_vals,
    )
    un = lambda x: unshard_plane(np.asarray(x), ty)
    return un(h8), un(hu8), un(hv8), float(cm)


@pytest.mark.parametrize("n_shards", [2, 8])
def test_sharded_fused_euler_bitwise(n_shards):
    plan, h0, hu0, hv0, dzx, dzy, mann = _case()
    ref = _run_single(plan, "euler", 12, h0, hu0, hv0, dzx, dzy, mann)
    out = _run_sharded(
        plan, "euler", 12, n_shards, h0, hu0, hv0, dzx, dzy, mann
    )
    for a, b in zip(ref[:3], out[:3]):
        assert np.array_equal(a, b), "euler sharding must be bitwise"
    assert ref[3] == out[3]


def test_sharded_fused_ssprk2_close():
    plan, h0, hu0, hv0, dzx, dzy, mann = _case()
    ref = _run_single(plan, "ssprk2", 8, h0, hu0, hv0, dzx, dzy, mann)
    out = _run_sharded(plan, "ssprk2", 8, 4, h0, hu0, hv0, dzx, dzy, mann)
    for a, b in zip(ref[:3], out[:3]):
        # stage combines live in XLA: fusion differs by <= 1 ulp/combine
        np.testing.assert_allclose(a, b, atol=5e-6)
    assert ref[3] == pytest.approx(out[3], rel=1e-6)


def test_sharded_fused_dirichlet_bitwise():
    """Dirichlet walls on the sharded fused kernel: a strip-sharded wall
    (left) and a replicated wall (top) both match the single-device
    kernel bitwise (the reference runs the same Dirichlet Q-functions at
    any rank count, swe_fluxes_ceed.h:104-156)."""
    plan, h0, hu0, hv0, dzx, dzy, mann = _case(bc_top=0)
    plan = plan._replace(bc_left=0)
    ny, nx = h0.shape
    bc_vals = {
        "left": np.stack([
            np.full(ny, 1.5, np.float32),
            np.full(ny, 0.3, np.float32),
            np.zeros(ny, np.float32),
        ]),
        "top": np.stack([
            1.0 + 0.1 * np.sin(np.arange(nx) / 7.0).astype(np.float32),
            np.zeros(nx, np.float32),
            np.full(nx, -0.2, np.float32),
        ]),
    }
    ref = _run_single(plan, "euler", 10, h0, hu0, hv0, dzx, dzy, mann,
                      bc_vals=bc_vals)
    out = _run_sharded(plan, "euler", 10, 4, h0, hu0, hv0, dzx, dzy, mann,
                       bc_vals=bc_vals)
    for a, b in zip(ref[:3], out[:3]):
        assert np.array_equal(a, b), "Dirichlet sharding must be bitwise"
    assert ref[3] == out[3]
