"""Pallas edge-flux kernel tests (interpret mode on CPU; the real-TPU
benchmark compares backends in bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rdycore_tpu.mesh import structured_quad
from rdycore_tpu.operator import build_operator
from rdycore_tpu.ops.pallas.edge_flux import to_pallas_backend


def _random_state(mesh, seed=0, dry_block=True):
    rng = np.random.default_rng(seed)
    q = np.zeros((3, mesh.num_cells), np.float32)
    q[0] = (1.0 + rng.random(mesh.num_cells)).astype(np.float32)
    q[1] = 0.3 * rng.standard_normal(mesh.num_cells).astype(np.float32)
    q[2] = 0.3 * rng.standard_normal(mesh.num_cells).astype(np.float32)
    if dry_block:
        q[:, 100:140] = 0.0
    return jnp.asarray(q)


def test_pallas_backend_matches_xla():
    mesh = structured_quad(48, 40)
    op = build_operator(
        mesh, mannings_n=np.full(mesh.num_cells, 0.02), dtype=jnp.float32
    )
    op_p = to_pallas_backend(op, tile=256, window=512, interpret=True)
    assert op_p.edge_flux_backend == "pallas"

    q = _random_state(mesh)
    bv = op.zero_boundary_values(jnp.float32)
    src = jnp.zeros_like(q)
    r_x = op.apply(q, 1e-3, bv, src)
    r_p = op_p.apply(q, 1e-3, bv, src)

    # f32 kernel vs f32 XLA twin: MXU one-hot gather reassociates; fluxes
    # agree to ~2e-6 and the rhs (divided by area, fed through the
    # semi-implicit source) to ~2e-5 relative on O(10) values
    np.testing.assert_allclose(
        np.asarray(r_p.rhs), np.asarray(r_x.rhs), atol=1e-3
    )
    rel = np.abs(np.asarray(r_p.rhs) - np.asarray(r_x.rhs)) / (
        1.0 + np.abs(np.asarray(r_x.rhs))
    )
    assert rel.max() < 1e-4
    assert float(r_p.max_courant_per_dt) == pytest.approx(
        float(r_x.max_courant_per_dt), rel=1e-5
    )


def test_pallas_fallback_when_unsupported():
    mesh = structured_quad(16, 8)
    op = build_operator(
        mesh, mannings_n=np.zeros(mesh.num_cells), second_order=True,
        dtype=jnp.float32,
    )
    assert to_pallas_backend(op) is op  # MUSCL -> fallback


def test_pallas_fallback_on_bad_bandwidth():
    mesh = structured_quad(64, 8)
    op = build_operator(
        mesh, mannings_n=np.zeros(mesh.num_cells), dtype=jnp.float32
    )
    # absurdly small window cannot hold any tile
    assert to_pallas_backend(op, tile=256, window=128) is op
