"""Subcritical steady flow over a bump (SWASHES-class benchmark):
q = 4.42 m^2/s over z(x) = max(0, 0.2 - 0.05 (x-10)^2) with downstream
depth 2.0 m. The analytic steady state solves Bernoulli
  q^2 / (2 g h^2) + h + z = q^2 / (2 g h_out^2) + h_out.
Starting FROM the analytic state with exact Dirichlet ends, the solver
must hold it (bed-slope source vs momentum-flux balance in MOTION — a
far stronger balance test than lake-at-rest)."""

import jax.numpy as jnp
import numpy as np

from rdycore_tpu.constants import GRAVITY
from rdycore_tpu.mesh import structured_quad
from rdycore_tpu.operator import build_operator
from rdycore_tpu.ops.swe.boundary import BC_DIRICHLET
from rdycore_tpu.timestepping import make_interval_advancer

G = GRAVITY
Q = 4.42
H_OUT = 2.0


def _z(x):
    return np.maximum(0.0, 0.2 - 0.05 * (x - 10.0) ** 2)


def _h_analytic(x):
    z = _z(x)
    Htot = Q**2 / (2 * G * H_OUT**2) + H_OUT  # energy head (z_out = 0)
    h = np.full_like(x, H_OUT)
    for _ in range(60):  # Newton on  q^2/(2 g h^2) + h + z - Htot = 0
        f = Q**2 / (2 * G * h**2) + h + z - Htot
        df = 1.0 - Q**2 / (G * h**3)
        h = np.maximum(h - f / df, 0.5)
    return h


def test_subcritical_bump_holds_steady():
    nx, ny = 200, 4
    mesh = structured_quad(nx, ny, 0.0, 25.0, 0.0, 1.0,
                           z_fn=lambda x, y: _z(x))
    x = mesh.cell_centroid[:, 0]
    h0 = _h_analytic(x)
    q0 = jnp.zeros((3, mesh.num_cells))
    q0 = q0.at[0].set(h0).at[1].set(Q)

    op = build_operator(
        mesh, mannings_n=np.zeros(mesh.num_cells),
        bc_types={"left": BC_DIRICHLET, "right": BC_DIRICHLET},
    )
    # exact analytic state on both Dirichlet ends
    bv = np.zeros((3, op.num_boundary_edges))
    for seg in op.segments:
        if seg.bc_type != BC_DIRICHLET:
            continue
        sl = slice(seg.start, seg.start + seg.count)
        xe = np.asarray(op.arrays.bnd_left)[sl]
        he = _h_analytic(x[xe])
        bv[0, sl] = he
        bv[1, sl] = Q
    bv = jnp.asarray(bv)

    adv = make_interval_advancer(op, "euler")
    dt = 0.005  # CFL ~ 0.3: c + u ~ 4.4 + 2.2, dx = 0.125
    n_steps = 4000  # t = 20 s, several domain transit times
    res = adv(op.arrays, q0, 0.0, dt, n_steps, 1e9, bv,
              jnp.zeros_like(q0))
    h1 = np.asarray(res.q[0])
    hu1 = np.asarray(res.q[1])

    assert np.isfinite(h1).all()
    # depth stays on the analytic curve (first-order truncation allowed)
    rel = np.abs(h1 - h0) / h0
    assert rel.max() < 0.02, f"max rel depth drift {rel.max():.4f}"
    # discharge stays uniform at q (steady continuity)
    assert np.abs(hu1 - Q).max() / Q < 0.02


def test_transcritical_bump_holds_steady():
    """Transcritical flow without shock (SWASHES: q = 1.53 m^2/s): the
    flow passes through critical depth exactly at the bump crest, so the
    Roe solver's critical-flow (entropy) fix is active at the sonic
    point. Subcritical branch upstream, supercritical downstream."""
    q_in = 1.53
    hc = (q_in**2 / G) ** (1.0 / 3.0)  # critical depth at the crest
    z_crest = 0.2
    Htot = hc + q_in**2 / (2 * G * hc**2) + z_crest  # energy head

    def h_branch(x):
        z = _z(x)
        # Newton from the branch-appropriate side of critical depth
        h = np.where(x < 10.0, 2.0 * hc, 0.5 * hc)
        for _ in range(80):
            f = q_in**2 / (2 * G * h**2) + h + z - Htot
            df = 1.0 - q_in**2 / (G * h**3)
            df = np.where(np.abs(df) < 1e-6, np.sign(df + 1e-30) * 1e-6, df)
            step = np.clip(f / df, -0.2 * hc, 0.2 * hc)
            h = np.maximum(h - step, 0.05)
        return h

    nx, ny = 200, 4
    mesh = structured_quad(nx, ny, 0.0, 25.0, 0.0, 1.0,
                           z_fn=lambda x, y: _z(x))
    x = mesh.cell_centroid[:, 0]
    h0 = h_branch(x)
    # sanity of the analytic branches
    assert h0[x < 5].min() > hc and h0[x > 15].max() < hc
    q0 = jnp.zeros((3, mesh.num_cells))
    q0 = q0.at[0].set(h0).at[1].set(q_in)

    op = build_operator(
        mesh, mannings_n=np.zeros(mesh.num_cells),
        bc_types={"left": BC_DIRICHLET, "right": BC_DIRICHLET},
    )
    bv = np.zeros((3, op.num_boundary_edges))
    for seg in op.segments:
        if seg.bc_type != BC_DIRICHLET:
            continue
        sl = slice(seg.start, seg.start + seg.count)
        xe = np.asarray(op.arrays.bnd_left)[sl]
        bv[0, sl] = h_branch(x[xe])
        bv[1, sl] = q_in
    bv = jnp.asarray(bv)

    adv = make_interval_advancer(op, "euler")
    dt = 0.004  # max speed ~ u + c ~ 5.3 downstream, dx = 0.125
    res = adv(op.arrays, q0, 0.0, dt, 5000, 1e9, bv, jnp.zeros_like(q0))
    h1 = np.asarray(res.q[0])
    hu1 = np.asarray(res.q[1])

    assert np.isfinite(h1).all()
    # the sonic point makes first order locally stiff; allow a slightly
    # looser envelope than the subcritical case but no runaway
    rel = np.abs(h1 - h0) / h0
    assert rel.max() < 0.06, f"max rel depth drift {rel.max():.4f}"
    assert np.abs(hu1 - q_in).max() / q_in < 0.06
