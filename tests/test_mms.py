"""MMS verification tests: the portable correctness oracle
(reference: driver/tests/swe_roe/mms_*.yaml + src/rdymms.c PASS/FAIL)."""

import numpy as np
import pytest

from rdycore_tpu.config.yaml_input import load_config
from rdycore_tpu.mms import MMSDriver

CONV = "/root/reference/driver/tests/swe_roe/mms_conv_study.yaml"
SINGLE = "/root/reference/driver/tests/swe_roe/mms_single_run.yaml"


def test_mms_single_run_error_norms():
    cfg = load_config(SINGLE)
    drv = MMSDriver(cfg)
    assert drv.run(log=lambda *_: None)
    res = drv.last_result
    # error norms at the coarse resolution are small and finite
    assert np.all(np.isfinite(res.L1))
    assert res.L1[0] < 0.01  # h
    assert res.Linf[0] < 0.005


@pytest.mark.slow
def test_mms_convergence_study_passes_reference_thresholds():
    """First-order convergence rates must beat the thresholds enforced in the
    reference's CI (mms_conv_study.yaml:50-63: h L1>=0.94, L2>=0.95,
    Linf>=0.94; hu/hv L1>=0.91, L2>=0.93, Linf>=0.77)."""
    cfg = load_config(CONV)
    drv = MMSDriver(cfg)
    assert drv.run(log=lambda *_: None)


def test_mms_expression_compilation():
    cfg = load_config(CONV)
    from rdycore_tpu.mms import MMSProblem

    p = MMSProblem(cfg)
    x = np.array([1.0, 2.0])
    y = np.array([0.5, 1.5])
    q = np.asarray(p.solution(x, y, 0.0))
    assert q.shape == (3, 2)
    # h > 0 everywhere for this manufactured solution
    assert (q[0] > 0).all()
    src = np.asarray(p.source_terms(x, y, 1.0))
    assert np.isfinite(src).all()


@pytest.mark.slow
def test_mms_second_order_convergence():
    """MUSCL second-order rates must beat the reference thresholds
    (mms_conv_study_second_order.yaml:57-69: h L1>=1.40, L2>=1.20,
    Linf>=0.80; hu/hv L1>=1.30, L2>=1.30, Linf>=0.85)."""
    cfg = load_config(
        "/root/reference/driver/tests/swe_roe/mms_conv_study_second_order.yaml"
    )
    assert cfg.numerics.second_order
    drv = MMSDriver(cfg)
    assert drv.run(log=lambda *_: None)


def test_limiters_preserve_monotone_data():
    """On linear data every limiter must reproduce the exact slope; minmod
    and van Leer must not overshoot at a jump."""
    import jax.numpy as jnp

    from rdycore_tpu.mesh import structured_quad
    from rdycore_tpu.operator import build_operator
    from rdycore_tpu.ops.swe.muscl import reconstruct_interior_states

    mesh = structured_quad(10, 6, 0, 10, 0, 6)
    for limiter in ("minmod", "van_leer", "none"):
        op = build_operator(
            mesh, second_order=True, limiter=limiter,
            mannings_n=np.zeros(mesh.num_cells),
        )
        # linear field: reconstruction must be exact at interior edges away
        # from the boundary (where the LS stencil is complete)
        cx = mesh.cell_centroid[:, 0]
        q = np.zeros((3, mesh.num_cells))
        q[0] = 2.0 + 0.5 * cx
        (hl, _, _), (hr, _, _) = reconstruct_interior_states(op, jnp.asarray(q))
        ev = mesh.edge_vertices[: op.num_internal_edges]
        xm = (mesh.points[ev[:, 0], 0] + mesh.points[ev[:, 1], 0]) / 2.0
        interior = (xm > 1.5) & (xm < 8.5)
        exact = 2.0 + 0.5 * xm
        assert np.allclose(np.asarray(hl)[interior], exact[interior], atol=1e-12)
        assert np.allclose(np.asarray(hr)[interior], exact[interior], atol=1e-12)


@pytest.mark.slow
@pytest.mark.parametrize(
    "case",
    ["sediment_mms_conv_study.yaml", "sediment_upwind_mms_conv_study.yaml"],
)
def test_sediment_mms_convergence(case):
    """Coupled flow+sediment MMS convergence (Roe and upwind-Roe tracer
    fluxes) must beat the reference thresholds
    (driver/tests/sediment/*_mms_conv_study.yaml)."""
    cfg = load_config(f"/root/reference/driver/tests/sediment/{case}")
    assert cfg.physics.sediment.num_classes == 2
    drv = MMSDriver(cfg)
    assert drv.run(log=lambda *_: None)
