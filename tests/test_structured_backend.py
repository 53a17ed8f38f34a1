"""Config-reachable structured fast paths: the 'structured' (XLA slicing)
and 'fused_structured' (Pallas kernel) edge_flux_backends must reproduce
the general unstructured path on raster meshes, and reject configurations
whose physics they cannot represent."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from rdycore_tpu.config.schema import Config, ConfigError
from rdycore_tpu.mesh import structured_quad
from rdycore_tpu.simulation import Simulation


def _cfg(backend, stop=0.04, dt=2e-3, temporal="euler"):
    cfg = Config()
    cfg.time.stop = stop
    cfg.time.time_step = dt
    cfg.time.coupling_interval = stop / 2
    cfg.numerics.temporal = temporal
    cfg.numerics.edge_flux_backend = backend
    cfg.logging.level = "none"
    cfg.validate()
    return cfg


def _mesh():
    def z_fn(x, y):
        return 0.05 * np.sin(x) * np.cos(y)

    return structured_quad(24, 16, 0, 24, 0, 16, z_fn=z_fn)


def _dam_ic(mesh):
    q = np.zeros((3, mesh.num_cells))
    q[0] = np.where(mesh.cell_centroid[:, 0] < 12.0, 2.0, 1.0)
    return q


@pytest.mark.parametrize("backend,temporal", [
    ("structured", "euler"),
    ("structured", "rk4"),
    ("fused_structured", "euler"),
])
def test_structured_backend_matches_xla(backend, temporal):
    mesh = _mesh()
    q0 = _dam_ic(mesh)

    ref = Simulation(_cfg("xla", temporal=temporal), mesh=mesh)
    ref.set_solution(q0)
    ref.run()

    sim = Simulation(_cfg(backend, temporal=temporal), mesh=mesh)
    assert sim._structured is not None
    sim.set_solution(q0)
    sim.run()

    tol = 2e-6 if backend == "fused_structured" else 1e-10
    np.testing.assert_allclose(
        sim.get_solution(), ref.get_solution(), rtol=0, atol=tol
    )
    assert sim.prev_max_courant == pytest.approx(
        ref.prev_max_courant, rel=1e-5
    )


def test_structured_backend_rejects_unsupported():
    mesh = _mesh()
    cfg = _cfg("structured")
    cfg.numerics.second_order = True
    with pytest.raises(ConfigError, match="second_order"):
        Simulation(cfg, mesh=mesh)

    cfg = _cfg("fused_structured", temporal="rk4")
    with pytest.raises(ConfigError, match="euler"):
        Simulation(cfg, mesh=mesh)

    from rdycore_tpu.mesh import structured_tri

    with pytest.raises(ConfigError, match="raster"):
        Simulation(_cfg("structured"), mesh=structured_tri(8, 8, 0, 8, 0, 8))
