"""Houston 1-km realistic-case benchmark (VERDICT r4 #9): the reference's
Hurricane-Harvey test deck (real .exo mesh + binary IC + Dirichlet BC
dataset + homogeneous rainfall) with 1 sediment class, end-to-end through
the pallas unstructured backend. Usage: python houston_bench.py [cpu]"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("RDYTPU_GT", "16")

import jax

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np

from rdycore_tpu.config.yaml_input import load_config
from rdycore_tpu.forcing import Forcing, HomogeneousDataset, attach_forcing
from rdycore_tpu.simulation import Simulation

SWE = "/root/reference/driver/tests/swe_roe"
COND = "/root/reference/share/conditions"

d = tempfile.mkdtemp()
shutil.copy(f"{SWE}/Houston1km.DirichletBC.yaml", d)
cfg = load_config(os.path.join(d, "Houston1km.DirichletBC.yaml"))
cfg.numerics.edge_flux_backend = "pallas"
cfg.numerics.cell_ordering = "rcm"
if os.environ.get("HB_SED"):
    # sediment stretch: the Hairsine-Rose deposition term turns
    # anti-damping where tau_b > tau_critical_deposition (the Dirichlet
    # outflow wall drives tau_b ~ 1e4), so hc diverges by t ~ 780 s on
    # BOTH backends (faithful to tracer_sources_ceed.h — the reference's
    # own Houston tests run flow-only); the sediment benchmark stops at
    # the stable 600 s stretch
    cfg.physics.sediment.num_classes = 1
    cfg.time.stop = 600.0
cfg.output.format = "none"
cfg.logging.level = "none"
cfg.validate()

t0 = time.time()
sim = Simulation(cfg)
forcing = Forcing()
forcing.homogeneous_rain = HomogeneousDataset(
    f"{COND}/Houston1km.rain.int32.bin", temporally_interpolate=True
)
forcing.homogeneous_bc["bottom_wall"] = HomogeneousDataset(
    f"{COND}/Houston1km.bc.int32.bin"
)
attach_forcing(sim, forcing)
setup_s = time.time() - t0
print(f"setup {setup_s:.1f}s backend={sim.operator.edge_flux_backend} "
      f"ndof={sim.ndof} cells={sim.operator.num_cells} "
      f"step_meta={bool(sim.operator.pallas_step_meta)}", flush=True)
assert sim.operator.edge_flux_backend == "pallas"

# full simulated event: 2017-08-26 rainfall, 4200 s at dt = 30 s
t0 = time.time()
sim.run()
event_s = time.time() - t0
q = sim.get_solution()
assert np.isfinite(q).all()
steps = sim.step
print(f"EVENT: {steps} steps / {cfg.time.stop} s simulated in {event_s:.2f}s wall "
      f"(h max {q[0].max():.3f} m" + (f", sediment hc max {q[3].max():.3e})" if sim.ndof > 3 else ")"),
      flush=True)

# steady-state throughput: one long jitted interval on the same operator
from rdycore_tpu.timestepping import make_interval_advancer
import jax.numpy as jnp

op = sim.operator
adv = jax.jit(make_interval_advancer(op, "euler"), donate_argnums=(1,))
bv = jnp.asarray(sim.boundary_values, jnp.float32)
src = jnp.asarray(np.asarray(sim.ext_src), jnp.float32)
qj = jnp.asarray(q, jnp.float32)
r = adv(op.arrays, qj, 0.0, 1.0, 3, 1e9, bv, src)
np.asarray(r.q[0][:4])
t0 = time.time()
n = 20000
r = adv(op.arrays, r.q, 0.0, 1.0, n, 1e9, bv, src)
np.asarray(r.q[0][:4])
el = time.time() - t0
print(f"STEADY: {n} steps in {el:.3f}s = "
      f"{n * op.num_cells / el:.3e} cell-updates/s "
      f"(2746-cell mesh: dispatch/pipeline-bound, not kernel-bound)",
      flush=True)
