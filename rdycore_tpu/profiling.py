"""Profiling / timing harness.

The reference instruments every operator apply with PETSc logging events
and GPU timers (`RDY_CeedOperatorApp`, operator.c:148-151) and offers a
`-preload` warm-up step so cold-start JIT cost doesn't pollute timings
(rdyadvance.c:240-257). The JAX equivalents:

- `preload(sim)`: run one throwaway step to trigger compilation (and reset
  the state), so subsequent advances measure steady-state throughput
- `StepTimer`: per-advance wall times with the first (compile) interval
  split out; cell-updates/s summary
- `trace(logdir)`: context manager around `jax.profiler` emitting a
  TensorBoard-compatible device trace
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional


def preload(sim) -> float:
    """Compile-warm the advance path without perturbing the simulation.
    Returns the warm-up wall time (~compile time)."""
    import jax.numpy as jnp

    # deep-copy q: the jitted advance donates its input buffer
    state = (jnp.array(sim.q, copy=True), sim.t, sim.step, sim.dt, sim.prev_max_courant)
    accum = (
        sim.bflux_accum.copy(),
        sim.accum_sol.copy(),
        sim.accum_prim.copy(),
        sim.accum_time,
    )
    monitors = sim._monitors
    sim._monitors = []
    t0 = time.time()
    sim.advance()
    elapsed = time.time() - t0
    (sim.q, sim.t, sim.step, sim.dt, sim.prev_max_courant) = state
    (sim.bflux_accum, sim.accum_sol, sim.accum_prim, sim.accum_time) = accum
    sim._monitors = monitors
    return elapsed


class StepTimer:
    """Attach as a monitor: records wall time of every coupling interval."""

    def __init__(self, sim):
        self.sim = sim
        self.times: List[float] = []
        self.steps: List[int] = []
        self._t0 = time.time()
        self._last_step = sim.step

    def __call__(self, sim):
        now = time.time()
        self.times.append(now - self._t0)
        self.steps.append(sim.step - self._last_step)
        self._t0 = now
        self._last_step = sim.step

    def summary(self) -> dict:
        if not self.times:
            return {}
        # first interval includes compilation
        steady_t = self.times[1:] or self.times
        steady_s = self.steps[1:] or self.steps
        total_steps = sum(steady_s)
        total_time = sum(steady_t)
        ups = (
            total_steps * self.sim.num_cells / total_time if total_time else 0.0
        )
        return {
            "compile_interval_s": self.times[0],
            "steady_intervals": len(steady_t),
            "steady_seconds": total_time,
            "steady_steps": total_steps,
            "cell_updates_per_s": ups,
        }


@contextlib.contextmanager
def trace(logdir: str = "/tmp/rdycore_tpu_trace"):
    """Device trace via jax.profiler (view with TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
